"""Fused Pallas kernels for the Hap Q hot path (round-4 headline work).

The XLA formulation of the hap_q texture plane (ycocg -> BC4 + BC1 encode;
BC1 + BC4 decode -> ycocg shader) is HBM-bound on fusion boundaries: every
XLA fusion pass re-reads the ~100 MB float32 (3, 16, N) plane intermediates
at 4K, so the measured stage costs (~3.7 ms encode, ~2.5 ms decode arith)
sit ~30x above the compute's own data footprint. These kernels run the
SAME math (the un-jitted *_core functions — one jaxpr, inlined) on
VMEM-resident tiles: HBM traffic collapses to the uint8 planes in and the
(4, N) words out.

No dynamic indexing, no DMA, no scalar prefetch — pure elementwise +
sublane reductions on statically-shaped (16, NT)/(4, NT) tiles, so the
Mosaic footguns documented in CLAUDE.md (lane-offset loads, uint8 rotates,
DMA row alignment) are structurally absent.

Reference scope: the texture codec work the reference delegates to GPU
shaders/DXT libraries (hap.h:89-90, HapVideoDRAFT.md:22-26).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hap_tpu.kernels.bc1 import bc1_decode_planes, bc1_encode_planes_words
from hap_tpu.kernels.bc4 import bc4_decode_planes, bc4_encode_planes_words
from hap_tpu.kernels.ycocg import (
    cocgs_y_to_rgb_planes,
    rgb_to_cocgs_y_planes,
)

_U32 = jnp.uint32

# Blocks per grid step. The encoder's live set measured ~19.5 MB scoped
# VMEM at 8192 blocks (compiler OOM above the 16 MB budget); 4096 fits
# with room for the pipeline's double buffers.
_NT = 4096


def _interpret() -> bool:
    if os.environ.get("HAP_TPU_FORCE_INTERPRET") == "1":
        return True
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _enc_kernel(refine_iters: int, planes_ref, words_ref):
    # Mosaic has no direct uint8 <-> float32 casts on this toolchain:
    # hop through int32 (free — both are register converts).
    planes = planes_ref[...].astype(jnp.int32)  # (3, 16, NT)
    cocgs_p, y_p = rgb_to_cocgs_y_planes(planes)
    y_w0, y_w1 = bc4_encode_planes_words(y_p, refine_iters=1)
    c_w0, c_w1 = bc1_encode_planes_words(cocgs_p, refine_iters=refine_iters)
    # word-planar rows: [bc4.w0, bc4.w1, bc1.w0, bc1.w1]
    words_ref[0, :] = y_w0
    words_ref[1, :] = y_w1
    words_ref[2, :] = c_w0
    words_ref[3, :] = c_w1


@partial(jax.jit, static_argnames=("refine_iters",))
def hapq_encode_fused(planes: jnp.ndarray,
                      refine_iters: int = 2) -> jnp.ndarray:
    """(3, 16, N) uint8 RGB block planes -> (4, N) uint32 word planes.

    Rows are [BC4 w0, BC4 w1, BC1 w0, BC1 w1] (the Hap Q / BC3 block word
    order). N is padded to the tile size internally; the pad blocks encode
    garbage and are sliced off.
    """
    n = planes.shape[2]
    npad = -(-n // _NT) * _NT
    if npad != n:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, npad - n)))
    out = pl.pallas_call(
        partial(_enc_kernel, refine_iters),
        out_shape=jax.ShapeDtypeStruct((4, npad), _U32),
        grid=(npad // _NT,),
        in_specs=[
            pl.BlockSpec((3, 16, _NT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, _NT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(planes)
    return out[:, :n]


def _dec_kernel(words_ref, rgb_ref):
    from hap_tpu.kernels.ycocg import cocgs_y_to_rgb_planes_f32

    w = words_ref[...]  # (4, NT) uint32
    y = bc4_decode_planes(w[0], w[1])  # (16, NT) f32
    cocgs, _ = bc1_decode_planes(w[2], w[3], dxt1_punchthrough=False)
    # f32 -> i32 -> u8: Mosaic has no direct f32 -> u8 cast.
    rgb = cocgs_y_to_rgb_planes_f32(cocgs, y)
    rgb_ref[...] = rgb.astype(jnp.int32).astype(jnp.uint8)


@jax.jit
def hapq_decode_fused(words: jnp.ndarray) -> jnp.ndarray:
    """(4, N) uint32 word planes -> (3, 16, N) uint8 RGB block planes.

    Bit-identical to bc4_decode_planes + bc1_decode_planes +
    cocgs_y_to_rgb_planes (same jaxpr, exact-f32 palette math)."""
    n = words.shape[1]
    npad = -(-n // _NT) * _NT
    if npad != n:
        words = jnp.pad(words, ((0, 0), (0, npad - n)))
    out = pl.pallas_call(
        _dec_kernel,
        out_shape=jax.ShapeDtypeStruct((3, 16, npad), jnp.uint8),
        grid=(npad // _NT,),
        in_specs=[
            pl.BlockSpec((4, _NT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 16, _NT), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(words)
    return out[:, :, :n]


def use_fused() -> bool:
    """Fused kernels are the TPU default; HAP_TPU_FUSED_BCN=0 falls back
    to the XLA planar chain (same math, fusion-boundary HBM traffic)."""
    v = os.environ.get("HAP_TPU_FUSED_BCN")
    if v is not None:
        return v == "1"
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
