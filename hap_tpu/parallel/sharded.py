"""Sharded codec pipelines over a device Mesh.

Three entry points:

* ``sharded_gop_encode``   — pure data parallelism: a GOP batch of frames,
  one-or-more frames per chip, zero communication (legal because every Hap
  frame is independently decodable, HapVideoDRAFT.md:29-32).
* ``sharded_spatial_encode`` — one (large) frame, its block stream striped
  across all chips (the 16K-frame story, README.md:25).
* ``make_train_step``       — the full dp x sp pipeline step used by
  __graft_entry__.dryrun_multichip: encode + decode with explicit
  shard_map collectives (all_gather of encoded words over the space axis,
  psum of distortion stats over the whole mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks
from hap_tpu.kernels.ycocg import cocgsy_to_rgb, rgb_to_cocgsy


def _block_fns(codec: str) -> Tuple[Callable, Callable, int, int]:
    """(encode_blocks, decode_blocks, channels, words_per_block) for a codec."""
    if codec == "hap":
        return (
            lambda b: bc1_encode_blocks(b),
            lambda w: bc1_decode_blocks(w)[0],
            3,
            2,
        )
    if codec == "hap_alpha":
        return bc3_encode_blocks, bc3_decode_blocks, 4, 4
    if codec == "hap_q":
        return (
            lambda b: bc3_encode_blocks(rgb_to_cocgsy(b)),
            lambda w: cocgsy_to_rgb(bc3_decode_blocks(w)),
            3,
            4,
        )
    if codec == "hap_alpha_only":
        return (
            lambda b: bc4_encode_blocks(b[..., 0]),
            lambda w: bc4_decode_blocks(w)[..., None],
            1,
            2,
        )
    raise ValueError(f"unknown codec {codec!r}")


def sharded_gop_encode(mesh: Mesh, codec: str = "hap_q") -> Callable:
    """Jitted (B, N, 16, C) uint8 -> (B, N, wpb) uint32, batch axis sharded

    over every mesh axis (pure DP over frames)."""
    enc, _, _, _ = _block_fns(codec)
    all_axes = tuple(mesh.axis_names)
    in_sharding = NamedSharding(mesh, P(all_axes))
    out_sharding = NamedSharding(mesh, P(all_axes))

    @partial(jax.jit, in_shardings=in_sharding, out_shardings=out_sharding)
    def fn(blocks):
        b, n = blocks.shape[0], blocks.shape[1]
        flat = blocks.reshape((b * n,) + blocks.shape[2:])
        return enc(flat).reshape(b, n, -1)

    return fn


def sharded_spatial_encode(mesh: Mesh, codec: str = "hap_q") -> Callable:
    """Jitted (N, 16, C) uint8 -> (N, wpb) uint32 for one frame, block axis

    striped across all chips (stripes == runs of chunks, hap.c:285-298)."""
    enc, _, _, _ = _block_fns(codec)
    all_axes = tuple(mesh.axis_names)
    sharding = NamedSharding(mesh, P(all_axes))

    @partial(jax.jit, in_shardings=sharding, out_shardings=sharding)
    def fn(blocks):
        return enc(blocks)

    return fn


def sharded_frame_roundtrip(
    mesh: Mesh, codec: str = "hap_q", chunk_count: int = 64
) -> Callable:
    """Full-pipeline GOP data parallelism: jitted (B, H, W, C) uint8 ->
    ((B, H, W, C) decoded, (B,) frame_len, (B,) ok), the batch axis sharded
    over every mesh axis. Each chip runs the complete on-device pipeline
    (pixels -> BCn -> snappy -> container -> back) on its local frames —
    zero communication, legal because every Hap frame is independently
    decodable (HapVideoDRAFT.md:29-32). This is the serving configuration
    BASELINE.md's scaling metric measures.
    """
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

    all_axes = tuple(mesh.axis_names)
    spec = P(all_axes)

    def local(frames):
        # lax.map per frame, not the batched GOP formulation: measured 13.0
        # vs 27.0 ms/frame at 4K on v5e (tools/profile_roundtrip_ab.py) —
        # XLA pipelines the sequential per-frame program better than it
        # schedules the frame-batched one on this toolchain.
        return jax.lax.map(
            lambda f: roundtrip_pipeline(f, codec, chunk_count), frames
        )

    sharded = shard_map(
        local, mesh=mesh, in_specs=spec, out_specs=(spec,) * 3, check_vma=False
    )
    return jax.jit(sharded)


def make_train_step(mesh: Mesh, codec: str = "hap_q") -> Callable:
    """Full pipeline step over a ("data", "space") mesh with explicit

    collectives. Input blocks (B, N, 16, C) uint8; B % data == 0,
    N % space == 0.

    Returns jitted ``step(blocks) -> (words, sse)`` where words (B, N, wpb)
    is the encoded stream (all_gather'ed over "space" so every data-row chip
    holds its frames' full streams, ready for host stitching) and sse is the
    mesh-wide psum of squared reconstruction error (the quality metric the
    serving path monitors).
    """
    enc, dec, channels, wpb = _block_fns(codec)

    def local_step(local_blocks):
        # local_blocks: (b, n, 16, C) — this chip's frame rows x block stripe
        b, n = local_blocks.shape[0], local_blocks.shape[1]
        flat = local_blocks.reshape((b * n,) + local_blocks.shape[2:])
        words = enc(flat)  # (b*n, wpb)
        decoded = dec(words)
        err = decoded.astype(jnp.float32) - flat.astype(jnp.float32)
        sse = jax.lax.psum(jnp.sum(err * err), ("data", "space"))
        words = words.reshape(b, n, wpb)
        # Assemble each frame's full encoded stream across the space axis
        # (ICI all_gather; the host stitches chunks from this).
        gathered = jax.lax.all_gather(words, "space", axis=1, tiled=True)
        return gathered, sse

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=P("data", "space"),
        out_specs=(P("data", None), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
