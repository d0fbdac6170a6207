"""Interleaved A/B/C of 4K Hap Q GOP roundtrip formulations (run on TPU).

The axon host-sync floor drifts (24-42 ms observed between runs), so the
variants are timed in interleaved rounds and reported as per-round pairs
plus the min — only same-round comparisons are trustworthy.

A: lax.map of the per-frame pipeline (bench.py formulation)
B: fully GOP-batched (roundtrip_pipeline_gop)
C: hybrid — pixel plane per-frame under lax.map, byte plane batched
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

H, W, B, CHUNKS = 2160, 3840, 16, 64

rng = np.random.default_rng(7)
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
img_np = np.stack([
    128 + 100 * np.sin(xx / 97.0) * np.cos(yy / 61.0),
    128 + 100 * np.cos(xx / 53.0) * np.sin(yy / 83.0),
    128 + 100 * np.sin((xx + yy) / 71.0)], axis=-1)
img_np[: H // 4] = 64.0
img_np[H // 2: H // 2 + H // 8] += rng.normal(0, 12, (H // 8, W, 3))
img_np = np.clip(np.round(img_np), 0, 255).astype(np.uint8)
imgs = jax.device_put(jnp.asarray(np.stack([img_np] * B)))

from hap_tpu.pipeline.device_pipeline import (
    roundtrip_pipeline, roundtrip_pipeline_gop, _encode_blocks, _decode_blocks,
    plan_chunks,
)
from hap_tpu.pipeline.device_frame import (
    encode_frames_device, decode_frames_device,
)
from hap_tpu.kernels.layout import unpack_u32_to_u8
from hap_tpu.constants import TextureFormat, CONSTANT_TO_FORMAT_ID, bytes_per_block

fmt = TextureFormat.YCoCg_DXT5
g = bytes_per_block(fmt)
cc = plan_chunks(H, W, fmt, CHUNKS)


@jax.jit
def variant_a(frames):
    out, flen, ok = jax.lax.map(
        lambda f: roundtrip_pipeline(f, "hap_q", CHUNKS), frames)
    return jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen) + jnp.sum(ok)


@jax.jit
def variant_b(frames):
    out, flen, ok = roundtrip_pipeline_gop(frames, "hap_q", CHUNKS)
    return jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen) + jnp.sum(ok)


@jax.jit
def variant_c(frames):
    def payload_of(img):
        words = _encode_blocks("hap_q", img)
        return unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)

    payloads = jax.lax.map(payload_of, frames)
    bufs, flen = encode_frames_device(payloads, cc, CONSTANT_TO_FORMAT_ID[fmt], g)
    words_flat, ok = decode_frames_device(
        bufs, payloads.shape[1], cc, CONSTANT_TO_FORMAT_ID[fmt], g, out_words=True)
    out = jax.lax.map(
        lambda wf: _decode_blocks("hap_q", wf.reshape(-1, 4), H, W), words_flat)
    return jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen) + jnp.sum(ok)


variants = [("A lax.map", variant_a), ("B gop", variant_b), ("C hybrid", variant_c)]
for name, f in variants:
    t0 = time.time()
    cs = float(f(imgs))
    print(f"{name}: compile+run {time.time()-t0:.1f}s cs={cs:.4e}", flush=True)

results = {n: [] for n, _ in variants}
for rnd in range(5):
    line = []
    for name, f in variants:
        t0 = time.time()
        float(f(imgs))
        dt = (time.time() - t0) * 1000 / B
        results[name].append(dt)
        line.append(f"{name}={dt:.2f}")
    print(f"round {rnd}: " + "  ".join(line) + " ms/frame", flush=True)

for name, _ in variants:
    print(f"{name}: min {min(results[name]):.2f} ms/frame  "
          f"median {sorted(results[name])[2]:.2f}", flush=True)
