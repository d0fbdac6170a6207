"""Interleaved A/B of lax.map batch_size and chunk_count for the 4K Hap Q
roundtrip (run on TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, B = 2160, 3840, 16

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

from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline


def make_variant(chunks, batch_size):
    @jax.jit
    def f(frames):
        kw = {"batch_size": batch_size} if batch_size else {}
        out, flen, ok = jax.lax.map(
            lambda fr: roundtrip_pipeline(fr, "hap_q", chunks), frames, **kw)
        return jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen) + jnp.sum(ok)
    return f


# NOTE: lax.map batch_size >= 2 is unsupported: vmap of the frame-direct
# decode kernel's ANY-memory-space frame operand has no Pallas lowering.
variants = [
    ("c64", make_variant(64, None)),
    ("c128", make_variant(128, None)),
    ("c32", make_variant(32, None)),
]
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
        results[name].append((time.time() - t0) * 1000 / B)
        line.append(f"{name}={results[name][-1]:.2f}")
    print(f"round {rnd}: " + "  ".join(line), flush=True)
for name, _ in variants:
    print(f"{name}: min {min(results[name]):.2f} ms/frame", flush=True)
