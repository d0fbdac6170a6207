"""Probe: does slabbing the 16K encode_blocks over lax.map beat one giant
fused graph? (16K encode_blocks measures 76 ms net vs 57 ms linear-scaled
from 4K — testing whether bounding the working set recovers the gap.)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 8640, 15360


def timeit(f, *a, n=4, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms  (checksum {s:.3e})", flush=True)
    return dt


rng = np.random.default_rng(5)
yy = np.linspace(0, 4 * np.pi, H, dtype=np.float32)[:, None]
xx = np.linspace(0, 6 * np.pi, W, dtype=np.float32)[None, :]
img = np.stack([
    128 + 100 * np.sin(xx) * np.cos(yy),
    128 + 100 * np.broadcast_to(np.cos(xx * 0.7), (H, W)),
    128 + 100 * np.broadcast_to(np.sin(yy * 1.3), (H, W)),
], axis=-1)
img[: H // 8] = 32.0
img = jax.device_put(
    jnp.asarray(np.clip(np.round(img), 0, 255).astype(np.uint8)))

from hap_tpu.pipeline.device_pipeline import _encode_blocks, _decode_blocks

print("device:", jax.devices()[0], flush=True)
floor = timeit(lambda x: x + 1, jnp.float32(0), n=8, name="sync floor")

timeit(lambda x: _encode_blocks("hap_q", x), img, name="direct 16K")

for nslab in (4, 8, 16):
    hs = H // nslab          # multiple of 4 (block rows) required

    def slabbed(x, hs=hs, nslab=nslab):
        slabs = x.reshape(nslab, hs, W, 3)
        return jax.lax.map(lambda s: _encode_blocks("hap_q", s), slabs)

    timeit(slabbed, img, name=f"lax.map {nslab} slabs of {hs} rows")

for nslab in (4, 8):
    hs = H // nslab

    def slabbed_dec(x, hs=hs, nslab=nslab):
        slabs = x.reshape(nslab, hs, W, 3)
        words = jax.lax.map(lambda s: _encode_blocks("hap_q", s), slabs)
        out = jax.lax.map(
            lambda v: _decode_blocks("hap_q", v, hs, W), words)
        return out

    timeit(slabbed_dec, img, name=f"enc+dec lax.map {nslab} slabs")

timeit(lambda x: _decode_blocks(
    "hap_q", _encode_blocks("hap_q", x), H, W), img, name="enc+dec direct")
