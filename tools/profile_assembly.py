"""Split encode_frame_device cost: snappy kernel vs container assembly scan;
A/B scan unroll factors (run on TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

H, W, B, CHUNKS = 2160, 3840, 16, 64


def timeit(f, *a, n=5, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(g(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000/B:.2f} ms/frame (cs {s:.3e})", flush=True)


timeit(lambda x: x + 1, jnp.float32(0), n=8, name="sync floor/16")

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

from hap_tpu.pipeline.device_pipeline import _encode_blocks
from hap_tpu.pipeline.device_frame import _assemble_frame, encode_frame_device
from hap_tpu.kernels.layout import words_to_payload
from hap_tpu.snappy.device import snappy_encode_chunks

M = lambda f: (lambda xs: jax.lax.map(f, xs))
payloads = jax.jit(M(lambda im: words_to_payload(_encode_blocks("hap_q", im))))(imgs)
S = payloads.shape[1] // CHUNKS

timeit(M(lambda p: snappy_encode_chunks(p.reshape(CHUNKS, S), S, 16)), payloads,
       name="map snappy_encode only")
comp, clen = jax.jit(M(lambda p: snappy_encode_chunks(p.reshape(CHUNKS, S), S, 16)))(payloads)
timeit(M(lambda args: _assemble_frame(args[0], args[1], args[2], CHUNKS, 0xF, 16)),
       (payloads, comp, clen), name="map assembly only")
timeit(M(lambda p: encode_frame_device(p, CHUNKS, 0xF, 16)), payloads,
       name="map encode_frame_device (both)")
