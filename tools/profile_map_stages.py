"""Per-stage timing of the per-frame (lax.map) 4K Hap Q pipeline (run on TPU).

Each stage is wrapped in lax.map over a 16-frame GOP per dispatch — the
bench.py dispatch pattern — so the ~25-40 ms host-sync floor amortizes to
~2 ms/frame and stage numbers are comparable to the headline ms/frame.
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
    dt = min(ts)
    print(f"{name}: {dt*1000/B:.2f} ms/frame (min of {n}; cs {s:.3e})", flush=True)
    return dt


floor = timeit(lambda x: x + 1, jnp.float32(0), n=8, name="sync floor/16")

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

from hap_tpu.kernels.layout import image_to_blocks, blocks_to_image, unpack_u32_to_u8
from hap_tpu.kernels.ycocg import rgb_to_cocgs_y, cocgs_y_to_rgb
from hap_tpu.kernels.bc1 import bc1_encode_blocks, bc1_decode_blocks
from hap_tpu.kernels.bc4 import bc4_encode_blocks, bc4_decode_blocks
from hap_tpu.pipeline.device_frame import encode_frame_device, decode_frame_device
from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

M = lambda f: (lambda xs: jax.lax.map(f, xs))

timeit(M(image_to_blocks), imgs, name="map image_to_blocks")
blocks = jax.jit(M(image_to_blocks))(imgs)
timeit(M(rgb_to_cocgs_y), blocks, name="map ycocg split")
cy = jax.jit(M(rgb_to_cocgs_y))(blocks)
timeit(M(lambda t: bc4_encode_blocks(t[1])), cy, name="map bc4_encode")
timeit(M(lambda t: bc1_encode_blocks(t[0])), cy, name="map bc1_encode")
words = jax.jit(M(lambda t: jnp.concatenate(
    [bc4_encode_blocks(t[1]), bc1_encode_blocks(t[0])], axis=1)))(cy)
timeit(M(lambda w: unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1)), words,
       name="map words->bytes")
payloads = jax.jit(M(lambda w: unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1)))(words)
f_enc = partial(encode_frame_device, chunk_count=CHUNKS, fmt_id=0xF, G=16)
timeit(M(f_enc), payloads, name="map encode_frame_device")
frames = jax.jit(M(lambda p: f_enc(p)[0]))(payloads)
f_dec = partial(decode_frame_device, input_bytes=int(payloads.shape[1]),
                chunk_count=CHUNKS, fmt_id=0xF, G=16, out_words=True)
timeit(M(f_dec), frames, name="map decode_frame_device")
wdec = jax.jit(M(lambda f: f_dec(f)[0]))(frames)
timeit(M(lambda w: bc4_decode_blocks(w.reshape(-1, 4)[:, 0:2])), wdec,
       name="map bc4_decode")
timeit(M(lambda w: bc1_decode_blocks(w.reshape(-1, 4)[:, 2:4], False)[0]), wdec,
       name="map bc1_decode")
timeit(M(lambda w: cocgs_y_to_rgb(
    bc1_decode_blocks(w.reshape(-1, 4)[:, 2:4], False)[0],
    bc4_decode_blocks(w.reshape(-1, 4)[:, 0:2]))), wdec,
       name="map bcn decode+shader")
bdec = jax.jit(M(lambda w: cocgs_y_to_rgb(
    bc1_decode_blocks(w.reshape(-1, 4)[:, 2:4], False)[0],
    bc4_decode_blocks(w.reshape(-1, 4)[:, 0:2]))))(wdec)
timeit(M(partial(blocks_to_image, height=H, width=W)), bdec,
       name="map blocks_to_image")
timeit(M(lambda f: roundtrip_pipeline(f, "hap_q", CHUNKS)), imgs,
       name="map FULL roundtrip")
print(f"(floor/frame ~{floor*1000/B:.2f} ms — subtract from each)", flush=True)
