"""Truthful per-stage timing of the 4K Hap Q roundtrip (run on TPU).

Each stage is timed with a checksum fold fetched to host every iteration
(CLAUDE.md rule 3): no lazy-dispatch fiction. The ~28-30 ms host-sync floor
is measured first and printed so stage times can be read net of it.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

H, W = 2160, 3840
CHUNKS = 64

def timeit(f, *a, n=6, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms (checksum {s:.3e})", flush=True)
    return dt

# host-sync floor
floor = timeit(lambda x: x + 1, jnp.float32(0), n=10, name="sync floor (x+1)")

rng = np.random.default_rng(7)
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
img_np = np.stack([
    128 + 100 * np.sin(xx / 97.0) * np.cos(yy / 61.0),
    128 + 100 * np.cos(xx / 53.0) * np.sin(yy / 83.0),
    128 + 100 * np.sin((xx + yy) / 71.0)], axis=-1)
img_np[: H // 4] = 64.0
img_np[H // 2: H // 2 + H // 8] += rng.normal(0, 12, (H // 8, W, 3))
img_np = np.clip(np.round(img_np), 0, 255).astype(np.uint8)
img = jax.device_put(jnp.asarray(img_np))

from hap_tpu.kernels.layout import image_to_blocks, blocks_to_image, unpack_u32_to_u8
from hap_tpu.kernels.ycocg import rgb_to_cocgsy, cocgsy_to_rgb
from hap_tpu.kernels.bc3 import bc3_encode_blocks, bc3_decode_blocks
from hap_tpu.snappy.device import snappy_encode_chunks
from hap_tpu.pipeline.device_frame import encode_frame_device, decode_frame_device

blocks = jax.jit(image_to_blocks)(img)
timeit(image_to_blocks, img, name="image_to_blocks")
cocg = jax.jit(rgb_to_cocgsy)(blocks)
timeit(rgb_to_cocgsy, blocks, name="rgb_to_cocgsy")
words = jax.jit(bc3_encode_blocks)(cocg)
timeit(bc3_encode_blocks, cocg, name="bc3_encode")
payload = jax.jit(lambda w: unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1))(words)
timeit(lambda w: unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1), words,
       name="words->bytes")

S = payload.shape[0] // CHUNKS
timeit(partial(snappy_encode_chunks, S=S, G=16),
       payload.reshape(CHUNKS, S), name=f"snappy_encode C={CHUNKS}")
f_fe = partial(encode_frame_device, chunk_count=CHUNKS, fmt_id=0xF, G=16)
frame, flen = jax.jit(f_fe)(payload)
timeit(f_fe, payload, name="encode_frame_device (snappy+container)")

f_fd = partial(decode_frame_device, input_bytes=payload.shape[0],
               chunk_count=CHUNKS, fmt_id=0xF, G=16, out_words=True)
wdec, ok = jax.jit(f_fd)(frame)
print("decode ok:", bool(np.asarray(ok)), flush=True)
timeit(f_fd, frame, name="decode_frame_device (out_words)")

wq = wdec.reshape(-1, 4)
dblocks = jax.jit(bc3_decode_blocks)(wq)
timeit(bc3_decode_blocks, wq, name="bc3_decode")
timeit(cocgsy_to_rgb, dblocks, name="cocgsy_to_rgb")
timeit(partial(blocks_to_image, height=H, width=W), dblocks, name="blocks_to_image")

from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline
timeit(partial(roundtrip_pipeline, codec="hap_q", chunk_count=CHUNKS), img,
       name="full roundtrip_pipeline")
print(f"(subtract ~{floor*1000:.1f} ms sync floor from each)", flush=True)
