import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

H, W = 2160, 3840
rng = np.random.default_rng(7)
img_np = np.clip(128 + 100*np.sin(np.mgrid[0:H,0:W][1]/97.0)[:,:,None] + rng.normal(0,8,(H,W,3)), 0, 255).astype(np.uint8)
img = jax.device_put(jnp.asarray(img_np))

def timeit(f, *a, n=10, name=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/n
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return out

from hap_tpu.kernels.layout import image_to_blocks, unpack_u32_to_u8
from hap_tpu.kernels.ycocg import rgb_to_cocgsy, cocgsy_to_rgb
from hap_tpu.kernels.bc3 import bc3_encode_blocks, bc3_decode_blocks
from hap_tpu.snappy.device import snappy_encode_chunks, snappy_decode_chunks
from hap_tpu.pipeline.device_frame import encode_frame_device, decode_frame_device

f_blocks = jax.jit(lambda im: image_to_blocks(im))
blocks = timeit(f_blocks, img, name="layout")
f_ycocg = jax.jit(lambda b: rgb_to_cocgsy(b))
cocg = timeit(f_ycocg, blocks, name="ycocg")
f_enc = jax.jit(lambda c: bc3_encode_blocks(c))
words = timeit(f_enc, cocg, name="bc3_encode (refine=2)")
f_enc1 = jax.jit(lambda c: bc3_encode_blocks(c, refine_iters=0))
timeit(f_enc1, cocg, name="bc3_encode (refine=0)")
f_dec = jax.jit(lambda w: bc3_decode_blocks(w))
timeit(f_dec, words, name="bc3_decode")

f_pay = jax.jit(lambda w: unpack_u32_to_u8(w.reshape(1,-1)).reshape(-1))
payload = timeit(f_pay, words, name="words->bytes")

for C in [64, 512, 2025]:
    S = payload.shape[0] // C
    if payload.shape[0] % C: continue
    chunks = payload.reshape(C, S)
    f_se = jax.jit(partial(snappy_encode_chunks, S=S, G=16))
    comp, clen = timeit(f_se, chunks, name=f"snappy_enc C={C} S={S}")
    f_sd = jax.jit(partial(snappy_decode_chunks, S=S, G=16))
    timeit(f_sd, comp, clen, name=f"snappy_dec C={C} S={S}")
    f_fe = jax.jit(partial(encode_frame_device, chunk_count=C, fmt_id=0xF, G=16))
    fr, fl = timeit(f_fe, payload, name=f"frame_enc C={C}")
    f_fd = jax.jit(partial(decode_frame_device, input_bytes=payload.shape[0], chunk_count=C, fmt_id=0xF, G=16))
    timeit(f_fd, fr, name=f"frame_dec C={C}")
