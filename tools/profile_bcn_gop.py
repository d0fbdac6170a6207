"""Isolate the GOP-batched BCn pixel-plane slowdown (run on TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

H, W, B = 2160, 3840, 16


def timeit(f, *a, n=4, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms total, {dt*1000/B:.2f} ms/frame (cs {s:.3e})",
          flush=True)
    return dt


floor = timeit(lambda x: x + 1, jnp.float32(0), n=10, name="sync floor")

rng = np.random.default_rng(7)
imgs_np = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
imgs = jax.device_put(jnp.asarray(imgs_np))

from hap_tpu.kernels.layout import image_to_blocks, blocks_to_image
from hap_tpu.kernels.ycocg import rgb_to_cocgs_y, cocgs_y_to_rgb
from hap_tpu.kernels.bc1 import bc1_encode_blocks, bc1_decode_blocks
from hap_tpu.kernels.bc4 import bc4_encode_blocks, bc4_decode_blocks

to_blocks = jax.vmap(image_to_blocks)

timeit(to_blocks, imgs, name="vmap image_to_blocks")
blocks = jax.jit(to_blocks)(imgs)
flat = jax.jit(lambda b: b.reshape((-1,) + b.shape[2:]))(blocks)

timeit(lambda b: rgb_to_cocgs_y(b.reshape((-1,) + b.shape[2:])), blocks,
       name="ycocg (flat B*N)")
cocgs, y = jax.jit(lambda b: rgb_to_cocgs_y(b))(flat)

timeit(bc4_encode_blocks, y, name="bc4_encode (B*N)")
timeit(bc1_encode_blocks, cocgs, name="bc1_encode (B*N)")

# Same stages under lax.map (per frame)
def per_frame_enc(img):
    blocks = image_to_blocks(img)
    c, yy = rgb_to_cocgs_y(blocks)
    return jnp.concatenate([bc4_encode_blocks(yy), bc1_encode_blocks(c)], axis=1)

timeit(lambda x: jax.lax.map(per_frame_enc, x), imgs, name="lax.map full bcn enc")

words = jax.jit(lambda x: jax.lax.map(per_frame_enc, x))(imgs)
wflat = jax.jit(lambda w: w.reshape((-1, 4)))(words)

# Decode side
def dec_flat(wf):
    cocgs, _ = bc1_decode_blocks(wf[:, 2:4], dxt1_punchthrough=False)
    yy = bc4_decode_blocks(wf[:, 0:2])
    return cocgs_y_to_rgb(cocgs, yy)

timeit(dec_flat, wflat, name="bcn decode flat (B*N)")
blocks_dec = jax.jit(dec_flat)(wflat)

timeit(lambda bd: jax.vmap(partial(blocks_to_image, height=H, width=W))(
    bd.reshape((B, -1) + bd.shape[1:])), blocks_dec, name="vmap blocks_to_image")

def per_frame_dec(wf):
    img_blocks = dec_flat(wf)
    return blocks_to_image(img_blocks, H, W)

timeit(lambda w: jax.lax.map(per_frame_dec, w.reshape(B, -1, 4)), wflat,
       name="lax.map full bcn dec")
print(f"(floor ~{floor*1000:.1f} ms)", flush=True)
