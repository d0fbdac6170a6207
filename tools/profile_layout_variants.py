"""Time image<->block layout variants at 4K on TPU (host-synced)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import numpy as np
import jax
import jax.numpy as jnp

H, W = 2160, 3840
BH, BW = H // 4, W // 4


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


rng = np.random.default_rng(0)
img = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8)))
img4 = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W, 4), dtype=np.uint8)))

timeit(lambda x: x.astype(jnp.int32) + 1, img, name="baseline elementwise u8->i32")

# v0: current row-slice + stack
def v0(img):
    h, w, c = img.shape
    x = img.reshape(BH, 4, w, c)
    rows = [x[:, r].reshape(BH, BW, 4, c) for r in range(4)]
    return jnp.stack(rows, axis=2).reshape(BH * BW, 16, c)

timeit(v0, img, name="v0 row-slice+stack (current)")

# v1: 5D transpose
def v1(img):
    h, w, c = img.shape
    return img.reshape(BH, 4, BW, 4, c).transpose(0, 2, 1, 3, 4).reshape(BH * BW, 16, c)

timeit(v1, img, name="v1 5D transpose u8")

# v2: pad to 4 channels, bitcast u32, row-slice+stack on u32, bitcast back
def v2(img):
    h, w, c = img.shape
    x = jnp.pad(img, ((0, 0), (0, 0), (0, 1)))
    wds = jax.lax.bitcast_convert_type(x.reshape(h, w, 1, 4), jnp.uint32)[..., 0, 0]
    y = wds.reshape(BH, 4, W)
    rows = [y[:, r].reshape(BH, BW, 4) for r in range(4)]
    blk = jnp.stack(rows, axis=2).reshape(BH * BW, 16)
    by = jax.lax.bitcast_convert_type(blk, jnp.uint8)
    return by[..., :3]

timeit(v2, img, name="v2 u32 bitcast row-slice+stack")

# v3: u32 bitcast + 4D transpose
def v3(img):
    h, w, c = img.shape
    x = jnp.pad(img, ((0, 0), (0, 0), (0, 1)))
    wds = jax.lax.bitcast_convert_type(x.reshape(h, w, 1, 4), jnp.uint32)[..., 0, 0]
    blk = wds.reshape(BH, 4, BW, 4).transpose(0, 2, 1, 3).reshape(BH * BW, 16)
    by = jax.lax.bitcast_convert_type(blk, jnp.uint8)
    return by[..., :3]

timeit(v3, img, name="v3 u32 bitcast 4D transpose")

# v4: 16 strided slices (texel-planar), stack on last axis
def v4(img):
    planes = [img[r::4, s::4] for r in range(4) for s in range(4)]
    return jnp.stack(planes, axis=2).reshape(BH * BW, 16, 3)

timeit(v4, img, name="v4 strided slices")

# v2 on 4-channel input (hap_alpha case)
def v2_c4(img):
    h, w, c = img.shape
    wds = jax.lax.bitcast_convert_type(img.reshape(h, w, 1, 4), jnp.uint32)[..., 0, 0]
    y = wds.reshape(BH, 4, W)
    rows = [y[:, r].reshape(BH, BW, 4) for r in range(4)]
    blk = jnp.stack(rows, axis=2).reshape(BH * BW, 16)
    return jax.lax.bitcast_convert_type(blk, jnp.uint8)

timeit(v2_c4, img4, name="v2 c=4")

# ---- inverse direction ----
blocks = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (BH * BW, 16, 3), dtype=np.uint8)))

def i0(blocks):
    x = blocks.reshape(BH, BW, 4, 4, 3)
    rows = [x[:, :, r].reshape(BH, W, 3) for r in range(4)]
    return jnp.stack(rows, axis=1).reshape(H, W, 3)

timeit(i0, blocks, name="i0 inverse row-slice+stack (current)")

def i2(blocks):
    x = jnp.pad(blocks, ((0, 0), (0, 0), (0, 1)))
    wds = jax.lax.bitcast_convert_type(x.reshape(-1, 16, 1, 4), jnp.uint32)[..., 0, 0]
    y = wds.reshape(BH, BW, 4, 4)
    rows = [y[:, :, r].reshape(BH, W) for r in range(4)]
    img_w = jnp.stack(rows, axis=1).reshape(H, W)
    by = jax.lax.bitcast_convert_type(img_w, jnp.uint8)
    return by[..., :3]

timeit(i2, blocks, name="i2 inverse u32 bitcast")

def i3(blocks):
    x = jnp.pad(blocks, ((0, 0), (0, 0), (0, 1)))
    wds = jax.lax.bitcast_convert_type(x.reshape(-1, 16, 1, 4), jnp.uint32)[..., 0, 0]
    img_w = wds.reshape(BH, BW, 4, 4).transpose(0, 2, 1, 3).reshape(H, W)
    by = jax.lax.bitcast_convert_type(img_w, jnp.uint8)
    return by[..., :3]

timeit(i3, blocks, name="i3 inverse u32 4D transpose")
