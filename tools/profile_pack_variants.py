"""Micro-bench byte<->word packing and block-layout variants on TPU.

The prefix profile (tools/profile_prefix.py) shows ~31 ms/frame of the 4K
roundtrip goes to uint8 relayouts: pack_u8_to_u32 after frame decode
(15.3 ms), image<->block transposes (~12.5 ms), unpack after BC encode
(3.4 ms). Each variant here is timed host-synced on a GOP-sized batch so
the ~30 ms tunnel sync floor amortizes; an identity op calibrates the floor.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time, numpy as np, jax, jax.numpy as jnp

H, W = 2160, 3840
N = (H // 4) * (W // 4)          # 518400 blocks
NB = N * 16                       # payload bytes 8,294,400
C, Lc = 64, NB // 64              # decode-kernel chunk shape
REP = 4
ITERS = 6


def timeit(f, *a, name=""):
    g = jax.jit(lambda *args: sum(
        jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.uint8 else x.astype(jnp.float32)).astype(jnp.float32)
        for x in jax.tree.leaves(f(*args))))
    cs = float(g(*a))
    t0 = time.time()
    for _ in range(ITERS):
        cs = float(g(*a))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.2f} ms  (cs {cs:.3e})", flush=True)
    return dt


def rep(f):
    """Apply f to REP stacked instances inside one dispatch."""
    return lambda xs: jax.lax.map(f, xs)


rng = np.random.default_rng(0)

print(f"== calibration (REP={REP} per dispatch; subtract identity) ==")
small = jnp.asarray(rng.integers(0, 2**31, (REP, 8, 128), dtype=np.int32))
timeit(rep(lambda x: x + 1), small, name="identity/sync floor")

# ---- pack u8 -> u32 after frame decode --------------------------------
print("== pack bytes->words (8.3 MB payload) ==")
pay_u8 = jnp.asarray(rng.integers(0, 256, (REP, NB), dtype=np.uint8))
ki32 = jnp.asarray(rng.integers(0, 256, (REP, C, Lc), dtype=np.int32))  # kernel-shaped

def pack_bitcast(p):  # current path
    return jax.lax.bitcast_convert_type(p.reshape(-1, 16).reshape(-1, 4, 4), jnp.uint32)

def pack_shift_u8(p):
    b = p.reshape(-1, 4).astype(jnp.uint32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)

def pack_i32_minor(x):  # from kernel int32 byte-lanes, no u8 cast
    y = x.reshape(C, Lc // 4, 4).astype(jnp.uint32)
    return (y[..., 0] | (y[..., 1] << 8) | (y[..., 2] << 16) | (y[..., 3] << 24)).reshape(-1)

def pack_i32_strided(x):
    y = x.reshape(C, Lc).astype(jnp.uint32)
    return (y[:, 0::4] | (y[:, 1::4] << 8) | (y[:, 2::4] << 16) | (y[:, 3::4] << 24)).reshape(-1)

def pack_i32_unzip(x):
    # (C, Lc) -> (C, Lc/4, 4) via reshape on the 2nd-minor axis instead:
    y = x.reshape(C, 4, Lc // 4).astype(jnp.uint32)  # wrong byte order; layout probe only
    return (y[:, 0] | (y[:, 1] << 8) | (y[:, 2] << 16) | (y[:, 3] << 24)).reshape(-1)

timeit(rep(pack_bitcast), pay_u8, name="pack: u8 bitcast (current)")
timeit(rep(pack_shift_u8), pay_u8, name="pack: u8 shift/or")
timeit(rep(pack_i32_minor), ki32, name="pack: i32 minor reshape + shift/or")
timeit(rep(pack_i32_strided), ki32, name="pack: i32 strided slices + shift/or")
timeit(rep(pack_i32_unzip), ki32, name="pack: i32 major reshape (order probe)")

# ---- unpack u32 -> u8 after BC encode ----------------------------------
print("== unpack words->bytes (2.07 M words) ==")
words = jnp.asarray(rng.integers(0, 2**31, (REP, N, 4), dtype=np.uint32))

def unpack_bitcast(w):  # current
    return jax.lax.bitcast_convert_type(w.reshape(1, -1), jnp.uint8).reshape(-1)

def unpack_i32(w):
    v = w.reshape(-1).astype(jnp.uint32)
    b = jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF], axis=-1)
    return b.reshape(-1).astype(jnp.uint8)

def unpack_keep32(w):
    # leave payload as int32 byte-lanes (what the snappy kernel wants anyway)
    v = w.reshape(-1).astype(jnp.uint32)
    return jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF], axis=-1).astype(jnp.int32)

timeit(rep(unpack_bitcast), words, name="unpack: bitcast (current)")
timeit(rep(unpack_i32), words, name="unpack: shift/mask -> u8")
timeit(rep(unpack_keep32), words, name="unpack: shift/mask keep i32 lanes")

# ---- image <-> blocks layout -------------------------------------------
print("== layout transforms (4K RGB) ==")
img = jnp.asarray(rng.integers(0, 256, (REP, H, W, 3), dtype=np.uint8))
blocks = jnp.asarray(rng.integers(0, 256, (REP, N, 16, 3), dtype=np.uint8))
bh, bw = H // 4, W // 4

def lay_u8(im):  # current image_to_blocks
    return im.reshape(bh, 4, bw, 4, 3).transpose(0, 2, 1, 3, 4).reshape(N, 16, 3)

def lay_i32(im):
    x = im.astype(jnp.int32)
    return x.reshape(bh, 4, bw, 4, 3).transpose(0, 2, 1, 3, 4).reshape(N, 16, 3)

def lay_f32(im):
    x = im.astype(jnp.float32)
    return x.reshape(bh, 4, bw, 4, 3).transpose(0, 2, 1, 3, 4).reshape(N, 16, 3)

def lay_rows(im):
    # gather 4 row-planes with static slices then interleave on a new axis:
    # (H, W, C) -> (bh, 4, W, C) via reshape; rows r = x[:, r] are (bh, W, C);
    # then (bh, W, C) -> (bh, bw, 4, C) reshape is minor-dim only; stack rows.
    x = im.reshape(bh, 4, W, 3)
    rows = [x[:, r].reshape(bh, bw, 4, 3) for r in range(4)]
    return jnp.stack(rows, axis=2).reshape(N, 16, 3)  # (bh,bw,4,4,3)

def lay_rows_i32(im):
    x = im.astype(jnp.int32).reshape(bh, 4, W, 3)
    rows = [x[:, r].reshape(bh, bw, 4, 3) for r in range(4)]
    return jnp.stack(rows, axis=2).reshape(N, 16, 3)

timeit(rep(lay_u8), img, name="image->blocks: u8 transpose (current)")
timeit(rep(lay_i32), img, name="image->blocks: i32 transpose")
timeit(rep(lay_f32), img, name="image->blocks: f32 transpose")
timeit(rep(lay_rows), img, name="image->blocks: u8 row-slices+stack")
timeit(rep(lay_rows_i32), img, name="image->blocks: i32 row-slices+stack")

def unlay_u8(bl):  # current blocks_to_image
    return bl.reshape(bh, bw, 4, 4, 3).transpose(0, 2, 1, 3, 4).reshape(H, W, 3)

def unlay_rows(bl):
    x = bl.reshape(bh, bw, 4, 4, 3)
    rows = [x[:, :, r].reshape(bh, W, 3) for r in range(4)]
    return jnp.stack(rows, axis=1).reshape(H, W, 3)

timeit(rep(unlay_u8), blocks, name="blocks->image: u8 transpose (current)")
timeit(rep(unlay_rows), blocks, name="blocks->image: u8 row-slices+stack")
