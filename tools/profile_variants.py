import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

def timeit(f, *a, n=10, name=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out

rng = np.random.default_rng(0)
N = 518400  # 4K BC3 block count

# ---- bc1 decode variants ----
words = jnp.asarray(rng.integers(0, 2**32, (N, 2), dtype=np.uint32))

from hap_tpu.kernels.bc1 import bc1_decode_blocks, _palette
timeit(jax.jit(lambda w: bc1_decode_blocks(w)), words, name="bc1_decode current (gather)")

@jax.jit
def bc1_dec_onehot(words):
    w0 = words[:, 0].astype(jnp.uint32)
    idx_word = words[:, 1].astype(jnp.uint32)
    c0 = (w0 & 0xFFFF).astype(jnp.uint16)
    c1 = (w0 >> 16).astype(jnp.uint16)
    four = c0.astype(jnp.int32) > c1.astype(jnp.int32)
    palette, opaque = _palette(c0, c1, four)  # (N,4,3)
    shifts = (2*jnp.arange(16, dtype=jnp.uint32))[None,:]
    codes = ((idx_word[:,None] >> shifts) & 0x3).astype(jnp.int32)  # (N,16)
    # select via where chain over 4 entries (no gather)
    rgb = palette[:, 0][:, None, :]
    for k in (1,2,3):
        rgb = jnp.where((codes == k)[:,:,None], palette[:, k][:, None, :], rgb)
    return rgb.astype(jnp.uint8)
timeit(bc1_dec_onehot, words, name="bc1_decode where-chain")

# ---- bc4 decode variants ----
from hap_tpu.kernels.bc4 import bc4_decode_blocks, _palette8, bc4_codes
timeit(jax.jit(lambda w: bc4_decode_blocks(w)), words, name="bc4_decode current")

@jax.jit
def bc4_dec_wherechain(words):
    w0 = words[:, 0].astype(jnp.uint32)
    a0 = (w0 & 0xFF).astype(jnp.int32); a1 = ((w0 >> 8) & 0xFF).astype(jnp.int32)
    palette = _palette8(a0, a1)
    codes = bc4_codes(words)
    out = palette[:, 0][:, None]
    for k in range(1, 8):
        out = jnp.where(codes == k, palette[:, k][:, None], out)
    return out.astype(jnp.uint8)
timeit(bc4_dec_wherechain, words, name="bc4_decode where-chain")

# ---- bc1 encode variants: covariance/power-iter elementwise ----
px_np = rng.integers(0, 256, (N, 16, 3), dtype=np.uint8)
px = jnp.asarray(px_np)
from hap_tpu.kernels.bc1 import bc1_encode_blocks
timeit(jax.jit(lambda p: bc1_encode_blocks(p, refine_iters=0)), px, name="bc1_encode r0 current")

@jax.jit
def principal_axis_elem(pxf):
    mean = jnp.mean(pxf, axis=1, keepdims=True)
    d = pxf - mean  # (N,16,3)
    xx = jnp.sum(d[...,0]*d[...,0],1); xy = jnp.sum(d[...,0]*d[...,1],1)
    xz = jnp.sum(d[...,0]*d[...,2],1); yy = jnp.sum(d[...,1]*d[...,1],1)
    yz = jnp.sum(d[...,1]*d[...,2],1); zz = jnp.sum(d[...,2]*d[...,2],1)
    vx = xx + jnp.abs(xy) + jnp.abs(xz) + 1e-4
    vy = jnp.abs(xy) + yy + jnp.abs(yz) + 1e-4
    vz = jnp.abs(xz) + jnp.abs(yz) + zz + 1e-4
    for _ in range(8):
        nx = xx*vx + xy*vy + xz*vz
        ny = xy*vx + yy*vy + yz*vz
        nz = xz*vx + yz*vy + zz*vz
        norm = jax.lax.rsqrt(nx*nx + ny*ny + nz*nz + 1e-24)
        vx, vy, vz = nx*norm, ny*norm, nz*norm
    return vx, vy, vz
timeit(jax.jit(lambda p: jnp.stack(principal_axis_elem(p.astype(jnp.float32)), -1)), px, name="principal_axis elementwise")

from hap_tpu.kernels.bc1 import _principal_axis
timeit(jax.jit(lambda p: _principal_axis(p.astype(jnp.float32))), px, name="principal_axis einsum (current)")

# index selection variant: distance via expansion, argmin as where-chain
@jax.jit
def select_idx_current(pxf, palette):
    d = pxf[:, :, None, :] - palette[:, None, :, :].astype(jnp.float32)
    return jnp.argmin(jnp.sum(d*d, -1), -1)
pal = jnp.asarray(rng.integers(0,256,(N,4,3)).astype(np.int32))
timeit(select_idx_current, px.astype(jnp.float32), pal, name="select_indices current")

# ---- snappy decode variants ----
from hap_tpu.snappy.device import snappy_encode_chunks, snappy_decode_chunks
S, G = 4096, 16
C = 2048
data = rng.integers(0, 256, (C, S), dtype=np.uint8)
data[:C//2] = np.tile(rng.integers(0,256,G,dtype=np.uint8), S//G)
dataj = jnp.asarray(data)
f_se = jax.jit(partial(snappy_encode_chunks, S=S, G=G))
comp, clen = timeit(f_se, dataj, name=f"snappy_enc real C={C}(pow2) S={S}")
f_sd = jax.jit(partial(snappy_decode_chunks, S=S, G=G))
timeit(f_sd, comp, clen, name=f"snappy_dec real C={C}(pow2) S={S}")
EOF = None
