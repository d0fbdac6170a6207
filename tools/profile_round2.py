import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

def sync_time(f, *a, n=5, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
        jax.tree.leaves(f(*args)), jnp.float32(0)))
    float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt

rng = np.random.default_rng(0)
N = 518400

from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks, _principal_axis, quantize565, _palette, _select_indices
from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
from hap_tpu.snappy.device import snappy_encode_chunks, snappy_decode_chunks

w2 = jnp.asarray(rng.integers(0, 2**32, (N, 2), dtype=np.uint32))
w4 = jnp.asarray(rng.integers(0, 2**32, (N, 4), dtype=np.uint32))
px3 = jnp.asarray(rng.integers(0, 256, (N, 16, 3), dtype=np.uint8))

sync_time(bc1_decode_blocks, w2, name="bc1_decode (where-chain)")
sync_time(bc3_decode_blocks, w4, name="bc3_decode (where-chain)")
sync_time(partial(bc1_encode_blocks, refine_iters=0), px3, name="bc1_encode r0")
sync_time(partial(bc1_encode_blocks, refine_iters=2), px3, name="bc1_encode r2")

# encode piece probes
pxf = px3.astype(jnp.float32)
sync_time(lambda p: _principal_axis(p), pxf, name="  principal_axis")
sync_time(lambda p: quantize565(p[:, 0, :]), pxf, name="  quantize565")
c0 = jnp.asarray(rng.integers(0, 2**16, (N,), dtype=np.uint16))
c1 = jnp.asarray(rng.integers(0, 2**16, (N,), dtype=np.uint16))
sync_time(lambda a, b: _palette(a, b, a.astype(jnp.int32) > b.astype(jnp.int32))[0], c0, c1, name="  _palette")
pal = jnp.asarray(rng.integers(0, 256, (N, 4, 3), dtype=np.int32))
sync_time(_select_indices, pxf, pal, name="  _select_indices")

# snappy with K-window decode
S, G = 4096, 16
C = 2025
data = rng.integers(0, 256, (C, S), dtype=np.uint8)
data[: C // 2] = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
dj = jnp.asarray(data)
sync_time(partial(snappy_encode_chunks, S=S, G=G), dj, name="snappy_enc (scatter)")
comp, clen = jax.jit(partial(snappy_encode_chunks, S=S, G=G))(dj)
comp = jax.block_until_ready(comp)
for K in (8, 16, 32):
    sync_time(partial(snappy_decode_chunks, S=S, G=G),
              comp, clen, name=f"snappy_dec K={K}")

# q-block row gather probe for encode compaction alternative
table = jnp.asarray(rng.integers(0, 256, (16384, 512), dtype=np.uint8))
idx = jnp.asarray(rng.integers(0, 16384, (16384,), dtype=np.int32))
sync_time(lambda t, i: jnp.take(t, i, axis=0), table, idx, name="row gather 16K x 512B")
table2 = jnp.asarray(rng.integers(0, 256, (65536, 128), dtype=np.uint8))
idx2 = jnp.asarray(rng.integers(0, 65536, (65536,), dtype=np.int32))
sync_time(lambda t, i: jnp.take(t, i, axis=0), table2, idx2, name="row gather 64K x 128B")
