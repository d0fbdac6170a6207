import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

def timeit(f, *a, n=5, name=""):
    # Force real execution each iteration: fold output into a scalar and
    # fetch it to host (tiny transfer), so no lazy/elided execution.
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.uint8 else x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))  # warmup/compile
    t0 = time.time()
    acc = 0.0
    for _ in range(n):
        acc += float(g(*a))  # host sync every iteration
    dt = (time.time()-t0)/n
    print(f"{name}: {dt*1000:.2f} ms  (checksum {s:.3e})", flush=True)
    return dt

rng = np.random.default_rng(0)
N = 518400

from hap_tpu.kernels.bc1 import bc1_encode_blocks, bc1_decode_blocks
from hap_tpu.kernels.bc3 import bc3_encode_blocks, bc3_decode_blocks
from hap_tpu.kernels.bc4 import bc4_encode_blocks, bc4_decode_blocks

px3 = jnp.asarray(rng.integers(0, 256, (N, 16, 3), dtype=np.uint8))
px4 = jnp.asarray(rng.integers(0, 256, (N, 16, 4), dtype=np.uint8))
w2 = jnp.asarray(rng.integers(0, 2**32, (N, 2), dtype=np.uint32))
w4 = jnp.asarray(rng.integers(0, 2**32, (N, 4), dtype=np.uint32))
ch = jnp.asarray(rng.integers(0, 256, (N, 16), dtype=np.uint8))

timeit(partial(bc1_encode_blocks, refine_iters=0), px3, name="bc1_encode r0")
timeit(partial(bc1_encode_blocks, refine_iters=2), px3, name="bc1_encode r2")
timeit(bc4_encode_blocks, ch, name="bc4_encode")
timeit(partial(bc3_encode_blocks, refine_iters=2), px4, name="bc3_encode r2")
timeit(bc1_decode_blocks, w2, name="bc1_decode")
timeit(bc4_decode_blocks, w2, name="bc4_decode")
timeit(bc3_decode_blocks, w4, name="bc3_decode")

from hap_tpu.snappy.device import snappy_encode_chunks, snappy_decode_chunks
S, G = 4096, 16
for C in [2048, 2025]:
    data = rng.integers(0, 256, (C, S), dtype=np.uint8)
    data[:C//2] = np.tile(rng.integers(0,256,G,dtype=np.uint8), S//G)
    dj = jnp.asarray(data)
    timeit(partial(snappy_encode_chunks, S=S, G=G), dj, name=f"snappy_enc C={C}")
    comp, clen = jax.jit(partial(snappy_encode_chunks, S=S, G=G))(dj)
    comp = jax.block_until_ready(comp)
    timeit(partial(snappy_decode_chunks, S=S, G=G), comp, clen, name=f"snappy_dec C={C}")
