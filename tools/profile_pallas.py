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
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)

rng = np.random.default_rng(0)
from hap_tpu.snappy.device import snappy_encode_chunks, snappy_decode_chunks
from hap_tpu.kernels.bc1 import bc1_encode_blocks

S, G, C = 4096, 16, 2025
data = rng.integers(0, 256, (C, S), dtype=np.uint8)
data[: C // 2] = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
dj = jnp.asarray(data)

# correctness on real hardware: pallas == xla impls
enc_p = jax.jit(partial(snappy_encode_chunks, S=S, G=G, impl="pallas"))
enc_x = jax.jit(partial(snappy_encode_chunks, S=S, G=G, impl="xla"))
cp, lp = enc_p(dj); cx, lx = enc_x(dj)
cp, lp, cx, lx = map(np.asarray, (cp, lp, cx, lx))
assert (lp == lx).all(), "length mismatch"
for c in range(C):
    assert (cp[c, :lp[c]] == cx[c, :lx[c]]).all(), f"stream mismatch chunk {c}"
print("pallas encode == xla encode (all streams)", flush=True)

dec_p = jax.jit(partial(snappy_decode_chunks, S=S, G=G, impl="pallas"))
out, ok = dec_p(jnp.asarray(cp), jnp.asarray(lp))
out, ok = np.asarray(out), np.asarray(ok)
assert ok.all(), f"not ok: {np.where(~ok)[0][:10]}"
assert (out == data).all(), "decode mismatch"
print("pallas decode roundtrip OK", flush=True)

sync_time(enc_p, dj, name="snappy_enc pallas")
sync_time(dec_p, jnp.asarray(cp), jnp.asarray(lp), name="snappy_dec pallas")
px3 = jnp.asarray(rng.integers(0, 256, (518400, 16, 3), dtype=np.uint8))
sync_time(partial(bc1_encode_blocks, refine_iters=2), px3, name="bc1_encode r2 (elementwise PCA)")
