import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp

def sync_time(f, *a, n=5, name=""):
    g = jax.jit(lambda *args: jnp.sum(f(*args).astype(jnp.float32)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        s2 = float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt

rng = np.random.default_rng(0)
C, B, S = 2048, 4236, 4096

# 0. sync floor
x0 = jnp.ones((8, 128), jnp.float32)
sync_time(lambda x: x * 2.0, x0, name="sync floor (tiny op)")

comp = jnp.asarray(rng.integers(0, 256, (C, B), dtype=np.uint8))
cursors = jnp.asarray(rng.integers(0, B - 70, (C,), dtype=np.int32))

# 1. one row-gather (2048 rows x 66 window at per-row offsets)
def row_gather(comp, cursors):
    idx = cursors[:, None] + jnp.arange(66, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(comp, jnp.minimum(idx, B - 1), axis=1)
sync_time(row_gather, comp, cursors, name="row_gather 2048x66 (x1)")

# 2. scan of 64 elementwise steps on (C, S) state
def scan_elem(state):
    def step(s, _):
        return s + 1, None
    out, _ = jax.lax.scan(step, state, jnp.arange(64))
    return out
sync_time(scan_elem, jnp.zeros((C, S), jnp.uint8), name="scan64 elementwise (C,S)")

# 3. scan of 64 row-gather steps with data-dependent cursor advance
def scan_gather(comp, cur0):
    def step(cur, _):
        idx = cur[:, None] + jnp.arange(66, dtype=jnp.int32)[None, :]
        win = jnp.take_along_axis(comp, jnp.minimum(idx, B - 1), axis=1)
        cur = cur + 3 + (win[:, 0] & 1).astype(jnp.int32)
        return cur, win[:, 0]
    cur, outs = jax.lax.scan(step, cur0, jnp.arange(64))
    return outs
sync_time(scan_gather, comp, jnp.zeros((C,), jnp.int32), name="scan64 row-gather")

# 4. flat 1D gather: 8.4M random byte indices
flat = comp.reshape(-1)
fidx = jnp.asarray(rng.integers(0, C * B, (C * S,), dtype=np.int32))
sync_time(lambda f, i: f[i], flat, fidx, name="flat gather 8.4M bytes")

# 5. flat 1D gather of uint32 (2.1M)
flat32 = jnp.asarray(rng.integers(0, 2**31, (C * B // 4,), dtype=np.uint32))
fidx32 = jnp.asarray(rng.integers(0, C * B // 4, (C * S // 4,), dtype=np.int32))
sync_time(lambda f, i: f[i], flat32, fidx32, name="flat gather 2.1M u32")

# 6. one scatter step (C,66)->(C,B) at per-row offsets
vals = jnp.asarray(rng.integers(0, 256, (C, 66), dtype=np.uint8))
def scat(comp, cursors, vals):
    idx = cursors[:, None] + jnp.arange(66, dtype=jnp.int32)[None, :]
    rows = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, 66))
    return comp.at[rows, idx].set(vals, mode="drop")
sync_time(scat, comp, cursors, vals, name="row_scatter 2048x66 (x1)")

# 7. dynamic_update_slice scan: 64 steps writing (C,64) at static col offset
def scan_dus(state, blocks):
    def step(s, u):
        return jax.lax.dynamic_update_slice(s, blocks, (0, u * 64)), None
    out, _ = jax.lax.scan(step, state, jnp.arange(64, dtype=jnp.int32))
    return out
sync_time(scan_dus, jnp.zeros((C, S), jnp.uint8),
          jnp.asarray(rng.integers(0, 256, (C, 64), np.uint8)),
          name="scan64 dynamic_update_slice")

# 8. bc1 decode core ops: take_along_axis (N,4,3) by (N,16)
N = 518400
pal = jnp.asarray(rng.integers(0, 256, (N, 4, 3), dtype=np.int32))
codes = jnp.asarray(rng.integers(0, 4, (N, 16), dtype=np.int32))
sync_time(lambda p, c: jnp.take_along_axis(p, c[:, :, None], axis=1),
          pal, codes, name="palette gather (N,4,3)x(N,16)")
def pal_where(p, c):
    out = p[:, 0][:, None, :]
    for k in range(1, 4):
        out = jnp.where((c == k)[:, :, None], p[:, k][:, None, :], out)
    return out
sync_time(pal_where, pal, codes, name="palette where-chain")

# 9. argmin over (N,16,4) distances
d = jnp.asarray(rng.random((N, 16, 4), dtype=np.float32))
sync_time(lambda d: jnp.argmin(d, axis=-1), d, name="argmin (N,16,4)")

# 10. einsum batched 3x3 power iteration step
cov = jnp.asarray(rng.random((N, 3, 3), dtype=np.float32))
v = jnp.asarray(rng.random((N, 3), dtype=np.float32))
sync_time(lambda c, v: jnp.einsum("ncd,nd->nc", c, v), cov, v,
          name="einsum (N,3,3)@(N,3)")
