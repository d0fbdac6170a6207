"""Probe Mosaic support for the wide-unit byte-plane kernel building blocks.

All accesses in-bounds on tiny arrays; compile rejections are safe. Verifies
results numerically against numpy so miscompiles are visible, not silent.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, out_shape, *args, **kw):
    try:
        r = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)
        r = jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
        return np.asarray(r)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


ROWS = 64
xnp = np.arange(ROWS * 128, dtype=np.int32).reshape(ROWS, 128)
x = jnp.asarray(xnp)
VS = pl.BlockSpec(memory_space=pltpu.VMEM)
SS = pl.BlockSpec(memory_space=pltpu.SMEM)
s3 = jnp.asarray(np.array([[3]], dtype=np.int32))
s8 = jnp.asarray(np.array([[8]], dtype=np.int32))

# 1. dynamic sublane rotate on (24,128)
def k1(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[0:24, :], s_ref[0, 0], 0)

r = try_kernel("roll axis0 dyn (24,128)", k1,
               jax.ShapeDtypeStruct((24, 128), jnp.int32), s3, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    print("   numeric:", (r == np.roll(xnp[:24], 3, axis=0)).all(),
          "or inverse:", (r == np.roll(xnp[:24], -3, axis=0)).all(), flush=True)

# 2. load 8 rows at unaligned dynamic row start
def k2(s_ref, x_ref, o_ref):
    o_ref[:] = x_ref[pl.ds(s_ref[0, 0], 8), :]

r = try_kernel("load pl.ds(dyn,8) unaligned", k2,
               jax.ShapeDtypeStruct((8, 128), jnp.int32), s3, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    print("   numeric:", (r == xnp[3:11]).all(), flush=True)

# 3. store 8 rows at unaligned dynamic row start
def k3(s_ref, x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[pl.ds(s_ref[0, 0], 8), :] = x_ref[0:8, :]

r = try_kernel("store pl.ds(dyn,8) unaligned", k3,
               jax.ShapeDtypeStruct((16, 128), jnp.int32), s3, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    exp = np.zeros((16, 128), np.int32); exp[3:11] = xnp[:8]
    print("   numeric:", (r == exp).all(), flush=True)

# 4. load 24 rows at 8-aligned dynamic row start
def k4(s_ref, x_ref, o_ref):
    base = pl.multiple_of(s_ref[0, 0], 8)
    o_ref[:] = x_ref[pl.ds(base, 24), :]

r = try_kernel("load pl.ds(dyn8,24) aligned", k4,
               jax.ShapeDtypeStruct((24, 128), jnp.int32), s8, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    print("   numeric:", (r == xnp[8:32]).all(), flush=True)

# 5. store 16 rows at 8-aligned dynamic row start (read-modify-write shape)
def k5(s_ref, x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    base = pl.multiple_of(s_ref[0, 0], 8)
    cur = o_ref[pl.ds(base, 16), :]
    o_ref[pl.ds(base, 16), :] = cur + x_ref[0:16, :]

r = try_kernel("rmw pl.ds(dyn8,16) aligned", k5,
               jax.ShapeDtypeStruct((32, 128), jnp.int32), s8, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    exp = np.zeros((32, 128), np.int32); exp[8:24] = xnp[:16]
    print("   numeric:", (r == exp).all(), flush=True)

# 6. dynamic lane roll on (16,128) (multi-row, same shift all rows)
def k6(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[0:16, :], s_ref[0, 0], 1)

r = try_kernel("roll axis1 dyn (16,128)", k6,
               jax.ShapeDtypeStruct((16, 128), jnp.int32), s3, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    print("   numeric:", (r == np.roll(xnp[:16], 3, axis=1)).all(),
          "inv:", (r == np.roll(xnp[:16], -3, axis=1)).all(), flush=True)

# 7. dynamic-length?? no — static sizes only. Instead: dynamic row single-row
#    load into (1,128) from big scratch (already used, sanity check).
def k7(s_ref, x_ref, o_ref):
    o_ref[:] = x_ref[pl.ds(s_ref[0, 0], 1), :]

r = try_kernel("load pl.ds(dyn,1) row", k7,
               jax.ShapeDtypeStruct((1, 128), jnp.int32), s3, x,
               in_specs=[SS, VS], out_specs=VS)
if r is not None:
    print("   numeric:", (r == xnp[3:4]).all(), flush=True)
print("done", flush=True)
