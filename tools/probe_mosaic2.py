import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {msg}", flush=True)
        return None

x3 = jnp.asarray(np.arange(8 * 33 * 128, dtype=np.int32).reshape(8, 33, 128))
k = jnp.asarray(np.array([[5]], dtype=np.int32))

# a: dynamic middle-dim load
def k_load(k_ref, x_ref, o_ref):
    kk = k_ref[0, 0]
    a = x_ref[2, kk, :]
    b = x_ref[2, kk + 1, :]
    o_ref[:] = jnp.concatenate([a.reshape(1, 128), b.reshape(1, 128)], axis=1)
r = try_kernel("dyn middle load i32", k_load,
    jax.ShapeDtypeStruct((1, 256), jnp.int32), k, x3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    want = np.arange(8*33*128).reshape(8,33,128)[2, 5:7].reshape(-1)
    print("  correct:", (r[0] == want).all())

# b: dynamic middle-dim store
def k_store(k_ref, x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    kk = k_ref[0, 0]
    o_ref[1, kk, :] = x_ref[0, 0, :] + 1
r = try_kernel("dyn middle store i32", k_store,
    jax.ShapeDtypeStruct((8, 33, 128), jnp.int32), k, x3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    print("  correct:", (r[1, 5] == np.arange(128) + 1).all(), (r[0] == 0).all())

# c: read-modify-write at dynamic middle index
def k_rmw(k_ref, x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    kk = k_ref[0, 0]
    cur = o_ref[1, kk, :]
    o_ref[1, kk, :] = cur + x_ref[0, kk, :]
try_kernel("dyn middle rmw i32", k_rmw,
    jax.ShapeDtypeStruct((8, 33, 128), jnp.int32), k, x3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# d: fori_loop with dynamic middle-dim access driven by loop-dependent scalar
def k_loop(k_ref, x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    def body(i, cur):
        blk = cur // 128
        a = x_ref[0, blk, :]
        o_ref[0, i, :] = a
        return cur + 161  # data-independent but dynamic stride
    jax.lax.fori_loop(0, 16, body, 0)
try_kernel("loop dyn middle i32", k_loop,
    jax.ShapeDtypeStruct((8, 33, 128), jnp.int32), k, x3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
