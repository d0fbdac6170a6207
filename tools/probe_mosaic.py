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
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None

x = jnp.asarray(np.arange(256, dtype=np.int32).reshape(1, 256))
s = jnp.asarray(np.array([[5]], dtype=np.int32))

# 1. dynamic jnp.roll along lanes
def k_roll(s_ref, x_ref, o_ref):
    sh = s_ref[0, 0]
    o_ref[:] = pltpu.roll(x_ref[:], sh, 1)

r = try_kernel("pltpu.roll dynamic", k_roll,
    jax.ShapeDtypeStruct((1, 256), jnp.int32),
    s, x,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    expect = np.roll(np.arange(256), 5)
    print("  matches np.roll(+5):", (r[0] == expect).all(),
          " np.roll(-5):", (r[0] == np.roll(np.arange(256), -5)).all())

# 2. jnp.roll dynamic
def k_roll2(s_ref, x_ref, o_ref):
    sh = s_ref[0, 0]
    o_ref[:] = jnp.roll(x_ref[:], sh, axis=1)

r = try_kernel("jnp.roll dynamic", k_roll2,
    jax.ShapeDtypeStruct((1, 256), jnp.int32),
    s, x,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# 3. uint8 rolls
xu = jnp.asarray(np.arange(256, dtype=np.uint8).reshape(1, 256))
def k_roll_u8(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], s_ref[0, 0], 1)
try_kernel("pltpu.roll dynamic u8", k_roll_u8,
    jax.ShapeDtypeStruct((1, 256), jnp.uint8),
    s, xu,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# 4. aligned dynamic VMEM slice (multiple of 128)
big = jnp.asarray(np.arange(8 * 1024, dtype=np.uint8).reshape(8, 1024))
def k_aligned(s_ref, x_ref, o_ref):
    a = s_ref[0, 0] * 128  # aligned
    a = pl.multiple_of(a, 128)
    o_ref[:] = x_ref[0, pl.ds(a, 256)].reshape(1, 256)
try_kernel("aligned dyn slice u8", k_aligned,
    jax.ShapeDtypeStruct((1, 256), jnp.uint8),
    jnp.asarray(np.array([[2]], dtype=np.int32)), big,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# 5. scalar read from SMEM array + store scalar-dependent value
def k_smem(s_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:] + s_ref[0, 1]
try_kernel("smem scalar read", k_smem,
    jax.ShapeDtypeStruct((1, 256), jnp.int32),
    jnp.asarray(np.array([[7, 9]], dtype=np.int32)), x,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# 6. dynamic sublane (dim-0) slice
def k_sublane(s_ref, x_ref, o_ref):
    r = s_ref[0, 0]
    o_ref[:] = x_ref[pl.ds(r, 1), :]
try_kernel("dyn sublane slice u8", k_sublane,
    jax.ShapeDtypeStruct((1, 1024), jnp.uint8),
    jnp.asarray(np.array([[3]], dtype=np.int32)), big,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# 7. extract scalar from vector at static lane 0 after roll
def k_tag(s_ref, x_ref, o_ref):
    w = pltpu.roll(x_ref[:], -s_ref[0, 0], 1)
    o_ref[0, 0] = w[0, 0].astype(jnp.int32)
try_kernel("rolled scalar extract", k_tag,
    jax.ShapeDtypeStruct((1, 1), jnp.int32),
    s, x,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
