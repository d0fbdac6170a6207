import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices(), flush=True)

def run(name, fn):
    try:
        r = fn()
        r = jax.block_until_ready(r)
        print(f"{name}: OK {np.asarray(r).ravel()[:4]}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:130]}", flush=True)

big = jnp.asarray(np.arange(256 * 128, dtype=np.int32).reshape(256, 128))
off = jnp.asarray(np.array([[3]], dtype=np.int32))

# A: DMA HBM->VMEM with dynamic row offset
def probe_dma():
    def kernel(off_ref, src_ref, out_ref, scratch, sem):
        b = off_ref[0, 0]
        dma = pltpu.make_async_copy(src_ref.at[pl.ds(b, 16), :], scratch, sem)
        dma.start(); dma.wait()
        out_ref[:] = scratch[0, :].reshape(1, 128)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32), pltpu.SemaphoreType.DMA],
    )(off, big)
run("dma dyn row", probe_dma)  # expect row 3 -> 384...

# B: 2D scratch dynamic row read
def probe_2d():
    def kernel(off_ref, x_ref, out_ref):
        b = off_ref[0, 0]
        out_ref[:] = x_ref[b, :].reshape(1, 128)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(off, big[:64])
run("2d dyn row read", probe_2d)

# C: DMA + loop + rolls (mini version of decode structure)
def probe_mini():
    def kernel(off_ref, src_ref, out_ref, scratch, sem):
        b = off_ref[0, 0]
        dma = pltpu.make_async_copy(src_ref.at[pl.ds(b, 16), :], scratch, sem)
        dma.start(); dma.wait()
        def body(u, cur):
            blk = cur // 128
            r = cur - blk * 128
            win = jnp.concatenate([
                scratch[blk, :].reshape(1, 128),
                scratch[blk + 1, :].reshape(1, 128),
                scratch[blk + 2, :].reshape(1, 128),
                jnp.zeros((1, 128), jnp.int32)], axis=1)
            w = pltpu.roll(win, jnp.where(r == 0, 0, 512 - r), 1)
            out_ref[0, u, :] = w[0, :128]
            return cur + 37
        jax.lax.fori_loop(0, 8, body, 5)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32), pltpu.SemaphoreType.DMA],
    )(off, big)
run("mini decode struct", probe_mini)

# D: grid + SMEM tile blocks + DMA (closest to real kernel)
def probe_grid():
    offs = jnp.asarray((np.arange(16, dtype=np.int32) * 300).reshape(16, 1))
    def kernel(off_ref, src_ref, out_ref, scratch, sem):
        base = off_ref[0, 0] // 128
        dma = pltpu.make_async_copy(src_ref.at[pl.ds(base, 24), :], scratch, sem)
        dma.start(); dma.wait()
        def chunk(c, _):
            start = off_ref[c, 0] - base * 128
            blk = start // 128
            out_ref[c, :] = scratch[blk, :]
            return 0
        jax.lax.fori_loop(0, 8, chunk, 0)
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((8, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((24, 128), jnp.int32), pltpu.SemaphoreType.DMA],
    )(offs, big)
run("grid+smem+dma", probe_grid)
print("DONE", flush=True)
