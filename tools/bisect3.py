import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices(), flush=True)
_I32 = jnp.int32
TC, C, n_full = 8, 8, 8

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 256, (512, 128), dtype=np.int32))
offs = jnp.asarray((64 + np.arange(C) * 300).astype(np.int32).reshape(C, 1))

def build(rows, dyn_base, split):
    def kernel(off_ref, frame_ref, out_ref, scratch, sem):
        if dyn_base:
            base = pl.multiple_of((off_ref[0, 0] // 1024) * 8, 8)
        else:
            base = 0
        if split:
            k = rows // split
            for i in range(split):
                dma = pltpu.make_async_copy(
                    frame_ref.at[pl.ds(base + i * k, k), :],
                    scratch.at[pl.ds(i * k, k), :], sem)
                dma.start(); dma.wait()
        else:
            dma = pltpu.make_async_copy(
                frame_ref.at[pl.ds(base, rows), :], scratch, sem)
            dma.start(); dma.wait()
        def chunk(c, _):
            blk = (off_ref[c, 0] - base * 128) // 128
            def unit(u, _):
                out_ref[c, u, :] = scratch[blk, :]
                return 0
            jax.lax.fori_loop(0, n_full, unit, 0)
            return 0
        jax.lax.fori_loop(0, TC, chunk, 0)
    return kernel

def run(name, rows, dyn_base=True, split=0):
    try:
        r = pl.pallas_call(
            build(rows, dyn_base, split), grid=(1,),
            in_specs=[pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TC, n_full, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, n_full, 128), _I32),
            scratch_shapes=[pltpu.VMEM((rows, 128), _I32), pltpu.SemaphoreType.DMA],
        )(offs, frame)
        print(f"{name}: OK ({float(jnp.sum(r.astype(jnp.float32))):.0f})", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:100]}", flush=True)
        return False

for rows in (24, 32, 40, 48, 64, 80):
    if not run(f"rows={rows}", rows):
        break
print("DONE", flush=True)
