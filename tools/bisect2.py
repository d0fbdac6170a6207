import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices(), flush=True)
_I32 = jnp.int32
TC = 8
C = 8
n_full = 8

rng = np.random.default_rng(0)
fblk = 512
frame = jnp.asarray(rng.integers(0, 256, (fblk, 128), dtype=np.int32))
offs = jnp.asarray((64 + np.arange(C) * 300).astype(np.int32).reshape(C, 1))
lens = jnp.asarray(np.full((C, 1), 100, np.int32))
comps = jnp.asarray(np.tile(np.array([1, 0], np.int32), C // 2).reshape(C, 1))

def run(name, kernel, n_smem_in, out3d, scratch_rows, smem_out):
    in_specs = [pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)] * n_smem_in
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    ins = [offs, lens, comps][:n_smem_in] + [frame]
    if out3d:
        ospec = pl.BlockSpec((TC, n_full, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((C, n_full, 128), _I32)
    else:
        ospec = pl.BlockSpec((TC, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((C, 128), _I32)
    out_specs, out_shape = (ospec, oshape)
    if smem_out:
        out_specs = (ospec, pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM))
        out_shape = (oshape, jax.ShapeDtypeStruct((C, 1), _I32))
    try:
        r = pl.pallas_call(
            kernel, grid=(C // TC,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((scratch_rows, 128), _I32), pltpu.SemaphoreType.DMA],
        )(*ins)
        s = sum(float(jnp.sum(x.astype(jnp.float32))) for x in jax.tree.leaves(r))
        print(f"{name}: OK ({s:.0f})", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:110]}", flush=True)
        return False

def mk(n_smem, out3d, rows, smem_out):
    def kernel(*refs):
        off_ref = refs[0]
        frame_ref = refs[n_smem]
        if smem_out:
            out_ref, ok_ref = refs[n_smem + 1], refs[n_smem + 2]
            scratch, sem = refs[n_smem + 3], refs[n_smem + 4]
        else:
            out_ref = refs[n_smem + 1]
            scratch, sem = refs[n_smem + 2], refs[n_smem + 3]
        base = pl.multiple_of((off_ref[0, 0] // 1024) * 8, 8)
        dma = pltpu.make_async_copy(frame_ref.at[pl.ds(base, rows), :], scratch, sem)
        dma.start(); dma.wait()
        def chunk(c, _):
            blk = (off_ref[c, 0] - base * 128) // 128
            if out3d:
                def unit(u, _):
                    out_ref[c, u, :] = scratch[blk, :]
                    return 0
                jax.lax.fori_loop(0, n_full, unit, 0)
            else:
                out_ref[c, :] = scratch[blk, :]
            if smem_out:
                ok_ref[c, 0] = 1
            return 0
        jax.lax.fori_loop(0, TC, chunk, 0)
    return kernel

# step through: probe-D baseline -> full V1
run("A: 1smem 2dout 24rows", mk(1, False, 24, False), 1, False, 24, False)
run("B: 3smem 2dout 24rows", mk(3, False, 24, False), 3, False, 24, False)
run("C: 3smem 3dout 24rows", mk(3, True, 24, False), 3, True, 24, False)
run("D: 3smem 3dout 24rows +smemout", mk(3, True, 24, True), 3, True, 24, True)
run("E: 3smem 3dout 77rows +smemout", mk(3, True, 77, True), 3, True, 77, True)
run("F: 3smem 3dout 80rows +smemout", mk(3, True, 80, True), 3, True, 80, True)
print("DONE", flush=True)
