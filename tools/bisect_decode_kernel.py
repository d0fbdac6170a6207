import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices(), flush=True)
_I32 = jnp.int32
TC = 8

# Same shapes as the failing case: C=8, S=1024, G=8, U=128
S, G, U = 1024, 8, 128
n_full = S // U
bound = 2 + n_full * 130
tcb = (TC * bound) // 128 + 4 + 8
C = 8
F = 4096
fblk = (-(-F // 128) + tcb + 7) // 8 * 8

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 256, (fblk, 128), dtype=np.int32))
offs = jnp.asarray((64 + np.arange(C) * 300).astype(np.int32).reshape(C, 1))
lens = jnp.asarray(np.full((C, 1), 100, np.int32))
comps = jnp.asarray(np.tile(np.array([1, 0], np.int32), C // 2).reshape(C, 1))

COMMON = dict(
    grid=(C // TC,),
    in_specs=[
        pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ],
    out_specs=(
        pl.BlockSpec((TC, n_full, U), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
    ),
    out_shape=(
        jax.ShapeDtypeStruct((C, n_full, U), _I32),
        jax.ShapeDtypeStruct((C, 1), _I32),
    ),
    scratch_shapes=[pltpu.VMEM((tcb, 128), _I32), pltpu.SemaphoreType.DMA],
)

def dma_start(off_ref, frame_ref, scratch, sem):
    base = pl.multiple_of((off_ref[0, 0] // 1024) * 8, 8)
    dma = pltpu.make_async_copy(frame_ref.at[pl.ds(base, tcb), :], scratch, sem)
    dma.start(); dma.wait()
    return base

def run(name, kernel):
    try:
        out, ok = pl.pallas_call(kernel, **COMMON)(offs, lens, comps, frame)
        s = float(jnp.sum(out.astype(jnp.float32))) + float(jnp.sum(ok))
        print(f"{name}: OK ({s:.0f})", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:120]}", flush=True)

# V1: DMA + double-dynamic store, 3 SMEM inputs
def v1(off_ref, len_ref, comp_ref, frame_ref, out_ref, ok_ref, scratch, sem):
    base = dma_start(off_ref, frame_ref, scratch, sem)
    def chunk(c, _):
        start = off_ref[c, 0] - base * 128
        blk = start // 128
        def unit(u, _):
            out_ref[c, u, :] = scratch[blk, :]
            return 0
        jax.lax.fori_loop(0, n_full, unit, 0)
        ok_ref[c, 0] = comp_ref[c, 0] + len_ref[c, 0]
        return 0
    jax.lax.fori_loop(0, TC, chunk, 0)
run("V1 dma+store", v1)

# V2: + cursor walk with rolls (static advance)
def v2(off_ref, len_ref, comp_ref, frame_ref, out_ref, ok_ref, scratch, sem):
    base = dma_start(off_ref, frame_ref, scratch, sem)
    def chunk(c, _):
        start = off_ref[c, 0] - base * 128
        def unit(u, cur):
            blk = cur // 128
            r = cur - blk * 128
            win = jnp.concatenate(
                [scratch[blk, :].reshape(1, 128),
                 scratch[blk + 1, :].reshape(1, 128),
                 scratch[blk + 2, :].reshape(1, 128),
                 jnp.zeros((1, 128), _I32)], axis=1)
            w = pltpu.roll(win, jnp.where(r == 0, 0, 512 - r), 1)
            out_ref[c, u, :] = w[0, :128]
            return cur + 130
        jax.lax.fori_loop(0, n_full, unit, start)
        ok_ref[c, 0] = 1
        return 0
    jax.lax.fori_loop(0, TC, chunk, 0)
run("V2 +rolls", v2)

# V3: + data-dependent advance + bool/vector carry
def v3(off_ref, len_ref, comp_ref, frame_ref, out_ref, ok_ref, scratch, sem):
    base = dma_start(off_ref, frame_ref, scratch, sem)
    def chunk(c, _):
        start = off_ref[c, 0] - base * 128
        is_raw = comp_ref[c, 0] == 0
        def unit(u, carry):
            cur, okc, prevg = carry
            blk = cur // 128
            r = cur - blk * 128
            win = jnp.concatenate(
                [scratch[blk, :].reshape(1, 128),
                 scratch[blk + 1, :].reshape(1, 128),
                 scratch[blk + 2, :].reshape(1, 128),
                 jnp.zeros((1, 128), _I32)], axis=1)
            w = pltpu.roll(win, jnp.where(r == 0, 0, 512 - r), 1)
            tag = w[0, 0]
            is_copy = (tag == 254) & jnp.logical_not(is_raw)
            okc = okc & (is_raw | (tag >= 0))
            cp = jnp.concatenate([prevg] * (U // G), axis=1)
            unit_v = jnp.where(is_copy, cp, w[:, 2 : 2 + U])
            unit_v = jnp.where(is_raw, w[:, :U], unit_v)
            prevg = unit_v[:, U - G :]
            out_ref[c, u, :] = unit_v[0, :]
            cur = cur + jnp.where(is_raw, U, jnp.where(is_copy, 6, 130))
            return cur, okc, prevg
        cur, okc, prevg = jax.lax.fori_loop(
            0, n_full, unit, (start, jnp.bool_(True), jnp.zeros((1, G), _I32)))
        ok_ref[c, 0] = (okc & (cur > 0)).astype(_I32)
        return 0
    jax.lax.fori_loop(0, TC, chunk, 0)
run("V3 +carry", v3)

print("BISECT DONE", flush=True)
