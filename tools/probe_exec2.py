"""Probe the RESTRUCTURED op-table executor inner loop on silicon.

probe_general_cost.py's blockstep variants predicted ~181 ns/block, but
the v1 executor measured ~10-40x worse per iteration. Suspects: per-stage
pl.when flush regions (32 control-flow barriers per iteration), per-stage
op-window rolls, and per-stage vector->scalar extracts feeding roll
shifts. This probe A/Bs the restructured iteration:

  smemops — per chain: 4 stages; op params read from SMEM (scalar-core
            loads, no vector->scalar transfer); each stage: 2 dynamic-row
            VMEM loads + ONE dynamic roll positioning into a 768-lane
            accumulator + masked select; iteration end: 4 UNCONDITIONAL
            aligned stores (partial rows legally overwritten later) + a
            where-chain shift of the accumulator. Zero pl.when anywhere.
  vecops  — same, but op params come from a VMEM op row via roll+extract
            once per iteration (8 lanes), quantifying the SMEM benefit.
  smem1   — smemops with 1 store (aligned) instead of 4, lower bound.

Run alone (one TPU python process at a time — CLAUDE.md).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
TC = 8
NOPS_ROWS = 64  # op words per chain in VMEM variant
NSMEM = 4096    # op words per chain in SMEM variant
NOUT = 1015
ITERS = int(os.environ.get("PROBE_ITERS", "20000"))
P = 4


def make_kernel(variant):
    def kernel(smem_ops_ref, vops_ref, out_ref, ok_ref):
        lane768 = jax.lax.broadcasted_iota(_I32, (1, 768), 1)

        def body(carry_list):
            i = carry_list[0]
            acc = [i + 1]
            for j in range(TC):
                base = 1 + j * 3
                cur, pa, A = carry_list[base:base + 3]
                # --- op params for the 4 stages -----------------------
                if variant == "vecops":
                    flat = (cur * 2) % (NOPS_ROWS * 128 - 8)
                    row = vops_ref[j, flat // 128, :].reshape(1, 128)
                    w0 = pltpu.roll(row, (128 - flat % 128) % 128, 1)
                    params = [(w0[0, 2 * p] & 63, w0[0, 2 * p + 1] & 255)
                              for p in range(P)]
                else:
                    fl = (cur * 2) % (NSMEM - 8)
                    params = [(smem_ops_ref[j, fl + 2 * p] & 63,
                               smem_ops_ref[j, fl + 2 * p + 1] & 255)
                              for p in range(P)]
                # --- stages -------------------------------------------
                for p in range(P):
                    mraw, off = params[p]
                    m = jnp.minimum(mraw + 24, 768 - pa)
                    src = (cur * 5 + p * 263 + off) % (NOUT * 128 - 256)
                    row0 = src // 128
                    w = jnp.concatenate([
                        out_ref[j, row0, :].reshape(1, 128),
                        out_ref[j, row0 + 1, :].reshape(1, 128),
                        jnp.zeros((1, 512), _I32),
                    ], axis=1)
                    sh = (pa - (src % 128)) % 768
                    placed = pltpu.roll(w, sh, 1)
                    A = jnp.where(
                        (lane768 >= pa) & (lane768 < pa + m), placed, A)
                    pa = pa + m
                # --- flush: unconditional aligned stores ---------------
                blk0 = (cur // 128) % (NOUT - 6)
                nstores = 1 if variant == "smem1" else 4
                for k in range(nstores):
                    out_ref[j, blk0 + k, :] = A[0, 256 + 128 * k:384 + 128 * k]
                # --- shift A by completed blocks (where-chain) ---------
                nc = jnp.clip((pa - 256) // 128, 0, 4)
                for s in range(1, 5):
                    As = jnp.concatenate(
                        [A[:, 128 * s:], jnp.zeros((1, 128 * s), _I32)],
                        axis=1)
                    A = jnp.where(nc == s, As, A)
                pa = pa - nc * 128
                acc.extend([cur + 17, pa, A])
            return tuple(acc)

        carry = [jnp.int32(0)]
        for j in range(TC):
            carry.extend([jnp.int32(j), jnp.int32(256 + j),
                          jnp.zeros((1, 768), _I32)])
        carry = jax.lax.while_loop(
            lambda c: c[0] < ITERS, lambda c: tuple(body(list(c))),
            tuple(carry))
        for j in range(TC):
            ok_ref[j, 0] = carry[1 + j * 3] + carry[2 + j * 3]

    return kernel


def run(variant, smem_ops, vops):
    f = pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((TC, NSMEM), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TC, NOPS_ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC, NOUT, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((TC, NOUT, 128), _I32),
            jax.ShapeDtypeStruct((TC, 1), _I32),
        ),
        interpret=os.environ.get("PROBE_INTERPRET", "") == "1",
    )
    g = jax.jit(f)
    out, ok = g(smem_ops, vops)
    _ = float(jnp.sum(ok))
    ts = []
    for _ in range(5):
        t0 = time.time()
        out, ok = g(smem_ops, vops)
        _ = float(jnp.sum(ok))
        ts.append(time.time() - t0)
    dt = sorted(ts)[2]
    per_iter = dt / ITERS
    print(f"{variant:8s}: {dt*1000:7.2f} ms  {per_iter*1e9:7.0f} ns/iter "
          f"{per_iter/TC*1e9:6.0f} ns/chain-step ({P} op-pieces, <=512 B)")
    return dt


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)
    smem_ops = jnp.asarray(
        rng.integers(0, 1 << 20, (TC, NSMEM), np.int64), _I32)
    vops = jnp.asarray(
        rng.integers(0, 1 << 20, (TC, NOPS_ROWS, 128), np.int64), _I32)
    for v in os.environ.get(
            "PROBE_VARIANTS", "smemops,vecops,smem1").split(","):
        run(v, smem_ops, vops)


if __name__ == "__main__":
    main()
