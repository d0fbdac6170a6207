"""Microbenchmark the per-iteration cost components of the general Snappy
kernel's chain step (snappy/pallas_general.py) on silicon.

Variants, each a while_loop of ITERS steps over the same (8, nin, 128)
VMEM blocks, 8 interleaved chains like the real kernel:

  base      — scalar carry arithmetic only (loop + bookkeeping floor)
  extract   — + 5 vector->scalar lane extracts per chain (tag parse)
  window    — + the 3-row dynamic window read + roll per chain
  winx      — window + extracts
  copysrc   — winx + second window read + 6-round period doubling
  store     — copysrc + merge store (the full real chain step shape)

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

from hap_tpu.snappy.pallas_general import _merge_store, _read_window

_I32 = jnp.int32
TC = 8
NIN = 128   # 16 KB stream window per chain
NOUT = 1015  # ~130 KB output per chain
ITERS = int(os.environ.get("PROBE_ITERS", "2000"))


def make_kernel(variant):
    def kernel(comp_ref, out_ref, ok_ref):
        lane256 = jax.lax.broadcasted_iota(_I32, (1, 256), 1)
        lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)

        def body(carry):
            i = carry[0]
            acc = []
            for j in range(TC):
                cur = carry[1 + j]
                nxt = cur
                if variant == "base":
                    nxt = cur + 7
                else:
                    win = _read_window(comp_ref, j, cur % (NIN * 100), NIN)
                    if variant == "window":
                        nxt = cur + win[0, 0] % 5 + 3
                    else:
                        b = [win[0, k] for k in range(5)]
                        nxt = cur + (b[0] & 3) + (b[1] & 1) + (b[2] & 1) + (
                            b[3] & 1) + (b[4] & 1) + 3
                        if variant in ("copysrc", "store"):
                            src = jnp.maximum(cur % (NOUT * 100) - 64, 0)
                            wsrc = _read_window(out_ref, j, src, NOUT)
                            v = wsrc[:, :256]
                            valid = jnp.clip(b[1] + 1, 1, 64)
                            for _ in range(6):
                                v = jnp.where(
                                    lane256 >= valid, pltpu.roll(v, valid, 1), v)
                                valid = jnp.minimum(valid * 2, 128)
                            if variant == "store":
                                v512 = jnp.concatenate(
                                    [v, jnp.zeros((1, 256), _I32)], axis=1)
                                _merge_store(
                                    out_ref, j, cur % (NOUT * 100), v512,
                                    (b[2] & 63) + 1, NOUT)
                            else:
                                nxt = nxt + v[0, 0]
                        elif variant == "copysrc_ro":
                            # same work, but source = read-only comp_ref:
                            # isolates the out_ref read-after-write chain.
                            src = jnp.maximum(cur % (NIN * 100) - 64, 0)
                            wsrc = _read_window(comp_ref, j, src, NIN)
                            v = wsrc[:, :256]
                            valid = jnp.clip(b[1] + 1, 1, 64)
                            for _ in range(6):
                                v = jnp.where(
                                    lane256 >= valid, pltpu.roll(v, valid, 1), v)
                                valid = jnp.minimum(valid * 2, 128)
                            nxt = nxt + v[0, 0]
                        elif variant == "dbl128":
                            # doubling on 128 lanes only (copies emit <= 64 B)
                            src = jnp.maximum(cur % (NOUT * 100) - 64, 0)
                            wsrc = _read_window(out_ref, j, src, NOUT)
                            v = wsrc[:, :128]
                            valid = jnp.clip(b[1] + 1, 1, 64)
                            for _ in range(6):
                                v = jnp.where(
                                    lane128 >= valid, pltpu.roll(v, valid, 1), v)
                                valid = jnp.minimum(valid * 2, 64)
                            nxt = nxt + v[0, 0]
                        elif variant == "nodbl":
                            # out_ref window read alone, no doubling rounds
                            src = jnp.maximum(cur % (NOUT * 100) - 64, 0)
                            wsrc = _read_window(out_ref, j, src, NOUT)
                            nxt = nxt + wsrc[0, 0]
                acc.append(nxt)
            return tuple([i + 1] + acc)

        carry = tuple([jnp.int32(0)] + [jnp.int32(j) for j in range(TC)])
        carry = jax.lax.while_loop(lambda c: c[0] < ITERS, body, carry)
        for j in range(TC):
            ok_ref[j, 0] = carry[1 + j]

    return kernel


def make_exec_kernel(variant):
    """Simulate the parse/execute-split executor's inner loop.

    Per chain the output tail lives in a value-carried (1, 640) register
    window A (lanes [0, pa) valid); each iteration merges m<=128 bytes at
    lane pa via one dynamic placement roll + select, and when pa crosses
    512 flushes ONE aligned 128-lane block to out_ref (no read-modify-
    write) and shifts A left statically.  Variants:

      regmerge — near source: roll A (register history) for the copy source
      regfar   — + PREDICATED out_ref 3-block window read (~1/3 of iters,
                 the far-src fraction measured by probe_merge_stats)
    """
    def kernel(comp_ref, out_ref, ok_ref, vtmp_ref):
        lane640 = jax.lax.broadcasted_iota(_I32, (1, 640), 1)

        def body(carry):
            i = carry[0]
            acc = []
            for j in range(TC):
                cur, pa, A = carry[1 + 3 * j], carry[2 + 3 * j], carry[3 + 3 * j]
                # simulated op params (scalar arithmetic stand-in for SMEM)
                m = (cur & 63) + 40
                off = (cur & 255) + 1
                far = (cur % 3) == 0
                # near source: dynamic roll of the register window
                srcv = pltpu.roll(A, 640 - (pa - off) % 640, 1)
                if variant == "regfar":
                    @pl.when(far)
                    def _():
                        w = _read_window(
                            out_ref, j, jnp.maximum(cur % (NOUT * 100) - 700, 0),
                            NOUT)
                        vtmp_ref[j, :] = w[0, :128]
                    srcv = jnp.where(
                        far,
                        jnp.pad(vtmp_ref[j, :].reshape(1, 128), ((0, 0), (0, 512))),
                        srcv,
                    )
                # merge at pa: one placement roll + masked select
                placed = pltpu.roll(srcv, pa, 1)
                A = jnp.where((lane640 >= pa) & (lane640 < pa + m), placed, A)
                pa2 = pa + m
                flush = pa2 >= 512

                @pl.when(flush)
                def _():
                    out_ref[j, (cur // 128) % NOUT, :] = A[0, 384:512]

                A = jnp.where(
                    flush,
                    jnp.concatenate(
                        [A[:, 128:], jnp.zeros((1, 128), _I32)], axis=1),
                    A,
                )
                pa2 = jnp.where(flush, pa2 - 128, pa2)
                acc.extend([cur + m, pa2, A])
            return tuple([i + 1] + acc)

        carry = [jnp.int32(0)]
        for j in range(TC):
            carry.extend(
                [jnp.int32(j), jnp.int32(384 + j), jnp.zeros((1, 640), _I32)])
        carry = jax.lax.while_loop(lambda c: c[0] < ITERS, body, tuple(carry))
        for j in range(TC):
            ok_ref[j, 0] = carry[1 + 3 * j] + carry[2 + 3 * j]

    return kernel


def make_block_kernel(variant):
    """Simulate a block-centric executor chain-step.

    Per chain and iteration: assemble ONE 128-lane output block from up to
    P ops — each op = 2 dynamic-row source loads + ONE combined dynamic
    roll (source phase -> dst lane) + masked select into the block value —
    then ONE aligned store.  No read-modify-write of out_ref, no doubling
    in the common path.  Variants: blockstep (P=4), blockstep2 (P=2),
    blockstep_f (P=4 under fori_loop).
    """
    P = 2 if variant == "blockstep2" else 4
    use_fori = variant == "blockstep_f"

    def kernel(comp_ref, out_ref, ok_ref, vtmp_ref):
        lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)

        def step(carry_list):
            i = carry_list[0]
            acc = [i + 1]
            for j in range(TC):
                base = 1 + j * 4
                cur, pa, V, prevV = carry_list[base:base + 4]
                for p in range(P):
                    # simulated op params (stand-in for SMEM table reads)
                    src = (cur * 7 + p * 131) % (NIN * 128 - 256)
                    m = jnp.minimum((cur & 63) + 24, 128 - pa)
                    row = src // 128
                    s128 = jnp.concatenate([
                        comp_ref[j, row, :].reshape(1, 128),
                        comp_ref[j, row + 1, :].reshape(1, 128),
                    ], axis=1)
                    # ONE combined roll: source phase src%128 -> lane pa
                    sh = (pa - src) % 256
                    placed = pltpu.roll(s128, sh, 1)[:, :128]
                    V = jnp.where((lane128 >= pa) & (lane128 < pa + m),
                                  placed, V)
                    pa = pa + m
                full = pa >= 128

                @pl.when(full)
                def _():
                    out_ref[j, (cur // 128) % NOUT, :] = V[0]

                prevV = jnp.where(full, V, prevV)
                V = jnp.where(full, jnp.zeros((1, 128), _I32), V)
                pa = jnp.where(full, 0, pa)
                acc.extend([cur + 128, pa, V, prevV])
            return acc

        carry = [jnp.int32(0)]
        for j in range(TC):
            carry.extend([jnp.int32(j), jnp.int32(0),
                          jnp.zeros((1, 128), _I32),
                          jnp.zeros((1, 128), _I32)])
        if use_fori:
            carry = jax.lax.fori_loop(
                0, ITERS, lambda k, c: tuple(step(list(c))), tuple(carry))
        else:
            carry = jax.lax.while_loop(
                lambda c: c[0] < ITERS, lambda c: tuple(step(list(c))),
                tuple(carry))
        for j in range(TC):
            ok_ref[j, 0] = carry[1 + j * 4] + carry[2 + j * 4]

    return kernel


def run(variant, comp, dev):
    exec_variant = variant in ("regmerge", "regfar")
    block_variant = variant.startswith("blockstep")
    f = pl.pallas_call(
        make_block_kernel(variant) if block_variant
        else make_exec_kernel(variant) if exec_variant
        else make_kernel(variant),
        grid=(1,),
        in_specs=[pl.BlockSpec((TC, NIN, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TC, NOUT, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((TC, NOUT, 128), _I32),
            jax.ShapeDtypeStruct((TC, 1), _I32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((TC, 128), _I32)]
            if (exec_variant or block_variant) else []),
        interpret=os.environ.get("PROBE_INTERPRET", "") == "1",
    )
    g = jax.jit(f)
    out, ok = g(comp)
    _ = float(jnp.sum(ok))
    ts = []
    for _ in range(5):
        t0 = time.time()
        out, ok = g(comp)
        _ = float(jnp.sum(ok))
        ts.append(time.time() - t0)
    dt = sorted(ts)[2]
    per_iter = dt / ITERS
    per_chain = per_iter / TC
    print(f"{variant:8s}: {dt*1000:7.2f} ms  {per_iter*1e9:7.0f} ns/iter "
          f"{per_chain*1e9:6.0f} ns/chain-step")
    return dt


def main():
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    rng = np.random.default_rng(0)
    comp = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (TC, NIN, 128), np.int64), _I32), dev)
    variants = os.environ.get("PROBE_VARIANTS", "base,window,winx,copysrc,store")
    for v in variants.split(","):
        run(v, comp, dev)
    # sync-floor reference
    t0 = time.time()
    _ = float(jnp.sum(comp))
    print(f"(host-sync floor ~{(time.time()-t0)*1000:.0f} ms)")


if __name__ == "__main__":
    main()
