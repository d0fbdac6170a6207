"""Pallas op-table executor: the device half of the parse/execute split.

Replays host-compiled op tables (snappy/optable.py) into decoded bytes.
Where the fused general kernel (pallas_general.py) walks tags, validates,
and resolves copy overlap per element on device (~500-726 ns/element,
tools/probe_general_cost.py), this executor receives uniform pre-validated
ops and is built around the three measured cost facts of this toolchain:

1. dependent dynamic-shift rolls are the expensive primitive (~80 ns each,
   serially chained) -> exactly ONE combined roll per op piece (source
   phase -> destination lane), and NO period-doubling rounds at all (the
   host expanded overlapping copies into non-overlap sequences);
2. the loop boundary costs ~600 ns/iteration -> each iteration advances
   ``tc`` interleaved chunk chains by up to P=4 ops / 128 output bytes
   each;
3. VMEM loads (even from rows the kernel wrote) are nearly free -> far
   copy sources and literal bytes stream from rows with plain aligned
   loads; the current and previous output block live in registers, so the
   common (near-copy) path touches no memory at all, and output rows are
   written ONCE each (no read-modify-write merge stores).

Block-centric chain step (per chain, per stage): fetch the next op when
the current one is exhausted; take m_eff = min(m_rem, 128 - pa) bytes;
form the 256-lane source window — near copies from [P1|V] registers, far
copies / literals from two out_ref rows (literals were copied into rows
[nout, nout+nlit) at kernel start, unifying both streams) — roll once to
place the source at lane pa, select into V; flush V with one aligned
dynamic-row store when the block completes.

Kernel input invariant (guaranteed by optable.build_op_table): every op
has m >= 1 and off == 0 (literal) or min(m, 128) <= off <= bytes already
produced. All dynamic row indices are clamped anyway — a malformed table
must degrade to garbage output, never a fault (CLAUDE.md §4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tc(rows_per_chain: int) -> int:
    """Chains per grid step under a ~10 MB VMEM budget (int32 lanes)."""
    for tc in (8, 4, 2, 1):
        if tc * rows_per_chain * 128 * 4 <= 10 * 2**20:
            return tc
    return 1


@functools.partial(
    jax.jit, static_argnames=("S_max", "n_stages"))
def execute_op_tables(
    ops: jnp.ndarray,  # (C, NOPS, 2) int32 [m, off]; off==0 -> literal
    n_ops: jnp.ndarray,  # (C,) int32
    lit: jnp.ndarray,  # (C, L) uint8 literal planes
    out_len: jnp.ndarray,  # (C,) int32 decoded sizes (<= S_max)
    S_max: int,
    n_stages: int = 4,
) -> jnp.ndarray:
    """Execute C op tables -> (C, S_max) uint8 decoded rows.

    Rows whose host verdict was "malformed" must be passed with
    n_ops == 0; they come back zero-filled (the caller carries the host ok
    flags — the kernel itself cannot fail, only produce garbage for
    garbage tables).
    """
    C0, NOPS, _ = ops.shape
    L = lit.shape[1]
    nout = -(-S_max // 128)
    nlit = -(-L // 128)
    nops_rows = -(-(NOPS * 2) // 128)
    ntot = nout + nlit
    tc = _pick_tc(nops_rows + nlit + ntot)
    if C0 % tc:
        padc = tc - C0 % tc
        ops = jnp.pad(ops, ((0, padc), (0, 0), (0, 0)))
        n_ops = jnp.pad(n_ops, (0, padc))
        lit = jnp.pad(lit, ((0, padc), (0, 0)))
        out_len = jnp.pad(out_len, (0, padc))
    C = ops.shape[0]

    # Load balance: lockstep chains cost their longest member, so sort by
    # descending step estimate (ops + output blocks) into contiguous
    # groups; unsort on return.
    est = n_ops + (out_len + 127) // 128
    perm = jnp.argsort(-est)
    inv = jnp.argsort(perm)
    ops = jnp.take(ops, perm, axis=0)
    n_ops = jnp.take(n_ops, perm)
    lit = jnp.take(lit, perm, axis=0)
    out_len = jnp.take(out_len, perm)

    ops_blocks = (
        jnp.pad(ops.reshape(C, NOPS * 2), ((0, 0), (0, nops_rows * 128 - NOPS * 2)))
        .reshape(C, nops_rows, 128)
    )
    lit_blocks = (
        jnp.pad(lit, ((0, 0), (0, nlit * 128 - L)))
        .astype(_I32)
        .reshape(C, nlit, 128)
    )
    meta = jnp.stack([n_ops.astype(_I32), out_len.astype(_I32)], axis=1)

    def kernel(meta_ref, ops_ref, lit_ref, out_ref):
        lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)
        nops_j = [meta_ref[j, 0] for j in range(tc)]

        # Copy literal planes into the out tail rows: unifies literal and
        # far-copy sources into one "stream from out_ref rows" path.
        def litcopy(r, _):
            for j in range(tc):
                out_ref[j, nout + r, :] = lit_ref[j, r, :]
            return 0

        jax.lax.fori_loop(0, nlit, litcopy, 0)

        # chain carry: (opi, m_rem, off_cur, lc, outpos, V, P1) x tc
        def chain_stage(j, opi, m_rem, off_cur, lc, outpos, V, P1):
            fetch = (m_rem == 0) & (opi < nops_j[j])
            flat = jnp.clip(opi, 0, NOPS - 1) * 2
            oprow = ops_ref[j, flat // 128, :].reshape(1, 128)
            opw = pltpu.roll(oprow, (128 - flat % 128) % 128, 1)
            m_rem = jnp.where(fetch, opw[0, 0], m_rem)
            off_cur = jnp.where(fetch, opw[0, 1], off_cur)
            opi = opi + fetch.astype(_I32)

            pa = outpos & 127
            m_eff = jnp.where(m_rem > 0, jnp.minimum(m_rem, 128 - pa), 0)
            is_lit = off_cur == 0
            s = jnp.where(is_lit, nout * 128 + lc, outpos - off_cur)
            s = jnp.clip(s, 0, ntot * 128 - 1)
            near = (~is_lit) & (off_cur <= pa + 128)

            # A legal source never crosses OUT of the final row, so the two
            # row reads clamp independently (row0+1 collapses to row0 there).
            row0 = jnp.clip(s // 128, 0, ntot - 1)
            row1 = jnp.minimum(row0 + 1, ntot - 1)
            wf = jnp.concatenate(
                [out_ref[j, row0, :].reshape(1, 128),
                 out_ref[j, row1, :].reshape(1, 128)], axis=1)
            wn = jnp.concatenate([P1, V], axis=1)
            w = jnp.where(near, wn, wf)
            srcl = jnp.where(near, 128 + pa - off_cur, s & 127)
            srcl = jnp.clip(srcl, 0, 255)
            placed = pltpu.roll(w, (pa - srcl) % 256, 1)[:, :128]
            V = jnp.where(
                (lane128 >= pa) & (lane128 < pa + m_eff), placed, V)

            outpos = outpos + m_eff
            m_rem = m_rem - m_eff
            lc = lc + jnp.where(is_lit, m_eff, 0)
            full = ((outpos & 127) == 0) & (m_eff > 0)

            @pl.when(full)
            def _():
                out_ref[j, jnp.clip(outpos // 128 - 1, 0, ntot - 1), :] = V[0]

            P1 = jnp.where(full, V, P1)
            V = jnp.where(full, jnp.zeros((1, 128), _I32), V)
            return opi, m_rem, off_cur, lc, outpos, V, P1

        def actives(c):
            return [
                (c[7 * j + 1] > 0) | (c[7 * j] < nops_j[j]) for j in range(tc)
            ]

        def cond(c):
            a = actives(c)
            r = a[0]
            for x in a[1:]:
                r = r | x
            return r

        def body(c):
            out = []
            for j in range(tc):
                st = c[7 * j: 7 * j + 7]
                for _ in range(n_stages):
                    st = chain_stage(j, *st)
                out.extend(st)
            return tuple(out)

        carry = []
        for j in range(tc):
            carry.extend([
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.zeros((1, 128), _I32),
                jnp.zeros((1, 128), _I32),
            ])
        carry = jax.lax.while_loop(cond, body, tuple(carry))

        # final partial block
        for j in range(tc):
            outpos, V = carry[7 * j + 4], carry[7 * j + 5]

            @pl.when((outpos & 127) > 0)
            def _():
                out_ref[j, jnp.clip(outpos // 128, 0, ntot - 1), :] = V[0]

    out = pl.pallas_call(
        kernel,
        grid=(C // tc,),
        in_specs=[
            pl.BlockSpec((tc, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tc, nops_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, nlit, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, ntot, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, ntot, 128), _I32),
        interpret=_interpret(),
    )(meta, ops_blocks, lit_blocks)
    out = jnp.take(out, inv, axis=0)
    return (
        out[:, :nout, :].reshape(C, nout * 128)[:C0, :S_max].astype(jnp.uint8)
    )
