"""Pallas op-table executor: the device half of the parse/execute split.

Replays host-compiled piece tables (snappy/optable.py) into decoded bytes.
Where the fused general kernel (pallas_general.py) walks tags, validates,
and resolves copy overlap per element on device (~500-726 ns/element,
tools/probe_general_cost.py), this executor receives uniform pre-validated
PIECES — each writes 1..128 bytes and never crosses a 128-byte output
block boundary (the host pre-split ops on the exact output positions it
already knows) — and is built around the measured cost facts of this
toolchain (tools/probe_general_cost.py, tools/probe_exec2.py):

1. dependent dynamic-shift rolls are the expensive primitive -> exactly
   ONE combined dynamic roll per piece (source phase -> destination lane)
   and NO period-doubling rounds (the host expanded overlapping copies);
2. control-flow regions (pl.when) and per-stage vector->scalar round
   trips serialize Mosaic's schedule -> the chain step has NO predicated
   regions at all: stores are unconditional (a partially-assembled row is
   legally overwritten when the block completes) and all per-stage
   control is scalar prefix arithmetic over piece params extracted once
   per iteration;
3. the loop boundary costs ~600 ns -> each iteration advances tc
   interleaved chunk chains by n_stages=4 pieces (up to 512 B) each;
4. VMEM loads are nearly free -> far-copy sources and literal bytes
   stream from rows with plain aligned loads (literals were copied into
   rows [nout, nout+nlit) at kernel start, unifying both source kinds);
   the current and previous output blocks live in registers, so near
   copies touch no memory.

Kernel input: optable.pack_fields words — every per-stage scalar
(destination lanes pa/pe, end-of-block flag, near/far class, roll shift,
source row) is host-precomputed, leaving the chain state machine two
counters (piece index, block index). The logical invariant behind them
(1 <= m <= 128 per piece, one output block each, off == 0 or
m <= off <= bytes produced) is guaranteed by optable.build_op_table /
hapn_snappy_optable_batch. All dynamic row indices are clamped anyway —
a malformed table must degrade to garbage output, never a fault
(CLAUDE.md §4).
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
    """Chains per grid step under a ~10 MB VMEM budget (int32 lanes).

    8 chains balance latency hiding vs register pressure: 16 measured
    ~1.3x WORSE at 4K/64-chunk shapes (spilling). Env override
    HAP_TPU_EXEC_TC for A/B runs."""
    import os

    override = os.environ.get("HAP_TPU_EXEC_TC")
    choices = (8, 4, 2, 1)
    if override:
        choices = (int(override),) + tuple(
            c for c in choices if c < int(override))
    for tc in choices:
        if tc * rows_per_chain * 128 * 4 <= 10 * 2**20:
            return tc
    return 1


def execute_op_tables(ops, n_ops, lit, out_len, S_max, n_stages=None,
                      out_words: bool = False):
    """Resolve n_stages (env HAP_TPU_EXEC_STAGES for A/B runs; measured
    default 4) OUTSIDE jit so it keys the cache, then dispatch."""
    if n_stages is None:
        import os

        n_stages = int(os.environ.get("HAP_TPU_EXEC_STAGES", "4"))
    return _execute_op_tables(ops, n_ops, lit, out_len, S_max, n_stages,
                              out_words)


@functools.partial(jax.jit, static_argnames=("S_max", "n_stages", "out_words"))
def _execute_op_tables(
    ops: jnp.ndarray,  # (C, NOPS, 2) int32 pack_fields words (optable.py)
    n_ops: jnp.ndarray,  # (C,) int32
    lit: jnp.ndarray,  # (C, L) uint8 literal planes
    out_len: jnp.ndarray,  # (C,) int32 decoded sizes (<= S_max)
    S_max: int,
    n_stages: int = 4,
    out_words: bool = False,
) -> jnp.ndarray:
    """Execute C piece tables -> (C, S_max) uint8 decoded rows — or, with
    ``out_words`` (requires S_max % 4 == 0), (C, S_max//4) uint32 LE words
    packed straight from the kernel's int32 byte lanes with shifts
    (~free), skipping the int32->uint8 lane relayout AND the downstream
    uint8->uint32 repack the BCn decoders would pay (~2.7 ms per 4K frame
    measured on the foreign-GOP path, tools/profile_foreign_gop_stages.py).

    Rows whose host verdict was "malformed" must be passed with
    n_ops == 0; their output rows are undefined (the caller carries the
    host ok flags — the kernel itself cannot fail, only produce garbage
    for garbage tables).
    """
    C0, NOPS, _ = ops.shape
    L = lit.shape[1]
    nout = -(-S_max // 128)
    nlit = -(-L // 128)
    nops_rows = -(-(NOPS * 2) // 128) + 1  # +1: unclamped row+1 reads
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
    # descending piece count into contiguous groups; unsort on return.
    perm = jnp.argsort(-n_ops)
    inv = jnp.argsort(perm)
    ops = jnp.take(ops, perm, axis=0)
    n_ops = jnp.take(n_ops, perm)
    lit = jnp.take(lit, perm, axis=0)
    out_len = jnp.take(out_len, perm)

    ops_blocks = (
        jnp.pad(ops.reshape(C, NOPS * 2),
                ((0, 0), (0, nops_rows * 128 - NOPS * 2)))
        .reshape(C, nops_rows, 128)
    )
    lit_blocks = (
        jnp.pad(lit, ((0, 0), (0, nlit * 128 - L)))
        .astype(_I32)
        .reshape(C, nlit, 128)
    )
    # n_ops grouped by grid step and padded to 8 rows per group: a
    # (8, 1) SMEM block satisfies Mosaic's block-shape rule at any tc and
    # keeps SMEM O(1) per step (an unblocked (C, 1) input exhausted the
    # 1 MB SMEM next to the kernel's scalar spill slots at C = 2048).
    G = C // tc
    meta = jnp.zeros((G, 8), _I32).at[:, :tc].set(
        n_ops.astype(_I32).reshape(G, tc)).reshape(G * 8, 1)
    P = n_stages

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

        def cond(c):
            r = c[0] < nops_j[0]
            for j in range(1, tc):
                r = r | (c[4 * j] < nops_j[j])
            return r

        def body(c):
            # STAGE-MAJOR emission: all chains' piece-param fetches first,
            # then stage p of every chain together — consecutive
            # instructions belong to independent chains, so Mosaic's
            # scheduler can hide each chain's serial roll/select latency
            # behind its neighbors' (chain-major measured ~25% slower).
            st = [list(c[4 * j: 4 * j + 4]) for j in range(tc)]
            Ws = []
            for j in range(tc):
                opi = st[j][0]
                flat = opi * 2
                row = jnp.clip(flat // 128, 0, nops_rows - 2)
                W = jnp.concatenate(
                    [ops_ref[j, row, :].reshape(1, 128),
                     ops_ref[j, row + 1, :].reshape(1, 128)], axis=1)
                Ws.append(pltpu.roll(W, (256 - (flat - row * 128)) % 256, 1))

            for p in range(P):
                for j in range(tc):
                    opi, bcur, V, P1 = st[j]
                    # host-packed fields (optable.pack_fields): every
                    # per-stage scalar is precomputed, so the stage is
                    # pure extract -> load -> roll -> select with only
                    # two counters of chain state
                    w0 = Ws[j][0, 2 * p]
                    row0 = Ws[j][0, 2 * p + 1]
                    live = (opi + p < nops_j[j]).astype(_I32)
                    pa = w0 & 127
                    pe = ((w0 >> 7) & 255) * live
                    end = ((w0 >> 15) & 1) * live
                    near = (w0 >> 16) & 1
                    shift = (w0 >> 17) & 255
                    row0 = jnp.clip(row0, 0, ntot - 1)
                    row1 = jnp.minimum(row0 + 1, ntot - 1)
                    wf = jnp.concatenate(
                        [out_ref[j, row0, :].reshape(1, 128),
                         out_ref[j, row1, :].reshape(1, 128)], axis=1)
                    wn = jnp.concatenate([P1, V], axis=1)
                    w = jnp.where(near > 0, wn, wf)
                    placed = pltpu.roll(w, shift, 1)[:, :128]
                    V = jnp.where(
                        (lane128 >= pa) & (lane128 < pe), placed, V)
                    # Unconditional flush of the current block; a partial
                    # row is legally rewritten when the block completes.
                    # Finished chains rewrite their (final) block with an
                    # empty merge — harmless.
                    out_ref[j, jnp.clip(bcur, 0, ntot - 1), :] = V[0]
                    P1 = jnp.where(end > 0, V, P1)
                    V = jnp.where(end > 0, jnp.zeros((1, 128), _I32), V)
                    st[j] = [opi, bcur + end, V, P1]
            out = []
            for j in range(tc):
                st[j][0] = st[j][0] + P
                out.extend(st[j])
            return tuple(out)

        carry = []
        for j in range(tc):
            carry.extend([
                jnp.int32(0), jnp.int32(0),
                jnp.zeros((1, 128), _I32), jnp.zeros((1, 128), _I32),
            ])
        jax.lax.while_loop(cond, body, tuple(carry))

    out = pl.pallas_call(
        kernel,
        grid=(C // tc,),
        in_specs=[
            pl.BlockSpec((8, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
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
    if out_words:
        assert S_max % 4 == 0
        y = out[:, :nout, :].reshape(C, nout * 32, 4).astype(jnp.uint32)
        words = (y[..., 0] | (y[..., 1] << 8) | (y[..., 2] << 16)
                 | (y[..., 3] << 24))
        return words[:C0, : S_max // 4]
    return (
        out[:, :nout, :].reshape(C, nout * 128)[:C0, :S_max].astype(jnp.uint8)
    )
