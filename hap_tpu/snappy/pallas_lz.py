"""Pallas emission kernel for the device LZ encoder (device_lz.py plans).

Replays per-segment piece tables into conforming Snappy streams. Unlike the
decode executor (pallas_exec.py) every piece's output position is
PRECOMPUTED by the planner, so pieces carry no serial dependency — the
kernel walks them in position order per chunk only because read-modify-
write row merges are cheapest in order. Two specialized loops per segment:

* copy pieces: up to 128 copy-2 elements (384 stream bytes) built entirely
  from the record's scalars (offset/tag patterns via widx mod-3 selects) —
  no payload bytes touched;
* literal pieces: tag bytes + up to 1030 payload bytes streamed from the
  resident chunk payload block with one unaligned window read and one
  dynamic roll.

Empty slots self-neutralize: an all-zero record decodes to a zero-size
piece whose placement mask is empty, so per-chunk piece-count divergence
inside a tile costs only the wasted vector work (no control flow — the
executor's measured rule that predicated regions serialize Mosaic).

Streams are bit-identical to device_lz.emit_reference (the test contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hap_tpu.snappy.device_lz import SEG_SLOTS, _varint, lz_bound

_I32 = jnp.int32

_ELR = 9   # literal payload window rows (tag 3 + 1030 bytes <= 1152 = 9*128)
_CR = 3    # copy emission rows (384 bytes)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _lane128():
    return jax.lax.broadcasted_iota(_I32, (1, 128), 1)


@functools.partial(jax.jit, static_argnames=("S",))
def emit_lz_streams(
    data: jnp.ndarray,        # (C, S) uint8 chunk payloads
    tables_lit: jnp.ndarray,  # (C, NSEG*SEG_SLOTS, 2) int32
    tables_copy: jnp.ndarray,
    counts: jnp.ndarray,      # (C, NSEG, 2) int32 [lit, copy]
    S: int,
) -> jnp.ndarray:
    """Emit each chunk's Snappy stream -> (C, bound) uint8.

    The varint preamble is written XLA-side (static bytes); callers pair
    the result with plan.comp_len.
    """
    C0 = data.shape[0]
    NSEG = counts.shape[1]
    bound = lz_bound(S)
    pre = _varint(S)

    tc = 4
    if C0 % tc:
        padc = tc - C0 % tc
        data = jnp.pad(data, ((0, padc), (0, 0)))
        tables_lit = jnp.pad(tables_lit, ((0, padc), (0, 0), (0, 0)))
        tables_copy = jnp.pad(tables_copy, ((0, padc), (0, 0), (0, 0)))
        counts = jnp.pad(counts, ((0, padc), (0, 0), (0, 0)))
    C = data.shape[0]

    drows = -(-S // 128) + _ELR + 2
    data_blocks = (
        jnp.pad(data, ((0, 0), (0, drows * 128 - S)))
        .astype(_I32).reshape(C, drows, 128)
    )
    tvals = NSEG * SEG_SLOTS * 2
    trows = -(-tvals // 128) + 1
    tl_blocks = jnp.pad(
        tables_lit.reshape(C, tvals), ((0, 0), (0, trows * 128 - tvals))
    ).reshape(C, trows, 128)
    tcp_blocks = jnp.pad(
        tables_copy.reshape(C, tvals), ((0, 0), (0, trows * 128 - tvals))
    ).reshape(C, trows, 128)
    # Per-chunk meta for the (s, k) piece walks: [cnt_lit(NSEG),
    # cnt_copy(NSEG), nxt_lit(NSEG+1), nxt_copy(NSEG+1)] where nxt[s] is
    # the first segment >= s with pieces of that kind (NSEG when none) —
    # O(1) empty-segment skipping in the kernel (a per-segment loop pair
    # costs ~600 ns of loop boundary per segment per tile, ~2.5 ms/frame).
    cl_ = counts[:, :, 0]
    cc_ = counts[:, :, 1]
    sidx = jnp.arange(NSEG, dtype=_I32)[None, :]

    def _nxt(cnt):
        x = jnp.where(cnt > 0, sidx, NSEG)
        r = jnp.flip(jax.lax.cummin(jnp.flip(x, axis=1), axis=1), axis=1)
        return jnp.concatenate(
            [r, jnp.full((C, 1), NSEG, _I32)], axis=1)  # (C, NSEG+1)

    MW = 4 * NSEG + 2
    meta_c = jnp.concatenate([cl_, cc_, _nxt(cl_), _nxt(cc_)], axis=1)
    # SMEM blocks need their leading dim divisible by 8 (or equal to the
    # array's): group per grid step and pad tc -> 8 rows per group.
    G_steps = C // tc
    meta = jnp.zeros((G_steps, 8, MW), _I32).at[:, :tc, :].set(
        meta_c.reshape(G_steps, tc, MW)).reshape(G_steps * 8, MW)
    nblk = (-(-bound // 128) + _ELR + 4 + 7) // 8 * 8
    O_CL, O_CC, O_NL, O_NC = 0, NSEG, 2 * NSEG, 3 * NSEG + 1

    def kernel(meta_ref, data_ref, tlit_ref, tcp_ref, out_ref):
        lane = _lane128()
        zrow = jnp.zeros((1, 128), _I32)

        def read_record(tab_ref, j, s, k):
            flat = (s * SEG_SLOTS + k) * 2
            row = jnp.clip(flat >> 7, 0, trows - 2)
            W = jnp.concatenate(
                [tab_ref[j, row, :].reshape(1, 128),
                 tab_ref[j, row + 1, :].reshape(1, 128)], axis=1)
            return pltpu.roll(W, (256 - (flat - (row << 7))) % 256, 1)

        def place(j, e, q, ln, erows):
            """Merge emission e ((erows,128) at phase 0) into the output
            at byte q, masked to ln bytes (read-modify-write, in order
            within a chunk)."""
            widx = (
                jax.lax.broadcasted_iota(_I32, (erows + 1, 128), 0) * 128
                + jax.lax.broadcasted_iota(_I32, (erows + 1, 128), 1)
            )
            row0 = jnp.clip(q >> 7, 0, nblk - erows - 2)
            r = q - ((q >> 7) << 7)
            rolled = pltpu.roll(e, r, 1)
            placed = jnp.where(
                lane >= r,
                jnp.concatenate([rolled, zrow], axis=0),
                jnp.concatenate([zrow, rolled], axis=0),
            )
            m = (widx >= r) & (widx < r + ln)
            cur = out_ref[j, pl.ds(row0, erows + 1), :]
            out_ref[j, pl.ds(row0, erows + 1), :] = jnp.where(m, placed, cur)

        cwidx = (
            jax.lax.broadcasted_iota(_I32, (_CR, 128), 0) * 128
            + jax.lax.broadcasted_iota(_I32, (_CR, 128), 1)
        )
        cmod3 = cwidx - (cwidx // 3) * 3
        mod3_1 = lane - (lane // 3) * 3

        def advance(j, s, k, off_cnt, off_nxt):
            """(s, k) -> next piece coordinates (O(1) via the nxt table)."""
            k = k + 1
            done = k >= meta_ref[j, off_cnt + jnp.clip(s, 0, NSEG - 1)]
            s2 = meta_ref[j, off_nxt + jnp.minimum(s + 1, NSEG)]
            s = jnp.where(done, s2, s)
            k = jnp.where(done, 0, k)
            return s, k

        def copy_sweep(st):
            """One copy piece for EVERY chain, stage-major (records ->
            extracts -> builds -> places -> advances): no predicated
            regions (pallas_exec measured rule) and consecutive
            instructions belong to independent chains so the scheduler
            hides each chain's roll/extract latency behind its
            neighbours' (the rule that took the walker 0.86 -> ~0.3
            us/step on silicon)."""
            Ws = [read_record(tcp_ref, j, jnp.clip(st[2 * j], 0, NSEG - 1),
                              st[2 * j + 1]) for j in range(tc)]
            heads = [(W[0, 0], W[0, 1]) for W in Ws]
            vs, qs, szs = [], [], []
            for j in range(tc):
                w0, w1 = heads[j]
                live = st[2 * j] < NSEG
                nel = (w0 >> 20) & 0x7FF
                d = w1 & 0x1FFFF
                tail = (w1 >> 17) & 0x7F
                tail_tag = 2 | ((tail - 1) << 2)
                v = jnp.where(
                    cmod3 == 0, 254,
                    jnp.where(cmod3 == 1, d & 255, d >> 8))
                vs.append(jnp.where(cwidx == 3 * (nel - 1), tail_tag, v))
                qs.append(w0 & 0xFFFFF)
                szs.append(jnp.where(live, 3 * nel, 0))
            for j in range(tc):
                place(j, vs[j], qs[j], szs[j], _CR)
            out = list(st)
            for j in range(tc):
                out[2 * j], out[2 * j + 1] = advance(
                    j, st[2 * j], st[2 * j + 1], O_CC, O_NC)
            return out

        def lit_sweep(st):
            """One literal piece for EVERY chain, stage-major."""
            Ws = [read_record(tlit_ref, j, jnp.clip(st[2 * j], 0, NSEG - 1),
                              st[2 * j + 1]) for j in range(tc)]
            heads = [(W[0, 0], W[0, 1]) for W in Ws]
            scal = []
            for j in range(tc):
                w0, w1 = heads[j]
                live = st[2 * j] < NSEG
                blen = (w0 >> 20) & 0x7FF
                scal.append(dict(
                    blen=blen, q=w0 & 0xFFFFF, ip=w1 & 0xFFFFF,
                    tl=(w1 >> 20) & 3,
                    sz=jnp.where(live, ((w1 >> 20) & 3) + blen, 0)))
            # payload windows at phase 0 (independent reads)
            dwins = []
            for j in range(tc):
                ip = scal[j]["ip"]
                blk = jnp.clip(ip >> 7, 0, drows - _ELR - 2)
                r = ip - (blk << 7)
                a = data_ref[j, pl.ds(blk, _ELR + 1), :]
                ar = pltpu.roll(a, jnp.where(r == 0, 0, 128 - r), 1)
                dwins.append(jnp.where(lane < 128 - r, ar[:-1], ar[1:]))
            ems = []
            for j in range(tc):
                tl = scal[j]["tl"]
                # shift right by the (dynamic) tag length
                rolled = pltpu.roll(dwins[j], tl, 1)
                em = jnp.where(
                    lane >= tl,
                    jnp.concatenate([rolled, zrow], axis=0),
                    jnp.concatenate([zrow, rolled], axis=0),
                )  # (_ELR+1, 128); bytes at [tl, tl+blen)
                n = scal[j]["blen"] - 1
                t0 = jnp.where(tl == 1, n << 2, jnp.where(tl == 2, 240, 244))
                t1 = jnp.where(tl == 2, n, n & 255)
                t2 = n >> 8
                tagrow = jnp.where(
                    lane == 0, t0, jnp.where(lane == 1, t1, t2))
                em0 = jnp.where(lane < tl, tagrow, em[0:1])
                ems.append(jnp.concatenate([em0, em[1:]], axis=0))
            for j in range(tc):
                place(j, ems[j], scal[j]["q"], scal[j]["sz"], _ELR + 1)
            out = list(st)
            for j in range(tc):
                out[2 * j], out[2 * j + 1] = advance(
                    j, st[2 * j], st[2 * j + 1], O_CL, O_NL)
            return out

        out_ref[:] = jnp.zeros_like(out_ref)

        def walk(off_nxt, sweep, P):
            def cond(st):
                r = st[0] < NSEG
                for j in range(1, tc):
                    r = r | (st[2 * j] < NSEG)
                return r

            def body(st):
                st = list(st)
                for _p in range(P):
                    st = sweep(st)
                return tuple(st)

            init = []
            for j in range(tc):
                init.extend([meta_ref[j, off_nxt + 0], jnp.int32(0)])
            jax.lax.while_loop(cond, body, tuple(init))

        walk(O_NC, copy_sweep, 4)
        walk(O_NL, lit_sweep, 2)

    out = pl.pallas_call(
        kernel,
        grid=(C // tc,),
        in_specs=[
            pl.BlockSpec((8, MW), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tc, drows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, trows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, trows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, nblk, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nblk, 128), _I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=_interpret(),
    )(meta, data_blocks, tl_blocks, tcp_blocks)
    out = out.reshape(C, nblk * 128)[:C0, :bound].astype(jnp.uint8)
    return out.at[:, : len(pre)].set(jnp.asarray(pre)[None, :])


# ---------------------------------------------------------------------------
# Decode: general element-run walker for the device LZ profile
# ---------------------------------------------------------------------------
#
# Decodes any stream this framework's device encoders emit — the LZ profile
# (arbitrary-offset copy-2 runs, literal tags 1-3 bytes) AND the legacy RLE
# profile (its copy2(offset=G) runs and 4 KB literals are just instances) —
# plus raw chunks as a zero-tag literal state. Foreign streams using
# copy-1/copy-4 elements, 4-byte literal lengths, or offsets < 8 flag
# not-ok and route to the host/op-table path, same contract as the
# structured decoder (snappy/device.py).
#
# Per chunk the walk is serial (tag chaining), so _DTC chunk chains run
# stage-major per while-loop iteration. One iteration advances each chain
# by ONE unit: a literal-head parse, a <=1024-byte literal/raw window copy,
# or a batch of <=_KMAX identical copy-2 elements (one window compare finds
# the run extent; the d-periodic fill doubles from the fixed source window
# [outp-d, ...) since the written prefix is d-periodic).

_DTC = 8    # chunk chains per grid step
_WR = 9     # stream/out window rows per unit (1152 bytes visible)
_KMAX = 16  # copy-2 elements consumed per step (<= 1024 out bytes)


@functools.partial(
    jax.jit, static_argnames=("S", "out_words", "stride_span", "skip_raw"))
def decode_lz_streams_from_frame(
    frame: jnp.ndarray,          # (F,) uint8 — whole frame bytes
    chunk_offsets: jnp.ndarray,  # (C,) int32 absolute stream starts
    comp_len: jnp.ndarray,       # (C,) int32
    is_comp: jnp.ndarray,        # (C,) bool — snappy chunk vs raw chunk
    S: int,
    out_words: bool = False,
    stride_span: int | None = None,
    skip_raw: bool = False,
):
    """Decode C chunk streams out of the frame buffer.

    Returns ((C, S) uint8, (C,) bool ok) — or (C, S//4) uint32 LE words
    with ``out_words`` (packed from int32 byte lanes, ~free).

    ``skip_raw``: raw chunks' chains start dead (ok, no output) — the
    caller routes them through the structured kernel's strided-copy path
    instead (the walker's 1 KB literal steps are ~10x slower than that
    for bulk raw data) and merges per chunk."""
    pre = _varint(S)
    P = len(pre)
    C0 = chunk_offsets.shape[0]
    if C0 % _DTC:
        padc = _DTC - C0 % _DTC
        chunk_offsets = jnp.concatenate(
            [chunk_offsets, jnp.broadcast_to(chunk_offsets[-1], (padc,))])
        comp_len = jnp.pad(comp_len, (0, padc))
        is_comp = jnp.pad(is_comp, (0, padc))
    C = chunk_offsets.shape[0]

    bound = lz_bound(S)
    span = max(bound, stride_span or 0, S)
    tcb = ((_DTC * span) // 128 + 8 + _WR + 4 + 7) // 8 * 8
    fblk = (-(-frame.shape[0] // 128) + tcb + 7) // 8 * 8
    frame_blocks = (
        jnp.pad(frame, (0, fblk * 128 - frame.shape[0]))
        .astype(_I32).reshape(fblk, 128)
    )
    nout = -(-S // 128)
    nblk = (nout + _WR + 4 + 7) // 8 * 8
    MAXSTEP = S + 16

    def kernel(meta_ref, frame_ref, out_ref, ok_ref, scratch, sem):
        base_blk = pl.multiple_of((meta_ref[0, 0] // 1024) * 8, 8)
        dma = pltpu.make_async_copy(
            frame_ref.at[pl.ds(base_blk, tcb), :], scratch, sem
        )
        dma.start()
        dma.wait()

        lane = _lane128()
        zrow = jnp.zeros((1, 128), _I32)
        widx1 = lane
        mod3 = lane - (lane // 3) * 3

        def window(ref2d, cur, rows):
            blk = jnp.clip(cur >> 7, 0, tcb - rows - 2)
            r = cur - (blk << 7)
            a = ref2d[pl.ds(blk, rows + 1), :]
            ar = pltpu.roll(a, jnp.where(r == 0, 0, 128 - r), 1)
            return jnp.where(lane < 128 - r, ar[:-1], ar[1:])

        def out_window(j, q, rows):
            blk = jnp.clip(q >> 7, 0, nblk - rows - 2)
            r = q - (blk << 7)
            a = out_ref[j, pl.ds(blk, rows + 1), :]
            ar = pltpu.roll(a, jnp.where(r == 0, 0, 128 - r), 1)
            return jnp.where(lane < 128 - r, ar[:-1], ar[1:])

        def place_out(j, e, q, ln, erows):
            widx = (
                jax.lax.broadcasted_iota(_I32, (erows + 1, 128), 0) * 128
                + jax.lax.broadcasted_iota(_I32, (erows + 1, 128), 1)
            )
            row0 = jnp.clip(q >> 7, 0, nblk - erows - 2)
            r = q - ((q >> 7) << 7)
            rolled = pltpu.roll(e, r, 1)
            placed = jnp.where(
                lane >= r,
                jnp.concatenate([rolled, zrow], axis=0),
                jnp.concatenate([zrow, rolled], axis=0),
            )
            m = (widx >= r) & (widx < r + ln)
            cur = out_ref[j, pl.ds(row0, erows + 1), :]
            out_ref[j, pl.ds(row0, erows + 1), :] = jnp.where(m, placed, cur)

        # absolute-in-scratch stream end per chain: caps element batching
        # so a run's pattern can never be over-consumed into the adjacent
        # chunk's bytes (they share the DMA scratch).
        ends = []
        for j in range(_DTC):
            off_j = meta_ref[j, 0] - base_blk * 128
            ends.append(off_j + jnp.where(
                meta_ref[j, 2] != 0, meta_ref[j, 1], S))

        def unit_sweep(states):
            """One unit of work for EVERY chunk chain, STAGE-MAJOR.

            A unit is (a) a <=1024-byte literal/raw window copy — merged
            with the literal-head tag parse so a typical <=1021-byte
            literal costs ONE step, (b) a batch of <=_KMAX identical
            copy-2 elements with a three-way specialized fill, or (c) a
            rejection. The expensive generic doubling fill only runs for
            overlapped copies whose period does not divide 128.

            Stage-major: each stage runs for all _DTC chains before the
            next (head windows -> parses -> source windows -> fills ->
            places -> advances). Chains are fully independent, so
            consecutive instructions belong to different chains and
            Mosaic's scheduler can hide each chain's serial roll/
            vector->scalar latency behind its neighbours' — the measured
            rule that took pallas_exec.py to its ~88 ns/piece floor.
            Chain-major (the r5 first cut) measured 0.86 us/step on
            silicon; the per-step critical path (2 window-read roll
            chains, 3 scalar extracts, a reduce-min, 4 fill rolls, a
            place roll + 9-row RMW) is latency, not vector work."""
            # --- stage A: element head windows (2 rows: tags <= 3 B) --
            whs = [window(scratch, st[0], 1) for st in states]

            # --- stage B: head byte extracts (vector->scalar), grouped
            heads = [(wh[0, 0], wh[0, 1], wh[0, 2]) for wh in whs]

            # --- stage C: scalar parse + copy-run extent per chain ----
            scals = []
            for j, st in enumerate(states):
                cursor, outp, lit_rem, bad = st
                tag, b1, b2 = heads[j]
                live = outp < S
                is_cont = live & (lit_rem > 0)
                head = live & (~is_cont)
                kind = tag & 3
                t6 = (tag >> 2) & 63
                is_lit = head & (kind == 0)
                tl = jnp.where(t6 < 60, 1, jnp.where(t6 == 60, 2, 3))
                llen = jnp.where(
                    t6 < 60, t6 + 1,
                    jnp.where(t6 == 60, b1 + 1, (b1 | (b2 << 8)) + 1))
                is_cp = head & (kind == 2)
                d = b1 | (b2 << 8)
                clen = t6 + 1

                badd = jnp.where(is_lit & (t6 > 61), 1, 0)
                badd += jnp.where(head & ((kind == 1) | (kind == 3)), 1, 0)
                badd += jnp.where(is_cp & ((d < 8) | (d > outp)), 1, 0)
                ok_lit = is_lit & (badd == 0)

                # literal bytes: continuation or first window of a head
                n_lit = jnp.where(
                    is_cont, jnp.minimum(lit_rem, 1024),
                    jnp.where(ok_lit, jnp.minimum(llen, 1024), 0))
                src_off = cursor + jnp.where(is_cont, 0, tl)

                # copy run extent: one pattern row suffices (_KMAX*3+3
                # bytes < 128); batching capped at the chunk's stream end
                # so a run can't eat the neighbour's bytes in scratch
                pat = jnp.where(mod3 == 0, tag,
                                jnp.where(mod3 == 1, b1, b2))
                mism = jnp.where(whs[j][0:1] != pat, widx1, 128)
                first = jnp.min(mism)
                k = jnp.clip(first // 3, 1, _KMAX)
                k = jnp.minimum(k, jnp.maximum((ends[j] - cursor) // 3, 1))
                # overlapped copies whose period does NOT divide 128
                # would need a doubling-fill loop; cap the batch at d
                # bytes instead so the fill is always a plain bulk copy —
                # the run just takes more (predication-free) steps.
                # d | 128 keeps full batching via the periodic-row build.
                d_div = (d <= 128) & ((128 % jnp.maximum(d, 1)) == 0)
                k_bulk = jnp.maximum(d >> 6, 1)  # floor(d/64) elements
                k = jnp.where(d_div, k, jnp.minimum(k, k_bulk))
                k = jnp.where(clen == 64, k, 1)
                L_out = k * clen
                ok_cp = is_cp & (badd == 0)
                ln = n_lit + jnp.where(ok_cp, L_out, 0)
                scals.append(dict(
                    is_cont=is_cont, head=head, ok_lit=ok_lit,
                    ok_cp=ok_cp, badd=badd, tl=tl, llen=llen,
                    n_lit=n_lit, src_off=src_off, d=d, k=k,
                    L_out=L_out, ln=ln))

            # --- stage D: stream + out source windows -----------------
            wsrcs = [window(scratch, sc["src_off"], 8) for sc in scals]
            fsrcs = [
                out_window(j, states[j][1] - sc["d"], 8)
                for j, sc in enumerate(scals)
            ]

            # --- stage E: unified fill + place (RMW per chain) --------
            es = []
            for j, sc in enumerate(scals):
                d = sc["d"]
                # d | 128 and overlapped: every output row is the same
                # periodic pattern; double the trailing d bytes to 128
                row = fsrcs[j][0:1]
                dd = jnp.minimum(d, 128)  # roll amounts stay in [0, 128]
                for _r in range(4):  # 8 -> 128 in <= 4 doublings
                    row = jnp.where(lane < dd, row, pltpu.roll(row, dd, 1))
                    dd = jnp.minimum(dd * 2, 128)
                per_rows = jnp.broadcast_to(row, (8, 128))
                use_per = (d < sc["L_out"]) & (d <= 128)
                e_fill = jnp.where(use_per, per_rows, fsrcs[j])
                es.append(jnp.where(sc["ok_cp"], e_fill, wsrcs[j]))
            for j, sc in enumerate(scals):
                place_out(j, es[j], states[j][1], sc["ln"], 8)

            # --- stage F: advance -------------------------------------
            out = []
            for j, sc in enumerate(scals):
                cursor, outp, lit_rem, bad = states[j]
                n_lit = sc["n_lit"]
                cursor = cursor + jnp.where(
                    sc["is_cont"], n_lit,
                    jnp.where(sc["ok_lit"], sc["tl"] + n_lit,
                              jnp.where(sc["ok_cp"], 3 * sc["k"], 0)))
                outp = outp + n_lit + jnp.where(sc["ok_cp"], sc["L_out"], 0)
                lit_rem = jnp.where(
                    sc["is_cont"], lit_rem - n_lit,
                    jnp.where(sc["ok_lit"], sc["llen"] - n_lit, 0))
                dead = sc["head"] & (sc["badd"] > 0)
                outp = jnp.where(dead, S, outp)
                lit_rem = jnp.where(dead, 0, lit_rem)
                bad = bad + jnp.where(sc["badd"] > 0, 1, 0)
                out.append((cursor, outp, lit_rem, bad))
            return out

        # init per chain
        carry = []
        for j in range(_DTC):
            off = meta_ref[j, 0] - base_blk * 128
            clen_j = meta_ref[j, 1]
            comp_j = meta_ref[j, 2] != 0
            w = window(scratch, off, 1)
            pbad = jnp.int32(0)
            for i, pb in enumerate(pre):
                pbad += jnp.where(comp_j & (w[0, i] != int(pb)), 1, 0)
            cursor = off + jnp.where(comp_j, P, 0)
            lit_rem = jnp.where(comp_j, 0, S)
            outp0 = jnp.int32(0)
            if skip_raw:
                # raw chains: dead immediately, counted ok by the final
                # checks (cursor advanced to the full raw extent)
                outp0 = jnp.where(comp_j, 0, S)
                lit_rem = jnp.int32(0)
                cursor = jnp.where(comp_j, cursor, off + S)
            carry.extend([cursor, outp0, lit_rem, pbad])

        def cond(c):
            live = c[1] < S
            for j in range(1, _DTC):
                live = live | (c[4 * j + 1] < S)
            return live & (c[4 * _DTC] < MAXSTEP)

        def body(c):
            # two units per chain per iteration: the while-loop boundary
            # costs ~600 ns (pallas_exec measured fact); unrolling halves
            # the boundary tax on piece-dense streams. Each unit is one
            # stage-major sweep over all chains; unit 2 depends on unit 1
            # per chain (sequential sweeps), chains never on each other.
            states = [tuple(c[4 * j: 4 * j + 4]) for j in range(_DTC)]
            states = unit_sweep(states)
            states = unit_sweep(states)
            out = []
            for st in states:
                out.extend(st)
            return tuple(out) + (c[4 * _DTC] + 1,)

        final = jax.lax.while_loop(
            cond, body, tuple(carry) + (jnp.int32(0),))

        for j in range(_DTC):
            off = meta_ref[j, 0] - base_blk * 128
            clen_j = meta_ref[j, 1]
            comp_j = meta_ref[j, 2] != 0
            cursor, outp, lit_rem, bad = (
                final[4 * j], final[4 * j + 1], final[4 * j + 2],
                final[4 * j + 3])
            bad = bad + jnp.where(outp != S, 1, 0)
            bad = bad + jnp.where(lit_rem != 0, 1, 0)
            end_ok = cursor - off == jnp.where(comp_j, clen_j, S)
            bad = bad + jnp.where(end_ok, 0, 1)
            ok_ref[j, :] = jnp.broadcast_to(
                jnp.where(bad == 0, 0, 1), (128,))

    meta = jnp.stack(
        [chunk_offsets.astype(_I32), comp_len.astype(_I32),
         is_comp.astype(_I32)], axis=1)
    out, badv = pl.pallas_call(
        kernel,
        grid=(C // _DTC,),
        in_specs=[
            pl.BlockSpec((_DTC, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((_DTC, nblk, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DTC, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, nblk, 128), _I32),
            jax.ShapeDtypeStruct((C, 128), _I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tcb, 128), _I32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(meta, frame_blocks)
    ok = jnp.sum(badv[:C0], axis=1) == 0
    if out_words:
        assert S % 4 == 0
        y = out[:, :nout, :].reshape(C, nout * 32, 4).astype(jnp.uint32)
        words = (y[..., 0] | (y[..., 1] << 8) | (y[..., 2] << 16)
                 | (y[..., 3] << 24))
        return words[:C0, : S // 4], ok
    out = out[:, :nout, :].reshape(C, nout * 128)[:C0, :S].astype(jnp.uint8)
    return out, ok


@functools.partial(jax.jit, static_argnames=("S",))
def decode_lz_streams(
    comp: jnp.ndarray,      # (C, B) uint8 streams
    comp_len: jnp.ndarray,  # (C,) int32
    S: int,
):
    """((C, B) streams, lens) -> ((C, S) uint8, (C,) ok)."""
    C, B = comp.shape
    flat = comp.reshape(-1)
    offsets = jnp.arange(C, dtype=_I32) * B
    return decode_lz_streams_from_frame(
        flat, offsets, comp_len.astype(_I32),
        jnp.ones((C,), jnp.bool_), S, stride_span=B,
    )
