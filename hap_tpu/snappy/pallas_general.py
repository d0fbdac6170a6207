"""General Snappy decode on TPU: accepts ANY conforming stream.

The structured-profile kernels (pallas_kernels.py) cover every stream this
framework emits; this kernel closes the remaining interop gap — frames
produced by foreign encoders (the reference ecosystem's five encoder
applications, or google/snappy on arbitrary content, hap.c:453) decode
on-device too, instead of routing to the host codec.

Byte-serial LZ parsing on a vector machine: the element walk is a
``lax.while_loop`` per chunk; every byte-granular access is the proven
window pattern (dynamic middle-dim block indexing + int32-lane
``pltpu.roll``); back-reference copies resolve overlap (offset < length)
by shift-doubling — six static rounds extend the period to >= 64 lanes —
so a copy element costs O(1) vector ops regardless of offset or length.
Malformed streams flag per-chunk ok=False with every access clamped
in-bounds (a Pallas fault kills the TPU worker for ~10 min; CLAUDE.md §4).

Format (Snappy format description, normative ref [2] of the Hap spec,
HapVideoDRAFT.md:146): stream = varint(uncompressed length) + elements.
element = literal (tag 0b00; 1-5 byte header, length up to 2^32) |
copy1 (0b01; 11-bit offset, len 4-11) | copy2 (0b10; 16-bit LE offset,
len 1-64) | copy4 (0b11; 32-bit LE offset, len 1-64). Copy offsets must be
>= 1 and <= bytes already produced; overlapping copies replicate earlier
output with period = offset (the RLE idiom).
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


def _read_window(ref, c, cursor, nblk):
    """(1, 512) int32 window with stream byte ``cursor`` of chunk c at lane 0.

    Reads three adjacent 128-lane blocks (clamped in-bounds) and rotates the
    target byte to lane 0; lanes [0, 384-cursor%128) are valid stream bytes.
    """
    blk = jnp.clip(cursor // 128, 0, nblk - 3)
    r = jnp.clip(cursor - blk * 128, 0, 127)
    win = jnp.concatenate(
        [
            ref[c, blk, :].reshape(1, 128),
            ref[c, blk + 1, :].reshape(1, 128),
            ref[c, blk + 2, :].reshape(1, 128),
            jnp.zeros((1, 128), _I32),
        ],
        axis=1,
    )
    shift = jnp.where(r == 0, 0, 512 - r)
    return pltpu.roll(win, shift, 1)


def _merge_store(out_ref, c, dst, vec512, m, nout, pre=0):
    """Write lanes [pre, pre+m) of vec512 to output bytes [dst, dst+m).

    m <= 128; ``pre`` (0..127) skips leading lanes of the source — this
    folds a separate pre-alignment roll (e.g. a literal's header skip) into
    the placement roll, one dynamic roll instead of two. m == 0 writes
    nothing (the merge mask is empty) but must still be safe for arbitrary
    dst, hence the clamps.
    """
    dstc = jnp.clip(dst, 0, nout * 128 - 256)
    blk = dstc // 128
    r = dstc - blk * 128
    s = r - pre
    s = jnp.where(s < 0, s + 512, s)
    placed = pltpu.roll(vec512, s, 1)[:, :256]
    lane = jax.lax.broadcasted_iota(_I32, (1, 256), 1)
    mask = (lane >= r) & (lane < r + m)
    cur = jnp.concatenate(
        [out_ref[c, blk, :].reshape(1, 128), out_ref[c, blk + 1, :].reshape(1, 128)],
        axis=1,
    )
    merged = jnp.where(mask, placed, cur)
    out_ref[c, blk, :] = merged[0, :128]
    out_ref[c, blk + 1, :] = merged[0, 128:]


def _pick_tc(nin: int, nout: int) -> int:
    """Chunks per grid step bounded by a ~10 MB VMEM budget (int32 lanes).

    More chains per step = more independent work to hide each chain's serial
    element-walk latency behind; 16 is the unroll cap (the interleaved body
    is python-unrolled tc times)."""
    for tc in (16, 8, 4, 2, 1):
        if tc * (nin + nout) * 128 * 4 <= 10 * 2**20:
            return tc
    return 1


def _decode_varint_preamble(comp_ref, c, clen, ulen, S_max, nin):
    """Parse the varint(uncompressed length) preamble of chunk c.

    Returns (hdr bytes consumed, ok).
    """
    win0 = _read_window(comp_ref, c, jnp.int32(0), nin)
    b = [win0[0, i] for i in range(5)]
    val = b[0] & 127
    hdr = jnp.int32(1)
    inc = b[0] >= 128  # next byte belongs to the varint
    ok0 = jnp.bool_(True)
    for i in range(1, 5):
        # Final byte may only carry bits < 2^31 (int32 arithmetic; larger
        # lengths can never match ulen <= S_max anyway).
        if i == 4:
            ok0 = ok0 & (~inc | (b[4] < 8))
        val = val + jnp.where(inc, (b[i] & 127) << (7 * i), 0)
        hdr = hdr + inc.astype(_I32)
        inc = inc & (b[i] >= 128)
    ok0 = ok0 & ~inc  # must terminate within 5 bytes
    ok0 = ok0 & (val == ulen) & (hdr <= clen) & (ulen <= S_max)
    return hdr, ok0


def _default_impl() -> str:
    import os

    return os.environ.get("HAP_TPU_SNAPPY_GENERAL_IMPL", "hybrid")


def _parse_element(win, cursor, op, clen, ulen):
    """Decode the Snappy element at lane 0 of ``win`` (shared by all kernel
    variants — one body for tag decode + bounds validation so a format fix
    cannot silently diverge between them).

    Returns a dict of the parsed fields: is_lit, lit_hdr, lit_len, cp_len,
    cp_off, cp_hdr, elen, ehdr, in_need, fresh_ok.
    """
    tag = win[0, 0]
    b1, b2, b3, b4 = win[0, 1], win[0, 2], win[0, 3], win[0, 4]
    ttype = tag & 3
    len6 = tag >> 2
    is_lit = ttype == 0

    lit_hdr = jnp.where(len6 < 60, 1, len6 - 58)
    ext = (
        b1
        + jnp.where(len6 >= 61, b2 << 8, 0)
        + jnp.where(len6 >= 62, b3 << 16, 0)
        + jnp.where(len6 >= 63, b4 << 24, 0)
    )  # may wrap negative for absurd lengths -> rejected below
    lit_len = jnp.where(len6 < 60, len6 + 1, ext + 1)

    cp_len = jnp.where(ttype == 1, 4 + (len6 & 7), (len6 & 63) + 1)
    cp_off = jnp.where(
        ttype == 1,
        ((tag >> 5) << 8) | b1,
        jnp.where(
            ttype == 2,
            b1 | (b2 << 8),
            b1 | (b2 << 8) | (b3 << 16) | (b4 << 24),
        ),
    )
    cp_hdr = jnp.where(ttype == 1, 2, jnp.where(ttype == 2, 3, 5))

    elen = jnp.where(is_lit, lit_len, cp_len)
    ehdr = jnp.where(is_lit, lit_hdr, cp_hdr)
    in_need = ehdr + jnp.where(is_lit, lit_len, 0)
    fresh_ok = (
        (elen >= 1)
        & (in_need >= 1)
        & (cursor + in_need <= clen)
        & (op + elen <= ulen)
        & (is_lit | ((cp_off >= 1) & (cp_off <= op)))
    )
    return dict(
        is_lit=is_lit, lit_hdr=lit_hdr, lit_len=lit_len, cp_len=cp_len,
        cp_off=cp_off, cp_hdr=cp_hdr, elen=elen, ehdr=ehdr,
        in_need=in_need, fresh_ok=fresh_ok,
    )


def decode_any_streams(
    comp: jnp.ndarray,
    comp_len: jnp.ndarray,
    out_len: jnp.ndarray,
    S_max: int,
    impl: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve the kernel variant, then dispatch to the jitted inner fn.

    The env default (HAP_TPU_SNAPPY_GENERAL_IMPL, values: "hybrid" |
    "interleaved" | "branch" | "serial") is resolved HERE, outside jit, so
    the impl string is always part of the jit cache key — changing the env
    var mid-process takes effect for every later call instead of being
    silently baked into already-traced shapes.
    """
    if impl is None:
        impl = _default_impl()
    return _decode_any_streams(comp, comp_len, out_len, S_max, impl)


@functools.partial(jax.jit, static_argnames=("S_max", "impl"))
def _decode_any_streams(
    comp: jnp.ndarray,  # (C, B) uint8 — one Snappy stream per row
    comp_len: jnp.ndarray,  # (C,) int32 — true stream lengths
    out_len: jnp.ndarray,  # (C,) int32 — expected uncompressed lengths
    S_max: int,  # static bound: every out_len <= S_max
    impl: str = "hybrid",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode C arbitrary conforming Snappy streams -> ((C, S_max) u8, ok).

    ok[c] is False for any malformed stream (bad varint, offset 0 or beyond
    written output, element overrunning input or output, trailing garbage,
    or preamble != out_len[c]); its output row is then undefined but every
    access stays in-bounds.

    "interleaved" walks all chunks of a grid step as independent
    interleaved chains inside ONE while_loop — each chain's element walk is
    a serial dependency, so issuing tc chains per iteration hides the chain
    latency behind vector work (same idiom as the structured kernel's _UJ
    chains). A literal element is consumed 128 bytes per iteration via a
    continuation state instead of an inner loop, which keeps the chains in
    lockstep-shaped control flow. "hybrid" (default, fastest measured:
    1.6-1.8x on real HapEncode 4K streams) keeps that straight-line body
    but predicates the period-doubling rounds on an actually-overlapping
    copy; "branch" additionally puts literal/copy work in per-chain
    branches (skips the most work but loses cross-chain instruction
    overlap); "serial" is the one-chunk-at-a-time walk kept for A/B timing.

    Load balance: interleaved chains run in lockstep, so a grid step costs
    its LONGEST chain. Rows are sorted by descending comp_len (element count
    is ~proportional) so each tc-row grid step gets similar-length chains —
    sum-of-group-maxima is minimized by contiguous groups in sorted order.
    Outputs are unsorted back before returning.
    """
    C0, B = comp.shape
    nin = -(-B // 128) + 3
    nout = -(-S_max // 128) + 2
    tc = _pick_tc(nin, nout)
    if C0 % tc:
        padc = tc - C0 % tc
        comp = jnp.pad(comp, ((0, padc), (0, 0)))
        comp_len = jnp.pad(comp_len, (0, padc))
        out_len = jnp.pad(out_len, (0, padc))
    C = comp.shape[0]
    perm = jnp.argsort(-comp_len)
    inv = jnp.argsort(perm)
    comp = jnp.take(comp, perm, axis=0)
    comp_len = jnp.take(comp_len, perm)
    out_len = jnp.take(out_len, perm)
    comp_blocks = (
        jnp.pad(comp, ((0, 0), (0, nin * 128 - B))).astype(_I32).reshape(C, nin, 128)
    )
    meta = jnp.stack([comp_len.astype(_I32), out_len.astype(_I32)], axis=1)

    def kernel_interleaved(meta_ref, comp_ref, out_ref, ok_ref):
        clens = [meta_ref[j, 0] for j in range(tc)]
        ulens = [meta_ref[j, 1] for j in range(tc)]
        lane256 = jax.lax.broadcasted_iota(_I32, (1, 256), 1)

        cursors, oks = [], []
        for j in range(tc):
            hdr, ok0 = _decode_varint_preamble(
                comp_ref, j, clens[j], ulens[j], S_max, nin)
            cursors.append(hdr)
            oks.append(ok0)
        ops = [jnp.int32(0)] * tc
        lit_rems = [jnp.int32(0)] * tc

        def actives(carry):
            return [
                carry[4 * j + 3]
                & ((carry[4 * j] < clens[j]) | (carry[4 * j + 2] > 0))
                for j in range(tc)
            ]

        def cond(carry):
            a = actives(carry)
            r = a[0]
            for x in a[1:]:
                r = r | x
            return r

        def chain_step(j, cursor, op, lit_rem, okc, active):
            win = _read_window(comp_ref, j, cursor, nin)
            fresh = lit_rem == 0
            e = _parse_element(win, cursor, op, clens[j], ulens[j])
            is_lit, lit_hdr, cp_len, cp_off, cp_hdr = (
                e["is_lit"], e["lit_hdr"], e["cp_len"], e["cp_off"], e["cp_hdr"])
            lit_len, fresh_ok = e["lit_len"], e["fresh_ok"]
            # Inactive chains still execute (masked); their ok must freeze,
            # or the garbage tag at cursor==clen would clobber it.
            oke = okc & jnp.where(fresh & active, fresh_ok, True)
            go = oke & active

            # Effective element this iteration: a fresh copy, or <=128 bytes
            # of a (fresh or continuing) literal.
            eff_lit = jnp.where(fresh, is_lit, True)
            hdr_eff = jnp.where(fresh, jnp.where(is_lit, lit_hdr, cp_hdr), 0)
            lit_total = jnp.where(fresh, lit_len, lit_rem)
            m_lit = jnp.minimum(128, lit_total)

            # Literal source: the comp window shifted left past the header.
            litwin = pltpu.roll(win, 512 - hdr_eff, 1)[:, :256]

            # Copy source: output back-reference, period-doubled to >= 64.
            src = jnp.maximum(op - cp_off, 0)
            wsrc = _read_window(out_ref, j, src, nout)
            v = wsrc[:, :256]
            valid = jnp.clip(cp_off, 1, 64)
            for _ in range(6):
                v = jnp.where(lane256 >= valid, pltpu.roll(v, valid, 1), v)
                valid = jnp.minimum(valid * 2, 128)

            vsel = jnp.where(eff_lit, litwin, v)
            v512 = jnp.concatenate([vsel, jnp.zeros((1, 256), _I32)], axis=1)
            m = jnp.where(go, jnp.where(eff_lit, m_lit, cp_len), 0)
            _merge_store(out_ref, j, op, v512, m, nout)

            adv_in = jnp.where(eff_lit, hdr_eff + m_lit, cp_hdr)
            adv_out = jnp.where(eff_lit, m_lit, cp_len)
            cursor = jnp.where(go, cursor + adv_in, cursor)
            op = jnp.where(go, op + adv_out, op)
            lit_rem = jnp.where(
                go, jnp.where(eff_lit, lit_total - m_lit, 0), lit_rem)
            return cursor, op, lit_rem, oke

        def body(carry):
            act = actives(carry)
            out = []
            for j in range(tc):
                out.extend(chain_step(
                    j, carry[4 * j], carry[4 * j + 1],
                    carry[4 * j + 2], carry[4 * j + 3], act[j],
                ))
            return tuple(out)

        carry = tuple(
            x for j in range(tc) for x in (cursors[j], ops[j], lit_rems[j], oks[j])
        )
        carry = jax.lax.while_loop(cond, body, carry)
        for j in range(tc):
            cursor, op, lit_rem, okc = (
                carry[4 * j], carry[4 * j + 1], carry[4 * j + 2], carry[4 * j + 3]
            )
            okc = okc & (cursor == clens[j]) & (op == ulens[j]) & (lit_rem == 0)
            ok_ref[j, 0] = okc.astype(_I32)

    def kernel_branch(meta_ref, comp_ref, out_ref, ok_ref, vtmp_ref):
        """Interleaved chains with PREDICATED vector work (pl.when).

        The interleaved kernel pays every element's worst case: copy-source
        window read + 6 period-doubling rounds + both source formations run
        unconditionally and cost ~700 ns/element on v5e. Real streams are
        dominated by elements that need almost none of it (measured on real
        HapEncode 4K output, tools/probe_element_stats.py: graphics 10.5%
        of copies overlap, noise 0.1%, natural 99% but with structured
        offsets where one or two doubling rounds suffice). Chains execute
        sequentially on the scalar core either way — the kernel is
        throughput-bound, not latency-bound — so skipping work in branches
        scales wall clock directly:

          literal          -> window roll + store only
          copy, off >= 64  -> source window read + store (no rounds)
          copy, overlap    -> + exactly ceil(log2(64 / off)) gated rounds

        ``vtmp_ref`` is (tc, 128) scratch holding the copy-source vector
        across the gated rounds (pl.when bodies mutate refs, not values).
        """
        clens = [meta_ref[j, 0] for j in range(tc)]
        ulens = [meta_ref[j, 1] for j in range(tc)]
        lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)

        cursors, oks = [], []
        for j in range(tc):
            hdr, ok0 = _decode_varint_preamble(
                comp_ref, j, clens[j], ulens[j], S_max, nin)
            cursors.append(hdr)
            oks.append(ok0)
        ops = [jnp.int32(0)] * tc
        lit_rems = [jnp.int32(0)] * tc

        def actives(carry):
            return [
                carry[4 * j + 3]
                & ((carry[4 * j] < clens[j]) | (carry[4 * j + 2] > 0))
                for j in range(tc)
            ]

        def cond(carry):
            a = actives(carry)
            r = a[0]
            for x in a[1:]:
                r = r | x
            return r

        def chain_step(j, cursor, op, lit_rem, okc, active):
            win = _read_window(comp_ref, j, cursor, nin)
            fresh = lit_rem == 0
            e = _parse_element(win, cursor, op, clens[j], ulens[j])
            is_lit, lit_hdr, cp_len, cp_off, cp_hdr = (
                e["is_lit"], e["lit_hdr"], e["cp_len"], e["cp_off"], e["cp_hdr"])
            lit_len, fresh_ok = e["lit_len"], e["fresh_ok"]
            oke = okc & jnp.where(fresh & active, fresh_ok, True)
            go = oke & active

            eff_lit = jnp.where(fresh, is_lit, True)
            hdr_eff = jnp.where(fresh, jnp.where(is_lit, lit_hdr, cp_hdr), 0)
            lit_total = jnp.where(fresh, lit_len, lit_rem)
            m_lit = jnp.minimum(128, lit_total)
            m = jnp.where(go, jnp.where(eff_lit, m_lit, cp_len), 0)

            go_lit = go & eff_lit
            go_cp = go & ~eff_lit

            @pl.when(go_lit)
            def _():
                litwin = pltpu.roll(win, 512 - hdr_eff, 1)
                _merge_store(out_ref, j, op, litwin, m, nout)

            @pl.when(go_cp)
            def _():
                src = jnp.maximum(op - cp_off, 0)
                wsrc = _read_window(out_ref, j, src, nout)
                vtmp_ref[j, :] = wsrc[0, :128]
                p0 = jnp.minimum(cp_off, 64)  # clamp before <<: no i32 wrap
                for k in range(6):
                    shift = p0 << k  # round k extends period to 2^k*off
                    @pl.when(shift < 64)
                    def _():
                        v = vtmp_ref[j, :].reshape(1, 128)
                        vv = jnp.where(
                            lane128 >= shift, pltpu.roll(v, shift, 1), v)
                        vtmp_ref[j, :] = vv[0]
                v512 = jnp.concatenate(
                    [vtmp_ref[j, :].reshape(1, 128),
                     jnp.zeros((1, 384), _I32)], axis=1)
                _merge_store(out_ref, j, op, v512, m, nout)

            adv_in = jnp.where(eff_lit, hdr_eff + m_lit, cp_hdr)
            adv_out = jnp.where(eff_lit, m_lit, cp_len)
            cursor = jnp.where(go, cursor + adv_in, cursor)
            op = jnp.where(go, op + adv_out, op)
            lit_rem = jnp.where(
                go, jnp.where(eff_lit, lit_total - m_lit, 0), lit_rem)
            return cursor, op, lit_rem, oke

        def body(carry):
            act = actives(carry)
            out = []
            for j in range(tc):
                out.extend(chain_step(
                    j, carry[4 * j], carry[4 * j + 1],
                    carry[4 * j + 2], carry[4 * j + 3], act[j],
                ))
            return tuple(out)

        carry = tuple(
            x for j in range(tc) for x in (cursors[j], ops[j], lit_rems[j], oks[j])
        )
        carry = jax.lax.while_loop(cond, body, carry)
        for j in range(tc):
            cursor, op, lit_rem, okc = (
                carry[4 * j], carry[4 * j + 1], carry[4 * j + 2], carry[4 * j + 3]
            )
            okc = okc & (cursor == clens[j]) & (op == ulens[j]) & (lit_rem == 0)
            ok_ref[j, 0] = okc.astype(_I32)

    def kernel_hybrid(meta_ref, comp_ref, out_ref, ok_ref, vtmp_ref):
        """Straight-line interleaved chains; ONLY the doubling is predicated.

        kernel_branch puts literal/copy work in per-chain branches, which
        stops Mosaic from overlapping the 8 chains' loads and rolls
        (control-flow regions are scheduling barriers) — it wins on skipped
        work but loses cross-chain ILP. This variant keeps the straight-line
        body of kernel_interleaved (window reads, source formation, merge
        store all unconditional, freely interleavable across chains) and
        predicates exactly one thing: the 6 period-doubling rounds, gated
        per chain on an actually-overlapping copy (off < min(len, 64)) and
        executed round-by-round only while 2^k*off < 64. Overlap copies are
        the rare case on real streams (tools/probe_element_stats.py).
        """
        clens = [meta_ref[j, 0] for j in range(tc)]
        ulens = [meta_ref[j, 1] for j in range(tc)]
        lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)

        cursors, oks = [], []
        for j in range(tc):
            hdr, ok0 = _decode_varint_preamble(
                comp_ref, j, clens[j], ulens[j], S_max, nin)
            cursors.append(hdr)
            oks.append(ok0)
        ops = [jnp.int32(0)] * tc
        lit_rems = [jnp.int32(0)] * tc

        def actives(carry):
            return [
                carry[4 * j + 3]
                & ((carry[4 * j] < clens[j]) | (carry[4 * j + 2] > 0))
                for j in range(tc)
            ]

        def cond(carry):
            a = actives(carry)
            r = a[0]
            for x in a[1:]:
                r = r | x
            return r

        def chain_step(j, cursor, op, lit_rem, okc, active):
            win = _read_window(comp_ref, j, cursor, nin)
            fresh = lit_rem == 0
            e = _parse_element(win, cursor, op, clens[j], ulens[j])
            is_lit, lit_hdr, cp_len, cp_off, cp_hdr = (
                e["is_lit"], e["lit_hdr"], e["cp_len"], e["cp_off"], e["cp_hdr"])
            lit_len, fresh_ok = e["lit_len"], e["fresh_ok"]
            oke = okc & jnp.where(fresh & active, fresh_ok, True)
            go = oke & active

            eff_lit = jnp.where(fresh, is_lit, True)
            hdr_eff = jnp.where(fresh, jnp.where(is_lit, lit_hdr, cp_hdr), 0)
            lit_total = jnp.where(fresh, lit_len, lit_rem)
            m_lit = jnp.minimum(128, lit_total)

            src = jnp.maximum(op - cp_off, 0)
            wsrc = _read_window(out_ref, j, src, nout)
            vtmp_ref[j, :] = wsrc[0, :128]
            p0 = jnp.minimum(cp_off, 64)  # clamp before <<: no i32 wrap
            overlap = go & ~eff_lit & (p0 < jnp.minimum(cp_len, 64))

            @pl.when(overlap)
            def _():
                for k in range(6):
                    shift = p0 << k  # round k extends period to 2^k*off
                    @pl.when(shift < 64)
                    def _():
                        v = vtmp_ref[j, :].reshape(1, 128)
                        vv = jnp.where(
                            lane128 >= shift, pltpu.roll(v, shift, 1), v)
                        vtmp_ref[j, :] = vv[0]

            # Literal source = the raw parse window (header skipped via the
            # store's fused pre-roll, not a separate roll here).
            v128 = vtmp_ref[j, :].reshape(1, 128)
            v512 = jnp.where(
                eff_lit, win,
                jnp.concatenate([v128, jnp.zeros((1, 384), _I32)], axis=1))
            m = jnp.where(go, jnp.where(eff_lit, m_lit, cp_len), 0)
            pre = jnp.where(eff_lit, hdr_eff, 0)
            _merge_store(out_ref, j, op, v512, m, nout, pre=pre)

            adv_in = jnp.where(eff_lit, hdr_eff + m_lit, cp_hdr)
            adv_out = jnp.where(eff_lit, m_lit, cp_len)
            cursor = jnp.where(go, cursor + adv_in, cursor)
            op = jnp.where(go, op + adv_out, op)
            lit_rem = jnp.where(
                go, jnp.where(eff_lit, lit_total - m_lit, 0), lit_rem)
            return cursor, op, lit_rem, oke

        def body(carry):
            act = actives(carry)
            out = []
            for j in range(tc):
                out.extend(chain_step(
                    j, carry[4 * j], carry[4 * j + 1],
                    carry[4 * j + 2], carry[4 * j + 3], act[j],
                ))
            return tuple(out)

        carry = tuple(
            x for j in range(tc) for x in (cursors[j], ops[j], lit_rems[j], oks[j])
        )
        carry = jax.lax.while_loop(cond, body, carry)
        for j in range(tc):
            cursor, op, lit_rem, okc = (
                carry[4 * j], carry[4 * j + 1], carry[4 * j + 2], carry[4 * j + 3]
            )
            okc = okc & (cursor == clens[j]) & (op == ulens[j]) & (lit_rem == 0)
            ok_ref[j, 0] = okc.astype(_I32)

    def kernel(meta_ref, comp_ref, out_ref, ok_ref):
        def chunk_body(c, _):
            clen = meta_ref[c, 0]
            ulen = meta_ref[c, 1]

            # --- varint(uncompressed length) preamble, 1-5 bytes ----------
            win0 = _read_window(comp_ref, c, jnp.int32(0), nin)
            b = [win0[0, i] for i in range(5)]
            val = b[0] & 127
            hdr = jnp.int32(1)
            inc = b[0] >= 128  # next byte belongs to the varint
            ok0 = jnp.bool_(True)
            for i in range(1, 5):
                # Final byte may only carry bits < 2^31 (int32 arithmetic;
                # larger lengths can never match ulen <= S_max anyway).
                if i == 4:
                    ok0 = ok0 & (~inc | (b[4] < 8))
                val = val + jnp.where(inc, (b[i] & 127) << (7 * i), 0)
                hdr = hdr + inc.astype(_I32)
                inc = inc & (b[i] >= 128)
            ok0 = ok0 & ~inc  # must terminate within 5 bytes
            ok0 = ok0 & (val == ulen) & (hdr <= clen) & (ulen <= S_max)

            # --- element walk ---------------------------------------------
            def cond(carry):
                cursor, op, okc = carry
                return okc & (cursor < clen)

            def body(carry):
                cursor, op, okc = carry
                win = _read_window(comp_ref, c, cursor, nin)
                e = _parse_element(win, cursor, op, clen, ulen)
                is_lit, lit_hdr, cp_len, cp_off = (
                    e["is_lit"], e["lit_hdr"], e["cp_len"], e["cp_off"])
                lit_len, elen, in_need = e["lit_len"], e["elen"], e["in_need"]
                oke = okc & e["fresh_ok"]

                # Literal: stream bytes -> output, 128-byte pieces.
                lit_n = jnp.where(oke & is_lit, lit_len, 0)

                def lbody(k):
                    m = jnp.minimum(128, lit_n - k)
                    w = _read_window(comp_ref, c, cursor + lit_hdr + k, nin)
                    _merge_store(out_ref, c, op + k, w, m, nout)
                    return k + 128

                jax.lax.while_loop(lambda k: k < lit_n, lbody, jnp.int32(0))

                # Copy: read back-reference window from the output written so
                # far, extend its period to >= 64 lanes by shift-doubling,
                # store once. Lanes >= cp_off of the raw window are garbage
                # (unwritten output) and are fully overwritten by round 1.
                src = jnp.maximum(op - cp_off, 0)
                wsrc = _read_window(out_ref, c, src, nout)
                v = wsrc[:, :256]
                valid = jnp.clip(cp_off, 1, 64)
                lane = jax.lax.broadcasted_iota(_I32, (1, 256), 1)
                for _ in range(6):
                    v = jnp.where(lane >= valid, pltpu.roll(v, valid, 1), v)
                    valid = jnp.minimum(valid * 2, 128)
                m_cp = jnp.where(oke & ~is_lit, cp_len, 0)
                v512 = jnp.concatenate([v, jnp.zeros((1, 256), _I32)], axis=1)
                _merge_store(out_ref, c, op, v512, m_cp, nout)

                cursor = jnp.where(oke, cursor + in_need, cursor)
                op = jnp.where(oke, op + elen, op)
                return cursor, op, oke

            cursor, op, okc = jax.lax.while_loop(
                cond, body, (hdr, jnp.int32(0), ok0)
            )
            okc = okc & (cursor == clen) & (op == ulen)
            ok_ref[c, 0] = okc.astype(_I32)
            return 0

        jax.lax.fori_loop(0, meta_ref.shape[0], chunk_body, 0)

    kernels = {
        "interleaved": kernel_interleaved,
        "branch": kernel_branch,
        "hybrid": kernel_hybrid,
        "serial": kernel,
    }
    out, ok = pl.pallas_call(
        kernels[impl],
        grid=(C // tc,),
        in_specs=[
            pl.BlockSpec((tc, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tc, nin, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tc, nout, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, nout, 128), _I32),
            jax.ShapeDtypeStruct((C, 1), _I32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((tc, 128), _I32)] if impl in ("branch", "hybrid") else []
        ),
        interpret=_interpret(),
    )(meta, comp_blocks)
    out = jnp.take(out, inv, axis=0)
    ok = jnp.take(ok, inv, axis=0)
    return (
        out.reshape(C, nout * 128)[:C0, :S_max].astype(jnp.uint8),
        ok[:C0, 0].astype(jnp.bool_),
    )
