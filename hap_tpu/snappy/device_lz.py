"""TPU-native Snappy LZ encoder: vectorized match finding + piece planning.

Round-5 job #1 (VERDICT r4): the device encode path must produce REAL
second-stage compression (hap.c:448-476 calls snappy_compress per chunk;
the r4 device emitter was G-periodic RLE only and real content fell back to
raw storage — measured 1.3-8.6x the reference's container bytes).

Byte-serial greedy LZ (the reference's snappy) is the worst fit for a
vector machine, so this encoder reformulates match finding as dense,
fully-vectorized plane math over the chunk's 4-byte word lattice — a shape
the VPU executes at line rate — and leaves only the final byte emission to
a Pallas kernel (pallas_lz.py) that walks precomputed piece tables:

1. CANDIDATE OFFSETS, not hash tables. tools/probe_lz_structure.py measured
   google snappy's savings on real DXT payloads: >99% of saved bytes sit at
   16-byte-aligned offsets (the BCn block stride), concentrated on small
   block multiples and the frame's block-row stride (vertical matches).
   A static ~28-candidate set {16..256 step 16, powers of two, row-stride
   +-16, 2x/3x row} captures the reference's ratio (4K: natural 1.000x,
   graphics 0.82x, noise 1.01x of google snappy's bytes — the bestrun
   selection beats greedy hashing on coherent content).
2. BIT-PACKED MASKS: all candidates' match masks live in ONE int32 plane
   (bit c = candidate c matches at this word). Capped run lengths for every
   candidate come from 5 shift-AND doubling steps on the packed plane
   (levels 1/2/4/8/16), and run-through-position coverage from shift-OR
   spreads — ~100 VPU ops/word TOTAL for 28 candidates instead of ~30 per
   candidate.
3. RUN-MAXIMIZING SELECTION: per word, the candidate with the longest
   capped run through it wins (ties -> smallest offset). This is the
   decisive quality lever: last-occurrence greedy (what a hash table gives)
   fragments runs across offsets and measured 2.7-6x WORSE on graphics.
4. MIN-RUN DEMOTION (default 4 words = 16 B): sub-16-byte copy runs carry
   <3% of the ratio on the gate classes but dominate piece counts (the
   device emission/decode cost unit); demoting them to literals cuts
   pieces 3-25x (probe: graphics 65K->22K runs, natural 35K->300).
5. BYTE-EDGE EXTENSION: snappy copy lengths are byte-granular; extending
   each run's edges into the neighbouring literal by up to 3 matching
   bytes (at the same offset) recovers the word-lattice truncation loss
   (graphics 1.29x -> 1.02x of reference bytes at min-run 4).
6. PIECE TABLES, not streams: planning emits per-segment (256-word) slot
   tables of packed piece records (copy runs split at 128 elements,
   literals split at the absolute 256-word grid so every piece is bounded
   and segment-local). Table construction is pure plane math + one
   rank-select per segment — no scatter (8 ns/element), no sort.

The emitted stream is strictly conforming Snappy (varint preamble, 1/2/3-
byte literal tags, copy-2 elements with 16-bit offsets), decodable by any
spec decoder including the reference's google snappy (format: normative
ref [2] of the Hap spec, HapVideoDRAFT.md:23,146).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32

SEG_WORDS = 256          # piece-table segment (1024 payload bytes)
SEG_SLOTS = 32           # piece slots per segment (K)
COPY_SPLIT_ELEMS = 128   # max copy-2 elements per piece (384 stream bytes)
COPY_SPLIT_WORDS = COPY_SPLIT_ELEMS * 16  # 2048 words per copy piece
MIN_RUN_WORDS = 4        # demote copy runs under 16 bytes (see module doc)
_FOLD_LIMIT = SEG_SLOTS - 4  # copy-run starts per segment before the
# overflow fold forces the segment literal (reserve: <=2 grid-literal
# pieces + <=1 copy-split anchor + slack)


def candidate_distances(S: int, row_bytes: int, G: int = 16) -> Tuple[int, ...]:
    """Static candidate byte offsets for a chunk of S bytes in a frame with
    ``row_bytes`` per block row and G-byte blocks. All multiples of 4 (word
    lattice), < S, <= 65535 (copy-2 range), <= 28 entries, sorted ascending
    (selection tie-break prefers earlier = smaller offsets). The ladder is
    block multiples 1..16 (the probe: >99% of google snappy's savings on
    DXT payloads sit on the block stride), a few coarser multiples, and
    the frame's block-row stride +-1 block (vertical matches)."""
    G = G if G in (8, 16) else 16
    cands = list(range(G, 16 * G + 1, G))
    cands += [20 * G, 24 * G, 32 * G, 48 * G, 64 * G, 128 * G, 256 * G]
    if row_bytes % 4 == 0 and row_bytes > 0:
        cands += [row_bytes - G, row_bytes, row_bytes + G,
                  2 * row_bytes, 3 * row_bytes]
    out = sorted({d for d in cands if 4 <= d < min(S, 65536) and d % 4 == 0})
    if len(out) > 28:
        # drop the least-valuable mid-ladder entries first (measured: the
        # low block multiples and the row strides carry the savings)
        drop = [14 * G, 11 * G, 13 * G, 7 * G, 19 * G]
        out = [d for d in out if d not in drop][:28]
    return tuple(out)


def lz_bound(S: int) -> int:
    """Worst-case emitted stream width: all-literal with 3-byte tags per
    1024-byte grid piece + varint, rounded up; also >= the RLE profile's
    bound so either profile's streams fit the same (C, bound) buffer."""
    n_pieces = -(-S // 1024) + 1
    return S + 3 * n_pieces + 8


class LzPlan(NamedTuple):
    """Device-side planning output for one (C, S) chunk batch.

    Piece tables are SPLIT BY KIND so the emission kernel runs two
    specialized loops: copy pieces touch no payload bytes (3-byte copy-2
    elements built from scalars) while literal pieces stream payload
    windows — a unified loop would pay the 10-row window read for every
    3-element copy piece."""

    tables_lit: jnp.ndarray   # (C, NSEG * SEG_SLOTS, 2) int32 records
    tables_copy: jnp.ndarray  # (C, NSEG * SEG_SLOTS, 2) int32 records
    counts: jnp.ndarray       # (C, NSEG, 2) int32 [lit, copy] per segment
    comp_len: jnp.ndarray     # (C,) int32 stream bytes (varint incl.)
    n_pieces: jnp.ndarray     # (C,) int32 total pieces


def _shl(x, k):
    """x shifted toward higher index: out[i] = x[i-k], zero-filled."""
    if k == 0:
        return x
    return jnp.pad(x[:, :-k], ((0, 0), (k, 0)))


def _shr(x, k, fill=0):
    """x shifted toward lower index: out[i] = x[i+k], fill at tail."""
    if k == 0:
        return x
    return jnp.pad(x[:, k:], ((0, 0), (0, k)), constant_values=fill)


def _or_spread(p, l):
    """out[i] = OR of p[i .. i+l-1] (log2(l) doubling steps)."""
    k = 1
    while k < l:
        p = p | _shr(p, k)
        k *= 2
    return p


def _varint(S: int) -> np.ndarray:
    out = []
    v = S
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            return np.asarray(out, np.uint8)


# Record packing (2 int32 words per piece):
#   w0: out_pos (bits 0..19) | len_field << 20 (bits 20..30) | kind << 31
#       literal: len_field = byte length (<= 1030); copy: n_elements (<=128)
#   w1: literal: in_byte_pos (bits 0..19) | tag_len << 20 (2 bits)
#       copy:    d_bytes (bits 0..16)    | tail_len << 17 (7 bits, last
#                element's length 1..64 — 64 unless this is the run's
#                final piece)
KIND_COPY = -(1 << 31)  # int32 bit 31 (sign bit) marks copy pieces


def plan_lz(data: jnp.ndarray, S: int, G: int, row_bytes: int,
            min_run_words: int = MIN_RUN_WORDS) -> LzPlan:
    """(C, S) uint8 chunk payloads -> LzPlan (all shapes static).

    Every step is dense per-word plane math (see module doc); the only
    sequential state is in jnp.cumsum / lax.cummax scans along the word
    axis. S must be a multiple of 4 and < 2**20 (record packing).
    """
    assert S % 4 == 0 and S < (1 << 20), (S,)
    C = data.shape[0]
    N = S // 4
    NSEG = -(-N // SEG_WORDS)
    Np = NSEG * SEG_WORDS
    cands = candidate_distances(S, row_bytes, G)
    P_VAR = len(_varint(S))

    # bitcast, not byte-lane shifts: u8->i32 extraction is a 4x strided
    # relayout that measured 2.96 ms/frame on silicon; bitcast is free
    # and little-endian on this platform (tools/probe_lz_plan_stages.py)
    words = jax.lax.bitcast_convert_type(
        data.reshape(C, N, 4), jnp.uint32).astype(_I32)
    if Np != N:
        words = jnp.pad(words, ((0, 0), (0, Np - N)))
    pos = jnp.broadcast_to(jnp.arange(Np, dtype=_I32)[None, :], (C, Np))
    in_range = pos < N

    # ---- 1/2. packed candidate masks + capped-run levels -------------
    M = jnp.zeros((C, Np), _I32)
    for ci, db in enumerate(cands):
        c = db // 4
        eq = jnp.pad(words[:, c:] == words[:, :-c], ((0, 0), (c, 0)))
        M = M | (eq.astype(_I32) << ci)
    M = jnp.where(in_range, M, 0)

    # capped-run levels by shift-AND doubling; the cap must exceed typical
    # run lengths (graphics runs average ~85 words): at cap 16, a 500-word
    # row-stride run TIES a 70-word d=16 run and the tie-break fragments
    # the long run — measured +14% bytes on the graphics anchor. Cap 256.
    levels = [M]
    k = 1
    while k < 256:
        levels.append(levels[-1] & _shl(levels[-1], k))
        k *= 2

    # ---- 3. run-through coverage + selection -------------------------
    # sel_lvl tracks the winning level: positions whose best level is
    # below min_run have NO candidate with a >=min_run-word run through
    # them, which is exactly the min-run demotion criterion — computing
    # it here saves the pass-A run scans (2 full-width cummax/cummin).
    bits = levels[0]
    sel_lvl = jnp.ones((C, Np), _I32)
    l = 2
    for P in levels[1:]:
        R = _or_spread(P, l)
        nz = R != 0
        bits = jnp.where(nz, R, bits)
        sel_lvl = jnp.where(nz, l, sel_lvl)
        l *= 2
    low = bits & (-bits)  # smallest candidate index at the best level
    dw = jnp.zeros((C, Np), _I32)
    selw = jnp.zeros((C, Np), _I32)    # words[i - dw[i]]
    prevsel = jnp.zeros((C, Np), _I32)  # words[i - 1 - dw[i]]
    nextsel = jnp.zeros((C, Np), _I32)  # words[i + 1 - dw[i]]
    for ci, db in enumerate(cands):
        c = db // 4
        hit = (low >> ci) & 1
        dw = dw + hit * c
        sh = _shl(words, c)
        selw = selw + hit * sh
        prevsel = prevsel + hit * _shl(words, c + 1)
        nextsel = nextsel + hit * (_shl(words, c - 1) if c > 1 else words)
    dw = jnp.where(bits != 0, dw, 0)

    # ---- demotion + overflow fold (no scans: level-based) ------------
    # best level < min_run => no candidate has a >=min_run run through
    # this word => any selected copy run here is short => demote.
    # (A selected run can still come out shorter than min_run when the
    # run-maximizing selection switches candidates mid-run; that only
    # costs a few extra small pieces, bounded by the segment slot cap.)
    assert min_run_words in (1, 2, 4, 8, 16)
    if min_run_words > 1:
        dw = jnp.where(sel_lvl < min_run_words, 0, dw)

    # overflow fold: a segment with too many copy-run starts cannot be
    # represented in SEG_SLOTS records -> force it literal. Run starts
    # need no scan: a start is a position whose d differs from its left
    # neighbour's.
    bnd = jnp.concatenate(
        [jnp.ones((C, 1), jnp.bool_), dw[:, 1:] != dw[:, :-1]], axis=1)
    seg_csA = jnp.sum(
        (bnd & (dw > 0)).reshape(C, NSEG, SEG_WORDS).astype(_I32), axis=2)
    fold = seg_csA > _FOLD_LIMIT  # (C, NSEG)
    dw = jnp.where(jnp.repeat(fold, SEG_WORDS, axis=1), 0, dw)

    # ---- final run structure (the only full-width scans) -------------
    def _runs(dwp):
        b = jnp.concatenate(
            [jnp.ones((C, 1), jnp.bool_), dwp[:, 1:] != dwp[:, :-1]], axis=1
        )
        bidx = jnp.where(b, pos, -1)
        run_start = jax.lax.cummax(bidx, axis=1)
        nxt = jnp.where(b, pos, Np)
        m = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
        run_end = _shr(m, 1, fill=Np)
        run_end = jnp.minimum(run_end, N)
        return run_start, run_end

    rs, re = _runs(dw)
    is_copy = dw > 0
    is_start = pos == rs
    copy_start = is_start & is_copy
    run_words = re - rs

    # ---- 5. byte-edge extension -------------------------------------
    def _bytes4(w):
        return [(w >> (8 * k)) & 0xFF for k in range(4)]

    def _prefix_match(a, b):
        e = [(x == y).astype(_I32) for x, y in zip(_bytes4(a), _bytes4(b))]
        return e[0] * (1 + e[1] * (1 + e[2]))  # 0..3

    def _suffix_match(a, b):
        e = [(x == y).astype(_I32) for x, y in zip(_bytes4(a), _bytes4(b))]
        return e[3] * (1 + e[2] * (1 + e[1]))  # 0..3

    # ext_l at copy-run starts: trailing bytes of word rs-1 matching at d
    ext_l_raw = _suffix_match(_shl(words, 1), prevsel)
    # ext_r at copy-run last words: leading bytes of word re matching at d
    ext_r_raw = _prefix_match(_shr(words, 1), nextsel)

    is_last = (pos == re - 1) & is_copy
    prev_is_lit = _shl((~is_copy).astype(_I32), 1).astype(jnp.bool_)
    next_is_lit = _shr((~is_copy).astype(_I32), 1, fill=0).astype(jnp.bool_)
    # no literal to steal from -> 0; chunk edges -> 0; the left extension
    # also needs its source word in range (pos-1-dw >= 0 <=> pos > dw),
    # which simultaneously keeps the copy's output source inside the
    # chunk (4*rs - ext_l - d >= 0)
    ext_l_s = jnp.where(copy_start & prev_is_lit & (pos > dw), ext_l_raw, 0)
    ext_r_e = jnp.where(
        is_last & next_is_lit & (pos < N - 1) & (pos + 1 > dw),
        ext_r_raw, 0)

    # propagate the left copy's ext_r forward across the literal run:
    # packed (pos << 2 | er) cummax, valid while inside the literal.
    er_src = jnp.where(is_last, (pos << 2) | ext_r_e, -1)
    er_prop_packed = jax.lax.cummax(er_src, axis=1)
    er_prop = jnp.where(er_prop_packed >= 0, er_prop_packed & 3, 0)
    er_prop_pos = jnp.where(er_prop_packed >= 0, er_prop_packed >> 2, -1)
    # at a literal run start ps: the left copy ends at ps-1
    er_head = jnp.where(
        is_start & (~is_copy) & (er_prop_pos == pos - 1), er_prop, 0
    )
    # cap ext_l by the literal bytes remaining after the head steal:
    # lit_bytes = 4*run_words(prev lit) - er_head(at its start) ...
    # propagate er_head to the literal's END via another packed cummax
    eh_src = jnp.where(is_start & (~is_copy), (pos << 2) | er_head, -1)
    eh_packed = jax.lax.cummax(eh_src, axis=1)
    eh_at = jnp.where(eh_packed >= 0, eh_packed & 3, 0)
    # at copy-run start i, the preceding literal run is [rs_prev, i):
    # its head steal is eh_at[i-1]; its byte length 4*(i - start_prev).
    prev_lit_words = _shl(pos - rs, 1) + 1  # run length of word i-1's run
    prev_lit_bytes = 4 * prev_lit_words - _shl(eh_at, 1)
    ext_l = jnp.minimum(ext_l_s, jnp.maximum(prev_lit_bytes, 0))
    ext_l = jnp.where(copy_start, ext_l, 0)

    # back-propagate this run's ext_r from its last word to its start,
    # and this run's ext_l from its start to every word (for anchors).
    # Nearest-defined-position semantics: forward = cummax of
    # (pos << 2 | value), backward = flip-cummin — then VALIDATE that the
    # carried position is this run's own edge (a stale neighbour's value
    # must read as 0).
    rev = lambda x: jnp.flip(x, axis=1)
    BIGP = (Np + 1) << 2
    er_back = rev(jax.lax.cummin(
        rev(jnp.where(is_last, (pos << 2) | ext_r_e, BIGP)), axis=1))
    er_run = jnp.where((er_back >> 2) == re - 1, er_back & 3, 0)
    el_fwd = jax.lax.cummax(
        jnp.where(copy_start, (pos << 2) | ext_l, -1), axis=1)
    el_run = jnp.where(el_fwd >= 0, jnp.where(
        (el_fwd >> 2) == rs, el_fwd & 3, 0), 0)

    # literal byte ownership per word (steals only touch the run's first
    # and last word; both can apply to a 1-word literal, capped >= 0)
    lit_last = (pos == re - 1) & (~is_copy)
    # ext_l of the copy run starting at re: propagate backward
    el_next_packed = rev(jax.lax.cummin(
        rev(jnp.where(copy_start, (pos << 2) | ext_l, (Np << 2) | 0)),
        axis=1))
    el_next_pos = el_next_packed >> 2
    el_next = jnp.where(el_next_pos == re, el_next_packed & 3, 0)
    steal_head = jnp.where(is_start & (~is_copy), er_head, 0)
    steal_tail = jnp.where(lit_last, el_next, 0)
    lit_bytes = jnp.where(
        (~is_copy) & in_range,
        jnp.maximum(4 - steal_head - steal_tail, 0), 0)

    # ---- 9. emission sizing + stream positions ----------------------
    L_run = 4 * run_words + el_run + er_run  # copy run bytes (incl. ext)
    nel_total = -(-L_run // 64)
    grid_lit_start = ((~is_copy) & (pos % SEG_WORDS == 0) & (~is_start)
                      & in_range)
    lit_piece_start = (is_start & (~is_copy) & in_range) | grid_lit_start
    # piece byte length: [i, pend) with pend = min(next grid, run end)
    grid_end = (pos // SEG_WORDS + 1) * SEG_WORDS
    pend = jnp.minimum(jnp.minimum(grid_end, re), N)
    blen = jnp.where(
        lit_piece_start,
        4 * (pend - pos)
        - jnp.where(is_start, steal_head, 0)
        - jnp.where(pend == re, el_next, 0),
        0)
    lit_piece_start = lit_piece_start & (blen > 0)
    tag_len = jnp.where(blen > 256, 3, jnp.where(blen > 60, 2, 1))
    tag_len = jnp.where(lit_piece_start, tag_len, 0)

    contrib = jnp.where(is_copy, jnp.where(copy_start, 3 * nel_total, 0),
                        lit_bytes + tag_len)
    cs_inc = jnp.cumsum(contrib, axis=1)
    out_cs = P_VAR + cs_inc - contrib  # exclusive prefix + varint
    comp_len = P_VAR + cs_inc[:, -1]

    # ---- 10/11. piece records ---------------------------------------
    anchor = is_copy & ((pos - rs) % COPY_SPLIT_WORDS == 0) & in_range
    copy_piece = anchor  # includes the run start (j = 0)
    j_idx = (pos - rs) // COPY_SPLIT_WORDS
    nel_before = COPY_SPLIT_ELEMS * j_idx
    nel_piece = jnp.minimum(nel_total - nel_before, COPY_SPLIT_ELEMS)
    copy_piece = copy_piece & (nel_piece > 0)
    is_final_piece = nel_before + nel_piece == nel_total
    tail_len = jnp.where(is_final_piece, L_run - 64 * (nel_total - 1), 64)
    copy_out = out_cs - jnp.where(copy_start, 0, 3 * nel_total) + 3 * nel_before
    # literal piece source offset: head steal only at the run's first word
    lit_in = 4 * pos + jnp.where(is_start, steal_head, 0)

    def _rank_select(mask, w0, w1):
        """Per-segment rank-select of masked records into SEG_SLOTS."""
        pseg = mask.reshape(C, NSEG, SEG_WORDS)
        rank = jnp.cumsum(pseg.astype(_I32), axis=2) - pseg.astype(_I32)
        counts = jnp.sum(pseg.astype(_I32), axis=2)
        w0s = jnp.where(mask, w0, 0).reshape(C, NSEG, SEG_WORDS)
        w1s = jnp.where(mask, w1, 0).reshape(C, NSEG, SEG_WORDS)
        p32 = pseg.astype(_I32)
        slots_w0 = jnp.zeros((C, NSEG, SEG_SLOTS), _I32)
        slots_w1 = jnp.zeros((C, NSEG, SEG_SLOTS), _I32)
        for k in range(SEG_SLOTS):
            m = p32 * (rank == k).astype(_I32)
            slots_w0 = slots_w0.at[:, :, k].set(jnp.sum(m * w0s, axis=2))
            slots_w1 = slots_w1.at[:, :, k].set(jnp.sum(m * w1s, axis=2))
        table = jnp.stack([slots_w0, slots_w1], axis=3).reshape(
            C, NSEG * SEG_SLOTS, 2)
        return table, counts

    lit_w0 = out_cs | (blen << 20)
    lit_w1 = lit_in | (tag_len << 20)
    cp_w0 = copy_out | (nel_piece << 20) | KIND_COPY
    cp_w1 = (4 * dw) | (tail_len << 17)
    tables_lit, counts_lit = _rank_select(lit_piece_start, lit_w0, lit_w1)
    tables_copy, counts_copy = _rank_select(copy_piece, cp_w0, cp_w1)
    counts = jnp.stack([counts_lit, counts_copy], axis=2)
    n_pieces = jnp.sum(counts_lit + counts_copy, axis=1)
    return LzPlan(tables_lit, tables_copy, counts, comp_len, n_pieces)


# ---------------------------------------------------------------------------
# Reference emitter (numpy; consumed by tests and as the kernel oracle)
# ---------------------------------------------------------------------------

def emit_reference(data: np.ndarray, plan: LzPlan, S: int) -> list[bytes]:
    """Pack each chunk's pieces into its Snappy stream (numpy loop).

    Bit-exact contract for the Pallas emission kernel; also the
    integration fallback on platforms without the kernel.
    """
    t_lit = np.asarray(plan.tables_lit)
    t_copy = np.asarray(plan.tables_copy)
    counts = np.asarray(plan.counts)
    comp_len = np.asarray(plan.comp_len)
    C = data.shape[0]
    NSEG = counts.shape[1]
    pre = _varint(S)
    out = []
    for c in range(C):
        buf = np.zeros(int(comp_len[c]), np.uint8)
        buf[: len(pre)] = pre
        for s in range(NSEG):
            for k in range(int(counts[c, s, 1])):  # copy pieces
                w0 = int(t_copy[c, s * SEG_SLOTS + k, 0])
                w1 = int(t_copy[c, s * SEG_SLOTS + k, 1])
                o = w0 & 0xFFFFF
                nel = (w0 >> 20) & 0x7FF
                d = w1 & 0x1FFFF
                tail = (w1 >> 17) & 0x7F
                for e in range(nel):
                    ln = tail if e == nel - 1 else 64
                    buf[o] = 2 | ((ln - 1) << 2)
                    buf[o + 1] = d & 0xFF
                    buf[o + 2] = d >> 8
                    o += 3
            for k in range(int(counts[c, s, 0])):  # literal pieces
                w0 = int(t_lit[c, s * SEG_SLOTS + k, 0])
                w1 = int(t_lit[c, s * SEG_SLOTS + k, 1])
                o = w0 & 0xFFFFF
                blen = (w0 >> 20) & 0x7FF
                tl = (w1 >> 20) & 3
                ip = w1 & 0xFFFFF
                n = blen - 1
                if tl == 1:
                    buf[o] = n << 2
                elif tl == 2:
                    buf[o] = 60 << 2
                    buf[o + 1] = n
                else:
                    buf[o] = 61 << 2
                    buf[o + 1] = n & 0xFF
                    buf[o + 2] = n >> 8
                buf[o + tl : o + tl + blen] = data[c, ip : ip + blen]
        out.append(buf.tobytes())
    return out
