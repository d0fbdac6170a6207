"""Host-side Snappy stream -> op-table compiler for the TPU executor.

The parse/execute split for foreign-frame decode: byte-serial tag walking
is CPU-shaped work (the reference consumes google snappy's CPU parser,
hap.c:612), so the host compiles each stream into a fixed-shape table of
uniform ops that the Pallas executor (snappy/pallas_exec.py) replays with
pure vector moves — no tag decode, no validation, and no overlap
period-doubling on device. This is the same division of labor the
framework's container layer already uses (SURVEY.md §7: host planner emits
fixed-shape index tables; jitted code consumes them).

Compilation steps per stream:

1. Walk elements, validating EXACTLY like the decoders (bounds, offset
   >= 1 and <= bytes produced, preamble == expected length, termination
   at the stream end) — a malformed stream yields ok=False and no table.
2. Compact all literal bytes into a dense plane (stream order).
3. Merge consecutive copies with equal offset (google snappy splits long
   matches into <= 64-byte elements, hap.c:453's emitter; vertical-match
   runs at off = row stride and RLE fills re-fuse into single long ops —
   measured 1.7-54x element reduction, tools/probe_merge_stats.py), and
   merge consecutive literals.
4. Expand every overlapping copy (off < min(m, 128)) into a
   doubling-offset sequence of NON-overlapping copies:
   (off, m) -> (off, off), (2*off, min(2*off, m-off)), (4*off, ...) ...
   Each emitted op satisfies off_k >= m_k, so the executor's 128-byte
   pieces never read bytes they are writing; the period-doubling rounds
   (the dominant per-element cost of the fused kernel,
   tools/probe_general_cost.py) disappear from the device entirely.
5. Split every op at 128-byte OUTPUT-block boundaries (the host knows the
   exact output position of every op, so the alignment is static data):
   each emitted piece has m <= 128, never crosses a block boundary, and
   carries an end-of-block flag. The executor's per-stage state machine
   collapses to scalar prefix sums — no min() chains, no continuation
   state, no fetch predication, no flush predicates.

Piece encoding (int32 x 2): [m | end_of_block << 8, off]; off == 0 means
literal (source = the literal plane at the running literal cursor),
off > 0 means copy from ``off`` bytes back in the output.

The kernel invariant delivered: every piece has 1 <= m <= 128, stays
inside one 128-byte output block, and off == 0 or m <= off <= bytes
already produced.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class OpTable:
    ops: np.ndarray  # (N, 2) int32 [m | end<<8, off]; off==0 -> literal
    lit: np.ndarray  # (L,) uint8 dense literal plane, stream order
    out_len: int  # decoded size (== validated varint preamble)


def _read_varint(view, pos: int, n: int) -> Tuple[Optional[int], int]:
    val = 0
    shift = 0
    for _ in range(5):
        if pos >= n:
            return None, pos
        b = view[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            if val >= 1 << 32:
                return None, pos
            return val, pos
        shift += 7
    return None, pos


def build_op_table(stream: bytes, expected_len: Optional[int] = None,
                   promote_max: int = 0) -> Optional[OpTable]:
    """Compile one Snappy stream; None if malformed (same accept/reject
    surface as snappy/pyref.py — differentially tested).

    ``promote_max``: copies shorter than this are PROMOTED to literals —
    the compiler decodes the stream as it parses (the walk touches every
    byte anyway), so it knows the copied bytes and can emit them into the
    literal plane, where they merge with neighboring literals. Short
    diverse-offset copies dominate the piece count on graphics-class
    streams (~80 ns/piece on device is the executor's floor), so trading
    literal-plane bytes for pieces moves work from the latency-bound
    device walk to the bandwidth-cheap literal stream.
    """
    view = memoryview(stream)
    n = len(view)
    out_len, pos = _read_varint(view, 0, n)
    if out_len is None:
        return None
    if expected_len is not None and out_len != expected_len:
        return None

    raw: List[Tuple[int, int, int]] = []  # (m, off, lit_pos)
    lit_parts: List[Tuple[int, int]] = []  # (start, len) into stream
    op = 0
    while pos < n:
        tag = view[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                if pos + extra > n:
                    return None
                length = int.from_bytes(view[pos:pos + extra], "little") + 1
                pos += extra
            if pos + length > n or op + length > out_len:
                return None
            lit_parts.append((pos, length))
            raw.append((length, 0, 0))
            pos += length
            op += length
        else:
            if kind == 1:
                if pos + 1 > n:
                    return None
                length = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | view[pos]
                pos += 1
            elif kind == 2:
                if pos + 2 > n:
                    return None
                length = (tag >> 2) + 1
                off = view[pos] | (view[pos + 1] << 8)
                pos += 2
            else:
                if pos + 4 > n:
                    return None
                length = (tag >> 2) + 1
                off = int.from_bytes(view[pos:pos + 4], "little")
                pos += 4
            if off < 1 or off > op or op + length > out_len:
                return None
            raw.append((length, off, 0))
            op += length
    if op != out_len:
        return None

    # -- merge consecutive same-off copies / consecutive literals ---------
    merged: List[List[int]] = []
    for m, off, _ in raw:
        if merged and merged[-1][1] == off and (
                off > 0 or merged[-1][1] == 0):
            merged[-1][0] += m
        else:
            merged.append([m, off])

    # -- promote short copies to literals (needs the decoded bytes) -------
    decoded = None
    if promote_max > 0:
        from hap_tpu.snappy import pyref

        decoded = np.frombuffer(pyref.decompress(stream), np.uint8)
        promoted: List[List[int]] = []
        for m, off in merged:
            if off > 0 and m < promote_max:
                off = 0
            if promoted and promoted[-1][1] == 0 and off == 0:
                promoted[-1][0] += m
            else:
                promoted.append([m, off])
        merged = promoted

    # -- expand overlap copies into non-overlapping doubling sequence -----
    expanded: List[Tuple[int, int]] = []
    for m, off in merged:
        if off == 0 or off >= min(m, 128):
            expanded.append((m, off))
            continue
        # period-doubling expansion: each emitted op has off_k >= m_k
        cur_off, rem = off, m
        while rem > 0 and cur_off < 128:
            take = min(cur_off, rem)
            expanded.append((take, cur_off))
            rem -= take
            cur_off *= 2
        if rem > 0:
            expanded.append((rem, cur_off))

    # -- split at 128-byte output-block boundaries, flag block ends -------
    ops: List[Tuple[int, int]] = []
    pos = 0
    for m, off in expanded:
        while m > 0:
            take = min(m, 128 - (pos & 127))
            end = 1 if ((pos & 127) + take) == 128 else 0
            ops.append((take | (end << 8), off))
            pos += take
            m -= take

    if decoded is not None:
        # promoted bytes come from the decoded output; stream order
        pieces = []
        pos_ = 0
        for m, off in merged:
            if off == 0:
                pieces.append(decoded[pos_: pos_ + m])
            pos_ += m
        lit = (np.concatenate(pieces) if pieces
               else np.empty(0, np.uint8)).astype(np.uint8)
    else:
        lit = np.empty(sum(ln for _, ln in lit_parts), np.uint8)
        w = 0
        src = np.frombuffer(stream, np.uint8)
        for start, ln in lit_parts:
            lit[w:w + ln] = src[start:start + ln]
            w += ln
    return OpTable(
        ops=np.asarray(ops, np.int32).reshape(-1, 2),
        lit=lit,
        out_len=out_len,
    )


def pack_fields(ops_logical: np.ndarray, nout: int) -> np.ndarray:
    """Logical pieces [(m|end<<8, off)] -> executor field words.

    Every per-stage scalar the kernel would otherwise derive serially
    (output position, literal cursor, source row, roll shift, near/far
    classification) is a pure function of the piece prefix — so it is
    computed HERE, vectorized, and the device stage machine shrinks to
    two counters (piece index, block index). Encoding:

      w0 = pa | pe<<7 | end<<15 | near<<16 | shift<<17   (25 bits)
      w1 = source row (far/literal; near reads registers)

    ``nout`` must equal ceil(S_max/128) of the executor call — the
    literal plane lives at rows [nout, ...).
    """
    if ops_logical.size == 0:
        return ops_logical.reshape(-1, 2).astype(np.int32)
    w0 = ops_logical[:, 0].astype(np.int64)
    off = ops_logical[:, 1].astype(np.int64)
    m = w0 & 0xFF
    end = w0 >> 8
    outpos = np.concatenate(([0], np.cumsum(m[:-1])))
    pa = outpos & 127
    pe = pa + m
    is_lit = off == 0
    lc = np.concatenate(([0], np.cumsum((m * is_lit)[:-1])))
    s = np.where(is_lit, nout * 128 + lc, outpos - off)
    near = (~is_lit) & (off <= pa + 128)
    srcl = np.where(near, 128 + pa - off, s & 127)
    shift = (pa - srcl) % 256
    row0 = np.where(near, 0, s >> 7)
    packed = np.empty_like(ops_logical)
    packed[:, 0] = (pa | (pe << 7) | (end << 15) | (near << 16)
                    | (shift << 17)).astype(np.int32)
    packed[:, 1] = row0.astype(np.int32)
    return packed


@dataclass
class PackedTables:
    """Fixed-shape arrays for a set of streams (kernel inputs).

    ops rows hold pack_fields() words (device form); the logical
    [(m|end<<8, off)] form is build_op_table's output."""

    ops: np.ndarray  # (C, N_max, 2) int32, zero-padded
    n_ops: np.ndarray  # (C,) int32
    lit: np.ndarray  # (C, L_max) uint8, zero-padded
    n_lit: np.ndarray  # (C,) int32
    out_len: np.ndarray  # (C,) int32
    ok: np.ndarray  # (C,) bool — host verdict; failed rows have 0 ops
    S_max: int  # the executor S_max these tables were packed for


def default_promote_max() -> int:
    """Literal-promotion threshold (copies shorter than this become
    literal-plane bytes). 128 is strictly optimal for piece count — a
    copy and a literal of m >= 128 cost identical ceil(m/128) pieces, so
    longer promotion only grows the plane — and measured on real
    HapEncode 4K streams it cuts pieces 2.5-3.4x while the table shrink
    offsets the literal growth byte-for-byte. Env HAP_TPU_PROMOTE_MAX."""
    import os

    return int(os.environ.get("HAP_TPU_PROMOTE_MAX", "128"))


def pack_tables(streams: Sequence[bytes],
                expected_lens: Optional[Sequence[int]] = None,
                prefer_native: bool = True,
                S_max: Optional[int] = None,
                promote_max: Optional[int] = None) -> PackedTables:
    """Compile a set of streams to fixed-shape tables.

    Uses the multithreaded C++ compiler (native/src/hapn.cpp:
    hapn_snappy_optable_batch — byte-identical tables, differentially
    tested) when available; the Python builder is the semantic reference.

    ``S_max`` MUST equal the S_max the executor will be called with
    (pack_fields bakes the literal row base nout = ceil(S_max/128) into
    the tables); callers whose chunk set includes raw chunks larger than
    any Snappy chunk must pass it explicitly — the default infers it from
    the streams' decoded lengths alone.
    """
    if promote_max is None:
        promote_max = default_promote_max()
    if prefer_native and expected_lens is not None:
        try:
            from hap_tpu import native

            ops, n_ops, lit, n_lit, out_len, ok = native.snappy_optable_batch(
                streams, expected_lens, promote_max=promote_max)
            if S_max is None:
                S_max = max(int(out_len.max(initial=1)), 1)
            nout = -(-S_max // 128)
            for i in range(ops.shape[0]):
                k = int(n_ops[i])
                if k:
                    ops[i, :k] = pack_fields(ops[i, :k], nout)
            return PackedTables(ops=ops, n_ops=n_ops, lit=lit, n_lit=n_lit,
                                out_len=out_len, ok=ok, S_max=S_max)
        except Exception:
            pass  # toolchain unavailable -> Python reference below
    tables = []
    for i, s in enumerate(streams):
        exp = None if expected_lens is None else int(expected_lens[i])
        tables.append(build_op_table(s, exp, promote_max=promote_max))
    C = len(streams)
    n_max = max([t.ops.shape[0] for t in tables if t is not None] + [1])
    l_max = max([t.lit.shape[0] for t in tables if t is not None] + [1])
    if S_max is None:
        S_max = max([t.out_len for t in tables if t is not None] + [1])
    nout = -(-S_max // 128)
    ops = np.zeros((C, n_max, 2), np.int32)
    lit = np.zeros((C, l_max), np.uint8)
    n_ops = np.zeros(C, np.int32)
    n_lit = np.zeros(C, np.int32)
    out_len = np.zeros(C, np.int32)
    ok = np.zeros(C, bool)
    for i, t in enumerate(tables):
        if t is None:
            continue
        ok[i] = True
        n_ops[i] = t.ops.shape[0]
        ops[i, : t.ops.shape[0]] = pack_fields(t.ops, nout)
        n_lit[i] = t.lit.shape[0]
        lit[i, : t.lit.shape[0]] = t.lit
        out_len[i] = t.out_len
    return PackedTables(ops=ops, n_ops=n_ops, lit=lit, n_lit=n_lit,
                        out_len=out_len, ok=ok, S_max=S_max)


def execute_table_host(t: OpTable) -> bytes:
    """Scalar reference executor (the oracle for the Pallas kernel)."""
    out = np.zeros(t.out_len, np.uint8)
    op = 0
    lc = 0
    for w0, off in t.ops:
        m, end, off = int(w0) & 0xFF, int(w0) >> 8, int(off)
        assert 1 <= m <= 128 and (op & 127) + m <= 128, (m, op)
        assert end == (1 if ((op & 127) + m == 128) else 0)
        if off == 0:
            out[op:op + m] = t.lit[lc:lc + m]
            lc += m
        else:
            # m <= off: the piece never reads bytes it writes
            assert off >= m and off <= op, (m, off, op)
            out[op:op + m] = out[op - off:op - off + m]
        op += m
    assert op == t.out_len
    return out.tobytes()
