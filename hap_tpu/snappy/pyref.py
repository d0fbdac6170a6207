"""Pure-Python Snappy codec — the portable test oracle.

Implements the Snappy format from its public format description (normative
reference [2] of the Hap spec). This is the slow-but-obviously-correct
implementation that the native C++ codec and the on-device decoder are
differentially tested against. Decompression is strict: any malformed stream
raises HapError(BAD_FRAME), mirroring the reference's SNAPPY_INVALID_INPUT →
HapResult_Bad_Frame mapping (hap.c:619-620).
"""

from __future__ import annotations

from hap_tpu.constants import HapError, HapResult
from hap_tpu.snappy.format import (
    TAG_COPY1,
    TAG_COPY2,
    TAG_COPY4,
    TAG_LITERAL,
    read_varint,
    write_varint,
)

_BLOCK_SIZE = 65536  # matching snappy's kBlockSize: matches never cross 64KB input blocks
_MAX_HASH_BITS = 14


def decompress(data, expected_length: int | None = None) -> bytes:
    """Decode one Snappy stream. Returns the uncompressed bytes.

    If ``expected_length`` is given, the preamble must match it.
    """
    view = memoryview(data)
    n = len(view)
    out_len, pos = read_varint(view, 0)
    if expected_length is not None and out_len != expected_length:
        raise HapError(HapResult.BAD_FRAME, "snappy preamble length mismatch")
    out = bytearray(out_len)
    op = 0  # write position in out
    while pos < n:
        tag = view[pos]
        pos += 1
        kind = tag & 0x3
        if kind == TAG_LITERAL:
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60  # 1..4 trailing length bytes
                if pos + extra > n:
                    raise HapError(HapResult.BAD_FRAME, "truncated literal length")
                length = int.from_bytes(view[pos : pos + extra], "little") + 1
                pos += extra
            if pos + length > n or op + length > out_len:
                raise HapError(HapResult.BAD_FRAME, "literal overruns buffer")
            out[op : op + length] = view[pos : pos + length]
            pos += length
            op += length
            continue
        if kind == TAG_COPY1:
            if pos + 1 > n:
                raise HapError(HapResult.BAD_FRAME, "truncated copy1")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | view[pos]
            pos += 1
        elif kind == TAG_COPY2:
            if pos + 2 > n:
                raise HapError(HapResult.BAD_FRAME, "truncated copy2")
            length = (tag >> 2) + 1
            offset = view[pos] | (view[pos + 1] << 8)
            pos += 2
        else:  # TAG_COPY4
            if pos + 4 > n:
                raise HapError(HapResult.BAD_FRAME, "truncated copy4")
            length = (tag >> 2) + 1
            offset = int.from_bytes(view[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > op or op + length > out_len:
            raise HapError(HapResult.BAD_FRAME, "bad copy offset/length")
        # Overlapping copies replicate earlier output byte-by-byte.
        if offset >= length:
            out[op : op + length] = out[op - offset : op - offset + length]
        else:
            src = op - offset
            for i in range(length):
                out[op + i] = out[src + i]
        op += length
    if op != out_len:
        raise HapError(HapResult.BAD_FRAME, "snappy stream ended short")
    return bytes(out)


def _hash(u32: int, shift: int) -> int:
    return ((u32 * 0x1E35A7BD) & 0xFFFFFFFF) >> shift


def _emit_literal(out: bytearray, data: memoryview, start: int, length: int) -> None:
    n = length - 1
    if n < 60:
        out.append((n << 2) | TAG_LITERAL)
    elif n < (1 << 8):
        out.append((60 << 2) | TAG_LITERAL)
        out.append(n)
    elif n < (1 << 16):
        out.append((61 << 2) | TAG_LITERAL)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append((62 << 2) | TAG_LITERAL)
        out += n.to_bytes(3, "little")
    else:
        out.append((63 << 2) | TAG_LITERAL)
        out += n.to_bytes(4, "little")
    out += data[start : start + length]


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # Long copies are split into <=64-byte elements; a 1-byte-offset copy is
    # used when possible (4<=len<=11, offset<2048).
    while length >= 68:
        _emit_copy_upto64(out, offset, 64)
        length -= 64
    if length > 64:
        _emit_copy_upto64(out, offset, 60)
        length -= 60
    _emit_copy_upto64(out, offset, length)


def _emit_copy_upto64(out: bytearray, offset: int, length: int) -> None:
    if length >= 4 and length < 12 and offset < 2048:
        out.append(TAG_COPY1 | ((length - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    elif offset < 65536:
        out.append(TAG_COPY2 | ((length - 1) << 2))
        out += offset.to_bytes(2, "little")
    else:
        out.append(TAG_COPY4 | ((length - 1) << 2))
        out += offset.to_bytes(4, "little")


def compress(data) -> bytes:
    """Encode one Snappy stream (greedy hash matcher over 64KB blocks)."""
    view = memoryview(data)
    n = len(view)
    out = bytearray(write_varint(n))
    for block_start in range(0, n, _BLOCK_SIZE):
        _compress_block(out, view, block_start, min(n - block_start, _BLOCK_SIZE))
    return bytes(out)


def _compress_block(out: bytearray, data: memoryview, base: int, size: int) -> None:
    if size < 15:  # too small to find 4-byte matches profitably
        _emit_literal(out, data, base, size)
        return
    table_bits = 8
    while (1 << table_bits) < size and table_bits < _MAX_HASH_BITS:
        table_bits += 1
    shift = 32 - table_bits
    table = [0] * (1 << table_bits)  # stores (pos - base) + 1; 0 = empty
    end = base + size
    limit = end - 4  # last position a 4-byte match can start
    ip = base
    lit_start = base
    u32 = int.from_bytes(data[ip : ip + 4], "little")
    while True:
        # Scan for a match, skipping faster the longer we fail (snappy's
        # 32-step skip heuristic keeps incompressible data near memcpy speed).
        skip = 32
        candidate = -1
        while True:
            h = _hash(u32, shift)
            candidate = table[h] - 1
            table[h] = (ip - base) + 1
            if candidate >= 0 and int.from_bytes(
                data[base + candidate : base + candidate + 4], "little"
            ) == u32:
                candidate += base
                break
            bytes_between = skip >> 5
            skip += 1
            ip += bytes_between
            if ip > limit:
                if lit_start < end:
                    _emit_literal(out, data, lit_start, end - lit_start)
                return
            u32 = int.from_bytes(data[ip : ip + 4], "little")
        # Emit pending literal then extend the match.
        if ip > lit_start:
            _emit_literal(out, data, lit_start, ip - lit_start)
        match_len = 4
        while ip + match_len < end and data[ip + match_len] == data[candidate + match_len]:
            match_len += 1
        _emit_copy(out, ip - candidate, match_len)
        ip += match_len
        lit_start = ip
        if ip > limit:
            if lit_start < end:
                _emit_literal(out, data, lit_start, end - lit_start)
            return
        u32 = int.from_bytes(data[ip : ip + 4], "little")
