"""Snappy wire-format primitives: varints, length preamble, worst-case bound.

Format reference: the Snappy format description (normative external reference
[2] of the Hap spec, HapVideoDRAFT.md:23,146). A compressed stream is a
little-endian base-128 varint of the uncompressed length, followed by tagged
elements (literals and copies).
"""

from __future__ import annotations

from typing import Tuple

from hap_tpu.constants import HapError, HapResult

# Tag element types (low 2 bits of the tag byte).
TAG_LITERAL = 0
TAG_COPY1 = 1  # 1-byte offset extension: len 4-11, 11-bit offset
TAG_COPY2 = 2  # 2-byte offset
TAG_COPY4 = 3  # 4-byte offset


def read_varint(buf, offset: int = 0) -> Tuple[int, int]:
    """Read a little-endian base-128 varint. Returns (value, bytes_read)."""
    view = memoryview(buf)
    result = 0
    shift = 0
    pos = offset
    while True:
        if pos >= len(view) or shift > 32:
            raise HapError(HapResult.BAD_FRAME, "truncated/overlong snappy varint")
        b = view[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return result, pos - offset


def write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def uncompressed_length(buf) -> int:
    """snappy_uncompressed_length: parse the stream preamble (hap.c:813,890)."""
    value, _ = read_varint(buf, 0)
    return value


def max_compressed_length(source_len: int) -> int:
    """Worst-case compressed size; matches the bound the Snappy library

    publishes (32 + n + n/6) so buffer planning agrees with the reference's
    use of snappy_max_compressed_length (hap.c:313).
    """
    return 32 + source_len + source_len // 6
