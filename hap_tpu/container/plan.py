"""Chunk planning and worst-case size estimation.

These reproduce, decision-for-decision, the planning logic of the reference
encoder (hap.c:263-353), because the decisions (chunk legalization, header
length choice, worst-case bounds) shape the exact bytes of encoded frames and
the static shapes the jitted device pipeline compiles against.
"""

from __future__ import annotations

from typing import Sequence

from hap_tpu.constants import (
    MAX_CHUNK_COUNT,
    TextureFormat,
    bytes_per_block,
)


def decode_instructions_length(chunk_count: int) -> int:
    """Byte length of a Decode Instructions Container body for N chunks.

    = compressor table (N bytes) + size table (4N bytes) + two 4-byte section
    headers (hap.c:265-275). The container itself never stores an offset
    table when encoding (the reference encoder omits it; decoders must
    accept frames that have one).
    """
    return 5 * chunk_count + 8


def legalize_chunk_count(input_bytes: int, texture_format: int, chunk_count: int) -> int:
    """Silently adjust a requested chunk count to a legal value.

    Matches hap.c:277-300: cap at MAX_CHUNK_COUNT (24-bit header limit), then
    decrement until the DXT block count divides evenly. Block = 8 bytes for
    BC1/BC4, 16 otherwise. The stored frame records the outcome, so this rule
    is part of the wire contract for bit-exact encoding.
    """
    if chunk_count > MAX_CHUNK_COUNT:
        chunk_count = MAX_CHUNK_COUNT
    block_count = input_bytes // bytes_per_block(texture_format)
    # Equivalent to the reference's decrement loop but O(1)-ish: the largest
    # divisor of block_count that is <= chunk_count is found by walking down;
    # we keep the simple loop for exact parity (it is fast in practice since
    # block counts are highly composite for real frames).
    while block_count % chunk_count != 0:
        chunk_count -= 1
    return chunk_count


def snappy_max_compressed_length(source_len: int) -> int:
    """Worst-case Snappy output size for ``source_len`` input bytes.

    This is the bound published by the Snappy library
    (32 + source_len + source_len/6); our native codec guarantees it. Used
    for static device buffer shapes and encode buffer sizing, mirroring the
    reference's use of snappy_max_compressed_length (hap.c:313).
    """
    return 32 + source_len + source_len // 6


def max_encoded_length_single(
    input_bytes: int, texture_format: int, compressor_is_snappy: bool, chunk_count: int
) -> int:
    """Worst-case encoded size of one texture (hap.c:302-322)."""
    chunk_count = legalize_chunk_count(input_bytes, texture_format, chunk_count)
    dil = decode_instructions_length(chunk_count)
    if compressor_is_snappy:
        chunk_size = input_bytes // chunk_count
        max_compressed = snappy_max_compressed_length(chunk_size) * chunk_count
    else:
        max_compressed = input_bytes
    # top section header (8 worst case) + decode-instructions section header
    # (4) + instructions + compressed data
    return max_compressed + 8 + dil + 4


def max_encoded_length(
    lengths: Sequence[int],
    texture_formats: Sequence[int],
    chunk_counts: Sequence[int],
) -> int:
    """Worst-case whole-frame encoded size (HapMaxEncodedLength, hap.c:324-353).

    Returns 0 on bad arguments, exactly like the reference.
    """
    count = len(lengths)
    if count == 0 or count > 2 or len(texture_formats) != count or len(chunk_counts) != count:
        return 0
    total = 8  # multiple-image section header allowance, always added
    for n, fmt, cc in zip(lengths, texture_formats, chunk_counts):
        if cc == 0:
            return 0
        # Always assume Snappy — the worst case (hap.c:348-349).
        total += max_encoded_length_single(n, fmt, True, cc)
    return total


def dxt_payload_bytes(width: int, height: int, texture_format: int) -> int:
    """Size in bytes of the block-compressed payload for a W×H frame.

    Blocks cover ceil(W/4)×ceil(H/4) 4×4 texel tiles (S3TC layout; edge
    blocks are padded — the 'Odd Dimensions' cases in the reference test
    packs, README.md:24).
    """
    bw = (width + 3) // 4
    bh = (height + 3) // 4
    return bw * bh * bytes_per_block(texture_format)
