"""Container codec: section headers, plans, serialization round-trips."""

import numpy as np
import pytest

from hap_tpu import Compressor, HapError, TextureFormat
from hap_tpu.constants import (
    CHUNK_COMPRESSOR_NONE,
    CHUNK_COMPRESSOR_SNAPPY,
    COMPRESSOR_COMPLEX,
    COMPRESSOR_NONE,
)
from hap_tpu.container import (
    frame_texture_chunk_count,
    frame_texture_count,
    frame_texture_format,
    legalize_chunk_count,
    max_encoded_length,
    parse_frame,
    read_section_header,
    serialize_frame,
    serialize_texture,
    write_section_header,
)
from hap_tpu.snappy import pyref


def decode_frame(frame: bytes, index: int = 0) -> bytes:
    """Reference-shaped decode using the plan + pyref snappy (host oracle)."""
    plan = parse_frame(frame)
    tex = plan.textures[index]
    out = bytearray(tex.decoded_bytes)
    for i in range(tex.chunk_count):
        off = int(tex.chunk_compressed_offsets[i])
        csize = int(tex.chunk_compressed_sizes[i])
        uoff = int(tex.chunk_uncompressed_offsets[i])
        usize = int(tex.chunk_uncompressed_sizes[i])
        blob = frame[off : off + csize]
        if tex.chunk_compressors[i] == CHUNK_COMPRESSOR_SNAPPY:
            out[uoff : uoff + usize] = pyref.decompress(blob, expected_length=usize)
        else:
            out[uoff : uoff + usize] = blob
    return bytes(out)


# ---------------------------------------------------------------------------
# Section headers
# ---------------------------------------------------------------------------

def test_section_header_4byte_roundtrip():
    hdr = write_section_header(4, 1234, 0xCB)
    assert len(hdr) == 4
    h, l, t = read_section_header(hdr + b"\0" * 1234)
    assert (h, l, t) == (4, 1234, 0xCB)


def test_section_header_8byte_roundtrip():
    hdr = write_section_header(8, 0x1000000, 0xAE)
    assert len(hdr) == 8
    buf = hdr + b"\0" * 0x1000000
    h, l, t = read_section_header(buf)
    assert (h, l, t) == (8, 0x1000000, 0xAE)


def test_section_header_boundary_at_uint24():
    # 0xFFFFFF fits a 4-byte header; one more byte needs the 8-byte form.
    hdr = write_section_header(4, 0xFFFFFF, 0x01)
    h, l, _ = read_section_header(hdr + b"\0" * 0xFFFFFF)
    assert (h, l) == (4, 0xFFFFFF)
    with pytest.raises(HapError):
        write_section_header(4, 0x1000000, 0x01)


def test_section_header_truncated():
    with pytest.raises(HapError):
        read_section_header(b"\x01\x00")
    with pytest.raises(HapError):
        read_section_header(b"\x00\x00\x00\x01")  # 8-byte form but only 4 bytes
    with pytest.raises(HapError):
        read_section_header(b"\x05\x00\x00\x01\x00")  # body extends past end


# ---------------------------------------------------------------------------
# Chunk legalization
# ---------------------------------------------------------------------------

def test_legalize_chunk_count_divides_blocks():
    # 1920x1080 BC1: 480*270 blocks = 129600 blocks, 8B each.
    nbytes = 480 * 270 * 8
    for req in [1, 2, 3, 7, 16, 1000]:
        cc = legalize_chunk_count(nbytes, TextureFormat.RGB_DXT1, req)
        assert cc <= req
        assert (nbytes // 8) % cc == 0


def test_legalize_chunk_count_prime_blocks():
    # 13 blocks of 16 bytes: only 13 and 1 divide.
    nbytes = 13 * 16
    assert legalize_chunk_count(nbytes, TextureFormat.RGBA_DXT5, 12) == 1
    assert legalize_chunk_count(nbytes, TextureFormat.RGBA_DXT5, 13) == 13


def test_max_encoded_length_bad_args():
    assert max_encoded_length([], [], []) == 0
    assert max_encoded_length([100], [TextureFormat.RGB_DXT1], [0]) == 0
    assert max_encoded_length([1, 2, 3], [1, 2, 3], [1, 1, 1]) == 0


# ---------------------------------------------------------------------------
# Single-texture encode/parse/decode round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chunk_count", [1, 4, 9])
def test_roundtrip_compressible(rng, chunk_count):
    # Compressible DXT-like payload: repetitive 8-byte blocks.
    blocks = rng.integers(0, 8, (36, 8), dtype=np.uint8)
    data = np.tile(blocks, (100, 1)).reshape(-1).tobytes()  # 3600 blocks
    frame = serialize_texture(
        data, TextureFormat.RGB_DXT1, Compressor.SNAPPY, chunk_count
    )
    plan = parse_frame(frame)
    tex = plan.textures[0]
    assert tex.stored_compressor == COMPRESSOR_COMPLEX
    assert tex.chunk_count == chunk_count
    assert frame_texture_chunk_count(frame) == chunk_count
    assert decode_frame(frame) == data
    assert len(frame) <= max_encoded_length([len(data)], [TextureFormat.RGB_DXT1], [chunk_count])


def test_roundtrip_incompressible_falls_back_raw(rng):
    data = rng.integers(0, 256, 640 * 8, dtype=np.uint8).tobytes()
    frame = serialize_texture(data, TextureFormat.RGB_DXT1, Compressor.SNAPPY, 4)
    plan = parse_frame(frame)
    # Whole-frame fallback: stored uncompressed (hap.c:478-495).
    assert plan.textures[0].stored_compressor == COMPRESSOR_NONE
    assert decode_frame(frame) == data


def test_roundtrip_none_compressor(rng):
    data = rng.integers(0, 256, 160, dtype=np.uint8).tobytes()
    frame = serialize_texture(data, TextureFormat.RGBA_DXT5, Compressor.NONE, 1)
    plan = parse_frame(frame)
    assert plan.textures[0].stored_compressor == COMPRESSOR_NONE
    assert frame_texture_format(frame) == TextureFormat.RGBA_DXT5
    assert decode_frame(frame) == data


def test_mixed_chunk_compressors(rng):
    # First half zeros (compressible), second half random (raw fallback).
    comp = b"\0" * (512 * 8)
    rnd = rng.integers(0, 256, 512 * 8, dtype=np.uint8).tobytes()
    data = comp + rnd
    frame = serialize_texture(data, TextureFormat.RGB_DXT1, Compressor.SNAPPY, 2)
    tex = parse_frame(frame).textures[0]
    assert tex.stored_compressor == COMPRESSOR_COMPLEX
    assert list(tex.chunk_compressors) == [CHUNK_COMPRESSOR_SNAPPY, CHUNK_COMPRESSOR_NONE]
    assert decode_frame(frame) == data


@pytest.mark.parametrize("fmt", list(TextureFormat))
def test_all_formats_roundtrip(fmt):
    data = bytes(range(256)) * 16  # 4096 bytes, divisible by 8 and 16
    frame = serialize_texture(data, fmt, Compressor.SNAPPY, 2)
    assert frame_texture_format(frame) == fmt
    assert decode_frame(frame) == data


# ---------------------------------------------------------------------------
# Multi-image frames
# ---------------------------------------------------------------------------

def test_multi_image_roundtrip():
    color = bytes(range(64)) * 64  # YCoCg DXT5 payload
    alpha = bytes(range(32)) * 64  # RGTC1 payload
    frame = serialize_frame(
        [color, alpha],
        [TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1],
        [Compressor.SNAPPY, Compressor.SNAPPY],
        [2, 2],
    )
    assert frame_texture_count(frame) == 2
    assert frame_texture_format(frame, 0) == TextureFormat.YCoCg_DXT5
    assert frame_texture_format(frame, 1) == TextureFormat.A_RGTC1
    assert decode_frame(frame, 0) == color
    assert decode_frame(frame, 1) == alpha


def test_multi_image_rejects_bad_combination():
    with pytest.raises(HapError):
        serialize_frame(
            [b"\0" * 64, b"\0" * 64],
            [TextureFormat.RGB_DXT1, TextureFormat.RGBA_DXT5],
        )


def test_multi_image_loose_combination_check():
    # The reference accepts RGTC1 + DXT1 (only *one* of YCoCg/RGTC1 needed,
    # hap.c:551-559) — parity with that looseness.
    frame = serialize_frame(
        [b"\x11" * 64, b"\x22" * 64],
        [TextureFormat.A_RGTC1, TextureFormat.RGB_DXT1],
    )
    assert frame_texture_count(frame) == 2


def test_single_texture_index_bounds(rng):
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    frame = serialize_texture(data, TextureFormat.RGB_DXT1, Compressor.NONE)
    with pytest.raises(HapError):
        frame_texture_format(frame, 1)
    with pytest.raises(HapError):
        frame_texture_format(frame, 2)


# ---------------------------------------------------------------------------
# Decoder robustness: offset tables, unknown sections, malformed frames
# ---------------------------------------------------------------------------

def _build_complex_frame_with_offsets(chunks, fmt_id=0xB, extra_section=False,
                                      shuffle=False):
    """Hand-build a Complex frame with an explicit Chunk Offset Table

    (the reference encoder never writes one, but decoders must accept it,
    hap.c:697-699 / spec HapVideoDRAFT.md:103).
    """
    from hap_tpu.container.sections import write_section_header

    comp_table = bytes(
        CHUNK_COMPRESSOR_SNAPPY if c["snappy"] else CHUNK_COMPRESSOR_NONE
        for c in chunks
    )
    payloads = [c["payload"] for c in chunks]
    sizes = b"".join(len(p).to_bytes(4, "little") for p in payloads)
    order = list(range(len(chunks)))
    if shuffle:
        order = order[::-1]
    offsets = {}
    pos = 0
    for i in order:
        offsets[i] = pos
        pos += len(payloads[i])
    offset_table = b"".join(offsets[i].to_bytes(4, "little") for i in range(len(chunks)))
    frame_data = bytearray(pos)
    for i in order:
        frame_data[offsets[i] : offsets[i] + len(payloads[i])] = payloads[i]

    body = bytearray()
    body += write_section_header(4, len(comp_table), 0x02)
    body += comp_table
    body += write_section_header(4, len(sizes), 0x03)
    body += sizes
    body += write_section_header(4, len(offset_table), 0x04)
    body += offset_table
    if extra_section:
        body += write_section_header(4, 3, 0x7F)  # unknown type: must be skipped
        body += b"xyz"
    dic = write_section_header(4, len(body), 0x01) + bytes(body)
    top = dic + bytes(frame_data)
    return write_section_header(4, len(top), (COMPRESSOR_COMPLEX << 4) | fmt_id) + top


def test_decode_with_offset_table_and_unknown_section(rng):
    a = rng.integers(0, 4, 256, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    chunks = [
        {"snappy": True, "payload": pyref.compress(a)},
        {"snappy": False, "payload": b},
    ]
    frame = _build_complex_frame_with_offsets(chunks, extra_section=True)
    assert decode_frame(frame) == a + b
    assert frame_texture_chunk_count(frame) == 2


def test_decode_with_shuffled_offset_table(rng):
    # Offset table permits chunks stored out of order.
    a = rng.integers(0, 4, 256, dtype=np.uint8).tobytes()
    b = rng.integers(0, 4, 512, dtype=np.uint8).tobytes()
    chunks = [
        {"snappy": True, "payload": pyref.compress(a)},
        {"snappy": True, "payload": pyref.compress(b)},
    ]
    frame = _build_complex_frame_with_offsets(chunks, shuffle=True)
    assert decode_frame(frame) == a + b


def test_malformed_frames_raise(rng):
    with pytest.raises(HapError):
        parse_frame(b"")
    with pytest.raises(HapError):
        parse_frame(b"\x01\x00")
    # Unknown format nibble
    bad = write_section_header(4, 4, (COMPRESSOR_NONE << 4) | 0x0) + b"\0\0\0\0"
    with pytest.raises(HapError):
        parse_frame(bad)
    # Truncated section body
    with pytest.raises(HapError):
        parse_frame(write_section_header(4, 100, 0xAB) + b"\0" * 10)


def test_chunk_count_mismatch_rejected():
    from hap_tpu.container.sections import write_section_header as w

    body = bytearray()
    body += w(4, 2, 0x02) + bytes([0x0A, 0x0A])  # 2 chunks
    body += w(4, 4, 0x03) + (4).to_bytes(4, "little")  # 1 chunk -> mismatch
    dic = w(4, len(body), 0x01) + bytes(body)
    top = dic + b"\0" * 4
    frame = w(4, len(top), 0xCB) + top
    with pytest.raises(HapError):
        parse_frame(frame)


def test_8byte_header_large_frame():
    # >16MB section exercises the 8-byte header path (hap.c:391-405).
    data = b"\0" * (17 * 1024 * 1024)
    frame = serialize_texture(data, TextureFormat.RGB_DXT1, Compressor.NONE)
    h, l, t = read_section_header(frame)
    assert h == 8 and l == len(data)
    assert decode_frame(frame) == data
