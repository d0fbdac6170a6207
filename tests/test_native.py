"""Differential tests: native C++ runtime vs pure-Python implementations.

The two implementations share no code (C++ from the spec + survey; Python
from the spec + survey), so byte-identical output catches divergence between
them — but both are same-author, so agreement alone does not prove reference
conformance. That proof lives in tests/test_oracle.py, which runs the ACTUAL
reference hap.c + system google snappy against both.
"""

import numpy as np
import pytest

from hap_tpu import Compressor, HapError, TextureFormat
from hap_tpu import native
from hap_tpu.container import (
    frame_texture_chunk_count,
    frame_texture_count,
    frame_texture_format,
    max_encoded_length,
    parse_frame,
    serialize_frame,
    serialize_texture,
)
from hap_tpu.pipeline.codecs import _decode_texture_python
from hap_tpu.snappy import pyref


@pytest.fixture(scope="module", autouse=True)
def lib():
    return native.load()


def make_payload(rng, nbytes, compressible=True):
    if compressible:
        base = rng.integers(0, 6, max(8, nbytes // 64), dtype=np.uint8).tobytes()
        return (base * (nbytes // len(base) + 1))[:nbytes]
    return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Snappy differential
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,compressible", [
    (0, True), (1, True), (100, True), (4096, True), (65536, True),
    (65537, True), (300000, True), (4096, False), (100000, False),
])
def test_snappy_encoders_byte_identical(rng, n, compressible):
    data = make_payload(rng, n, compressible)
    assert native.snappy_compress(data) == pyref.compress(data)


def test_snappy_cross_decode(rng):
    data = make_payload(rng, 50000)
    comp = pyref.compress(data)
    assert native.snappy_uncompress(comp) == data
    assert pyref.decompress(native.snappy_compress(data)) == data


def test_snappy_native_rejects_malformed(rng):
    data = make_payload(rng, 1000)
    comp = native.snappy_compress(data)
    with pytest.raises(HapError):
        native.snappy_uncompress(comp[: len(comp) // 2])
    with pytest.raises(HapError):
        native.snappy_uncompress(b"\x04" + bytes([(0 << 2) | 1, 0]))  # offset 0


# ---------------------------------------------------------------------------
# Container differential: native encode == python serialize, byte-identical
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt,chunks,compressible", [
    (TextureFormat.RGB_DXT1, 1, True),
    (TextureFormat.RGB_DXT1, 4, True),
    (TextureFormat.RGBA_DXT5, 7, True),
    (TextureFormat.YCoCg_DXT5, 16, True),
    (TextureFormat.A_RGTC1, 3, True),
    (TextureFormat.RGB_DXT1, 4, False),  # whole-frame raw fallback
    (TextureFormat.RGBA_BPTC_UNORM, 2, True),
    (TextureFormat.RGB_BPTC_UNSIGNED_FLOAT, 2, True),
    (TextureFormat.RGB_BPTC_SIGNED_FLOAT, 1, True),
])
def test_encode_byte_identical(rng, fmt, chunks, compressible):
    nblocks = 1024
    bs = 8 if fmt in (TextureFormat.RGB_DXT1, TextureFormat.A_RGTC1) else 16
    data = make_payload(rng, nblocks * bs, compressible)
    frame_native = native.encode([data], [fmt], [1], [chunks])
    frame_python = serialize_texture(data, fmt, Compressor.SNAPPY, chunks)
    assert frame_native == frame_python
    # Both decoders reproduce the input.
    out, got_fmt = native.decode(frame_native)
    assert out == data and got_fmt == fmt
    assert _decode_texture_python(frame_native, 0) == data


def test_encode_none_compressor_identical(rng):
    data = make_payload(rng, 512 * 8, False)
    f_native = native.encode([data], [TextureFormat.RGB_DXT1], [0], [1])
    f_python = serialize_texture(data, TextureFormat.RGB_DXT1, Compressor.NONE, 1)
    assert f_native == f_python


def test_multi_image_byte_identical(rng):
    color = make_payload(rng, 256 * 16)
    alpha = make_payload(rng, 256 * 8)
    fmts = [TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1]
    f_native = native.encode([color, alpha], fmts, [1, 1], [4, 4])
    f_python = serialize_frame(
        [color, alpha], fmts, [Compressor.SNAPPY] * 2, [4, 4]
    )
    assert f_native == f_python
    # Cross-decode both textures both ways.
    assert native.decode(f_python, 0)[0] == color
    assert native.decode(f_python, 1)[0] == alpha
    assert _decode_texture_python(f_native, 0) == color
    assert _decode_texture_python(f_native, 1) == alpha


def test_introspection_parity(rng):
    data = make_payload(rng, 512 * 8)
    frame = native.encode([data], [TextureFormat.RGB_DXT1], [1], [8])
    assert native.get_texture_count(frame) == frame_texture_count(frame) == 1
    assert (
        native.get_texture_format(frame)
        == frame_texture_format(frame)
        == TextureFormat.RGB_DXT1
    )
    assert native.get_chunk_count(frame) == frame_texture_chunk_count(frame) == 8


def test_max_encoded_length_parity():
    for lengths, fmts, ccs in [
        ([1036800], [TextureFormat.RGB_DXT1], [4]),
        ([2073600, 1036800], [TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1], [16, 16]),
    ]:
        assert native.max_encoded_length(lengths, fmts, ccs) == max_encoded_length(
            lengths, fmts, ccs
        )
    assert native.max_encoded_length([100], [TextureFormat.RGB_DXT1], [0]) == 0


def test_native_decode_rejects_malformed():
    with pytest.raises(HapError):
        native.decode(b"\x05\x00\x00\xab", output_size_hint=64)
    # Unknown compressor nibble 0xD
    from hap_tpu.container.sections import write_section_header

    bad = write_section_header(4, 4, 0xDB) + b"\0\0\0\0"
    with pytest.raises(HapError):
        native.decode(bad, output_size_hint=64)


def test_fuzz_parse_no_crash(rng):
    """Malformed random frames must error cleanly, never crash, in both

    implementations, and they must agree on accept/reject."""
    for trial in range(300):
        n = int(rng.integers(0, 64))
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        py_err = nat_err = False
        try:
            parse_frame(buf)
        except HapError:
            py_err = True
        try:
            native.get_texture_format(buf)
        except HapError:
            nat_err = True
        if py_err != nat_err:
            # parse_frame validates more than get_texture_format (it parses
            # decode instructions); only flag the stricter direction.
            assert py_err and not nat_err, f"native stricter than python on {buf!r}"


def test_fuzz_mutated_frames(rng):
    """Bit-flip valid frames; decoders must never crash or disagree wildly."""
    data = make_payload(rng, 256 * 8)
    frame = bytearray(native.encode([data], [TextureFormat.RGB_DXT1], [1], [4]))
    for trial in range(200):
        mutated = bytearray(frame)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        mutated = bytes(mutated)
        try:
            out_n, _ = native.decode(mutated, output_size_hint=len(data) * 2)
        except HapError:
            out_n = None
        try:
            out_p = _decode_texture_python(mutated, 0)
        except HapError:
            out_p = None
        except Exception as e:  # numpy slicing errors etc. are bugs
            raise AssertionError(f"python decoder crashed non-HapError: {e}")
        # If both succeeded they must agree byte-for-byte.
        if out_n is not None and out_p is not None:
            assert out_n == out_p
