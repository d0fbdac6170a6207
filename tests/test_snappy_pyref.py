"""Snappy pure-Python codec: format round-trips and strictness."""

import numpy as np
import pytest

from hap_tpu.constants import HapError
from hap_tpu.snappy import format as sfmt
from hap_tpu.snappy import pyref


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 0xFFFF, 0xFFFFFF, 0xFFFFFFFF]:
        data = sfmt.write_varint(v)
        got, nbytes = sfmt.read_varint(data)
        assert got == v and nbytes == len(data)


@pytest.mark.parametrize("n", [0, 1, 3, 59, 60, 61, 100, 1000, 65536, 70000])
def test_roundtrip_random(rng, n):
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    comp = pyref.compress(data)
    assert pyref.decompress(comp) == data
    assert sfmt.uncompressed_length(comp) == n


@pytest.mark.parametrize("n", [10, 1000, 65536, 200000])
def test_roundtrip_compressible(rng, n):
    # Highly repetitive data exercises the copy paths incl. overlapping copies.
    base = rng.integers(0, 4, max(1, n // 50), dtype=np.uint8).tobytes()
    data = (base * (n // max(1, len(base)) + 1))[:n]
    comp = pyref.compress(data)
    if n >= 1000:
        assert len(comp) < n  # must actually compress
    assert pyref.decompress(comp) == data


def test_roundtrip_runs():
    # Single-byte runs: RLE via offset-1 overlapping copies.
    data = b"\x00" * 100000 + b"ab" * 500 + b"\xff" * 3
    comp = pyref.compress(data)
    # Snappy copies cap at 64 bytes (~3 bytes per 64 emitted), so ~20x is
    # the format's best case on runs.
    assert len(comp) < len(data) // 15
    assert pyref.decompress(comp) == data


def test_roundtrip_text():
    data = (b"the quick brown fox jumps over the lazy dog. " * 400)[:-7]
    assert pyref.decompress(pyref.compress(data)) == data


def test_decompress_rejects_truncated(rng):
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    comp = pyref.compress(data)
    for cut in [1, len(comp) // 2, len(comp) - 1]:
        with pytest.raises(HapError):
            pyref.decompress(comp[:cut])


def test_decompress_rejects_bad_offset():
    # Stream: length=4, copy1 with offset 0 (invalid).
    bad = sfmt.write_varint(4) + bytes([(0 << 2) | 1, 0])
    with pytest.raises(HapError):
        pyref.decompress(bad)


def test_decompress_rejects_wrong_expected_length(rng):
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    comp = pyref.compress(data)
    with pytest.raises(HapError):
        pyref.decompress(comp, expected_length=65)


def test_literal_length_encodings():
    # Exercise 1- and 2-byte extended literal lengths (len-1 >= 60).
    for n in [61, 256, 257, 65537]:
        data = bytes(range(256)) * (n // 256 + 1)
        data = data[:n]
        comp = pyref.compress(data)
        assert pyref.decompress(comp) == data
