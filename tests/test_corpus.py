"""Corpus conformance sweep — the stand-in for the official Hap test packs.

The reference's de-facto test strategy is corpus-based cross-implementation
conformance over seven downloadable packs (README.md:19-30; SURVEY.md §4).
Those packs are not available in this environment (zero egress), so this
module builds a synthetic corpus with the same diversity axes — every codec
family, odd dimensions, multiple chunk counts, content from flat to
incompressible, frames produced by three independent encoders (pure-Python,
native C++, device profile) — and sweeps bit-exact decode agreement across
all three decoders.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu import Compressor, TextureFormat
from hap_tpu import native
from hap_tpu import oracle
from hap_tpu.constants import CONSTANT_TO_FORMAT_ID, bytes_per_block
from hap_tpu.container.parse import (
    frame_texture_chunk_count,
    frame_texture_count,
    frame_texture_format,
    parse_frame,
)
from hap_tpu.container.serialize import serialize_texture
from hap_tpu.pipeline.codecs import _decode_texture_python
from hap_tpu.pipeline.device_frame import encode_frame_device


def content(kind: str, nbytes: int, g: int, rng) -> bytes:
    if kind == "flat":
        return bytes(nbytes)
    if kind == "periodic":
        return np.tile(rng.integers(0, 256, g, dtype=np.uint8), nbytes // g).tobytes()
    if kind == "random":
        return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    if kind == "mixed":
        half = nbytes // 2
        a = np.tile(rng.integers(0, 256, g, dtype=np.uint8), half // g + 1)[:half]
        b = rng.integers(0, 256, nbytes - half, dtype=np.uint8)
        return a.tobytes() + b.tobytes()
    if kind == "gradient":
        return (np.arange(nbytes, dtype=np.int64) % 251).astype(np.uint8).tobytes()
    raise ValueError(kind)


FORMATS = list(TextureFormat)
KINDS = ["flat", "periodic", "random", "mixed", "gradient"]


def corpus(rng):
    """Yield (label, frame_bytes, expected_payload, fmt)."""
    for fmt in FORMATS:
        g = bytes_per_block(fmt)
        for kind in KINDS:
            for blocks, chunks in [(60, 1), (1024, 7), (999, 4)]:
                payload = content(kind, blocks * g, g, rng)
                label = f"{fmt.name}/{kind}/b{blocks}c{chunks}"
                # encoder 1: pure python
                f_py = serialize_texture(payload, fmt, Compressor.SNAPPY, chunks)
                yield label + "/py", f_py, payload, fmt
                # encoder 2: native C++
                f_nat = native.encode([payload], [fmt], [1], [chunks])
                yield label + "/native", f_nat, payload, fmt
                # encoder 3: device profile (structured snappy)
                if kind != "random":  # keep runtime sane; random covered above
                    from hap_tpu.container.plan import legalize_chunk_count

                    cc = legalize_chunk_count(len(payload), fmt, chunks)
                    buf, flen = encode_frame_device(
                        jnp.asarray(np.frombuffer(payload, np.uint8)),
                        cc, CONSTANT_TO_FORMAT_ID[fmt], g,
                    )
                    yield (
                        label + "/device",
                        np.asarray(buf)[: int(flen)].tobytes(),
                        payload,
                        fmt,
                    )
                # encoder 4: the ACTUAL reference (real HapEncode +
                # real google snappy) — genuine foreign-encoder diversity
                if oracle.available():
                    f_ref = oracle.encode([payload], [int(fmt)], [1], [chunks])
                    yield label + "/oracle", f_ref, payload, fmt


def test_corpus_sweep(rng):
    n = 0
    for label, frame, payload, fmt in corpus(rng):
        # structural introspection agrees between implementations
        assert frame_texture_count(frame) == 1, label
        assert frame_texture_format(frame) == fmt, label
        assert native.get_texture_format(frame) == fmt, label
        assert (
            frame_texture_chunk_count(frame) == native.get_chunk_count(frame)
        ), label
        # bit-exact decode by both general decoders
        got_py = _decode_texture_python(frame, 0)
        got_nat, nat_fmt = native.decode(frame)
        assert got_py == payload, f"python decode mismatch: {label}"
        assert got_nat == payload and nat_fmt == fmt, f"native decode mismatch: {label}"
        # decoder 3: the ACTUAL reference HapDecode (hap.c:993)
        if oracle.available():
            got_ref, ref_fmt = oracle.decode(frame)
            assert got_ref == payload, f"real HapDecode mismatch: {label}"
            assert ref_fmt == int(fmt), label
        n += 1
    assert n >= 180, n  # the sweep actually ran


def test_python_and_native_encoders_bit_identical_across_corpus(rng):
    """Same-encoder-different-implementation frames must be byte-identical

    (both implement hap.c:355-504 around the same snappy algorithm)."""
    for fmt in (TextureFormat.RGB_DXT1, TextureFormat.YCoCg_DXT5):
        g = bytes_per_block(fmt)
        for kind in KINDS:
            payload = content(kind, 512 * g, g, rng)
            f_py = serialize_texture(payload, fmt, Compressor.SNAPPY, 8)
            f_nat = native.encode([payload], [fmt], [1], [8])
            assert f_py == f_nat, f"{fmt.name}/{kind}"


def test_large_frame_8byte_headers(rng):
    """>16MB section: 8-byte headers end-to-end (the 16K-frame container
    path, hap.c:391-405; README.md:25)."""
    nbytes = 17 * 1024 * 1024  # > kHapUInt24Max
    payload = content("mixed", nbytes, 16, rng)
    frame = native.encode([payload], [TextureFormat.RGBA_DXT5], [1], [64])
    from hap_tpu.container.sections import read_section_header

    hdr_len, sec_len, _ = read_section_header(frame)
    plan = parse_frame(frame)
    if plan.textures[0].stored_compressor == 0xC:
        assert hdr_len == 8  # compressed complex frame over 16MB input
    assert native.decode(frame)[0] == payload
    assert _decode_texture_python(frame, 0) == payload


def test_16k_frame_container(rng):
    """16K-frame scale (README.md:25): a full 16384x8640 Hap Q DXT payload
    (~141 MB, >16MB sections -> 8-byte headers, large chunk counts) through
    the native container+snappy path."""
    w, h = 16384, 8640
    nbytes = (w // 4) * (h // 4) * 16  # BC3 payload: 141.6 MB
    payload = np.tile(
        rng.integers(0, 256, 16, dtype=np.uint8), nbytes // 16
    ).tobytes()  # compressible at scale
    assert len(payload) == nbytes
    frame = native.encode([payload], [TextureFormat.YCoCg_DXT5], [1], [512])
    assert len(frame) < nbytes  # actually compressed
    from hap_tpu.container.sections import read_section_header

    hdr_len, sec_len, stype = read_section_header(frame)
    assert hdr_len == 8 and (stype >> 4) == 0xC
    assert native.get_chunk_count(frame) == 512
    out, fmt = native.decode(frame)
    assert out == payload and fmt == TextureFormat.YCoCg_DXT5
