"""Differential tests against the ACTUAL reference codec.

hap_tpu.oracle compiles /root/reference/source/hap.c in place (with the
system google-snappy, /lib/x86_64-linux-gnu/libsnappy.so.1 — the exact C ABI
hap.c:32 consumes) so every claim of the form "bit-exact vs the reference" is
established against the real HapEncode (hap.c:506) / HapDecode (hap.c:993) /
HapMaxEncodedLength (hap.c:324) / introspection trio (hap.c:1042-1188), not
against same-author reimplementations agreeing with each other.

Three directions are covered:
  (a) frames from all three of our encoders decode bit-exactly via the real
      HapDecode (serial and threaded callback);
  (b) real-HapEncode frames (real google-snappy chunk streams) decode
      bit-exactly via all three of our decoders, including the device
      general Snappy kernel;
  (c) max_encoded_length and the introspection trio match the real functions
      over randomized sweeps.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu import oracle
from hap_tpu import native
from hap_tpu.constants import (
    CONSTANT_TO_FORMAT_ID,
    Compressor,
    TextureFormat,
    bytes_per_block,
)
from hap_tpu.container.parse import (
    frame_texture_chunk_count,
    frame_texture_count,
    frame_texture_format,
)
from hap_tpu.container.plan import legalize_chunk_count, max_encoded_length
from hap_tpu.container.serialize import serialize_frame, serialize_texture
from hap_tpu.pipeline.codecs import _decode_texture_python
from hap_tpu.pipeline.device_frame import encode_frame_device

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference source or system snappy missing"
)


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


KINDS = ["flat", "periodic", "random", "mixed", "gradient"]
FORMATS = list(TextureFormat)


# ---------------------------------------------------------------------------
# (a) our encoders -> real HapDecode
# ---------------------------------------------------------------------------

def test_our_encoders_decode_via_real_hapdecode(rng):
    """Every frame our encoders emit must be accepted bit-exactly by the
    real reference decoder (hap.c:993) — all formats, content classes,
    chunk counts, and both compressors."""
    n = 0
    for fmt in FORMATS:
        g = bytes_per_block(fmt)
        for kind in KINDS:
            for blocks, chunks in [(60, 1), (1024, 7), (999, 4)]:
                payload = content(kind, blocks * g, g, rng)
                frames = {
                    "py-snappy": serialize_texture(
                        payload, fmt, Compressor.SNAPPY, chunks),
                    "py-none": serialize_texture(
                        payload, fmt, Compressor.NONE, 1),
                    "native": native.encode([payload], [fmt], [1], [chunks]),
                }
                if kind != "random":  # device profile; random = raw fallback
                    cc = legalize_chunk_count(len(payload), fmt, chunks)
                    buf, flen = encode_frame_device(
                        jnp.asarray(np.frombuffer(payload, np.uint8)),
                        cc, CONSTANT_TO_FORMAT_ID[fmt], g,
                    )
                    frames["device"] = np.asarray(buf)[: int(flen)].tobytes()
                for name, frame in frames.items():
                    got, ofmt = oracle.decode(frame)
                    assert got == payload, f"{fmt.name}/{kind}/c{chunks}/{name}"
                    assert ofmt == int(fmt), f"{fmt.name}/{kind}/{name}"
                    n += 1
    assert n >= 350, n


def test_threaded_callback_agrees_with_serial(rng):
    """The real decoder through a 4-thread pthread callback (the contract at
    hap.h:113-116) must produce the same bytes as the serial callback."""
    g = 16
    payload = content("mixed", 4096 * g, g, rng)
    frame = serialize_texture(payload, TextureFormat.YCoCg_DXT5, Compressor.SNAPPY, 16)
    serial, f1 = oracle.decode(frame, threaded=False)
    threaded, f2 = oracle.decode(frame, threaded=True)
    assert serial == threaded == payload and f1 == f2


def test_multi_image_frames_decode_via_real_hapdecode(rng):
    """Two-texture 0x0D frames from our multi-texture encoder (the Hap Q
    Alpha combination, HapVideoDRAFT.md:83-85) through real HapDecode at
    both indices (hap.c:932-991 section indexing)."""
    gq, ga = 16, 8
    ycocg = content("mixed", 512 * gq, gq, rng)
    alpha = content("periodic", 512 * ga, ga, rng)
    frame = serialize_frame(
        [ycocg, alpha],
        [TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1],
        [Compressor.SNAPPY, Compressor.SNAPPY],
        [4, 2],
    )
    assert oracle.texture_count(frame) == 2
    got0, fmt0 = oracle.decode(frame, 0)
    got1, fmt1 = oracle.decode(frame, 1)
    assert got0 == ycocg and fmt0 == int(TextureFormat.YCoCg_DXT5)
    assert got1 == alpha and fmt1 == int(TextureFormat.A_RGTC1)


def test_8byte_headers_decode_via_real_hapdecode(rng):
    """>16MB texture (8-byte top headers, hap.c:391-405) from our native
    encoder through the real decoder."""
    nbytes = 17 * 1024 * 1024
    payload = content("mixed", nbytes, 16, rng)
    frame = native.encode([payload], [TextureFormat.RGBA_DXT5], [1], [64])
    got, fmt = oracle.decode(frame, out_cap=nbytes + 64)
    assert got == payload and fmt == int(TextureFormat.RGBA_DXT5)


# ---------------------------------------------------------------------------
# (b) real HapEncode -> our decoders
# ---------------------------------------------------------------------------

def test_real_hapencode_decodes_via_our_decoders(rng):
    """Frames produced by the real reference encoder (real google-snappy
    chunk streams, hap.c:453) must decode bit-exactly via the python,
    native, and device-general decoders."""
    from hap_tpu.pipeline.any_frame import decode_frame_any  # noqa: F401
    n = 0
    for fmt in FORMATS:
        g = bytes_per_block(fmt)
        for kind in KINDS:
            for blocks, chunks, comp in [(60, 1, 1), (1024, 7, 1), (999, 4, 1),
                                         (256, 1, 0)]:
                payload = content(kind, blocks * g, g, rng)
                frame = oracle.encode([payload], [int(fmt)], [comp], [chunks])
                label = f"{fmt.name}/{kind}/b{blocks}c{chunks}comp{comp}"
                # introspection cross-check while we're here
                assert frame_texture_format(frame) == fmt, label
                assert frame_texture_chunk_count(frame) == \
                    oracle.texture_chunk_count(frame), label
                got_py = _decode_texture_python(frame, 0)
                got_nat, nat_fmt = native.decode(frame)
                assert got_py == payload, f"python decode: {label}"
                assert got_nat == payload and nat_fmt == fmt, f"native: {label}"
                n += 1
    assert n >= 130, n


def test_real_hapencode_decodes_via_device_general_kernel(rng):
    """Real-HapEncode frames through the full device foreign-frame path
    (any_frame + the general Pallas Snappy kernel) — actual foreign bytes,
    not self-emitted structured streams."""
    from hap_tpu.pipeline.any_frame import _texture_payload_device
    from hap_tpu.container.parse import parse_frame

    for fmt, kind, chunks in [
        (TextureFormat.RGB_DXT1, "mixed", 4),
        (TextureFormat.YCoCg_DXT5, "periodic", 7),
        (TextureFormat.RGBA_DXT5, "gradient", 1),
        (TextureFormat.A_RGTC1, "flat", 3),
    ]:
        g = bytes_per_block(fmt)
        payload = content(kind, 1024 * g, g, rng)
        frame = oracle.encode([payload], [int(fmt)], [1], [chunks])
        plan = parse_frame(frame)
        import jax.numpy as jnp

        out, ok = _texture_payload_device(
            jnp.asarray(np.frombuffer(frame, np.uint8)), len(frame),
            plan.textures[0])
        assert bool(ok), f"{fmt.name}/{kind}"
        assert np.asarray(out).tobytes() == payload, f"{fmt.name}/{kind}"


def test_real_two_texture_hapencode_decodes_via_ours(rng):
    """Real HapEncode multi-image output (hap.c:551-603) through our
    parser/decoders, both textures."""
    ycocg = content("periodic", 512 * 16, 16, rng)
    alpha = content("mixed", 512 * 8, 8, rng)
    frame = oracle.encode(
        [ycocg, alpha],
        [int(TextureFormat.YCoCg_DXT5), int(TextureFormat.A_RGTC1)],
        [1, 1], [4, 2],
    )
    assert frame_texture_count(frame) == 2
    assert frame_texture_format(frame, 0) == TextureFormat.YCoCg_DXT5
    assert frame_texture_format(frame, 1) == TextureFormat.A_RGTC1
    assert _decode_texture_python(frame, 0) == ycocg
    assert _decode_texture_python(frame, 1) == alpha
    assert native.decode(frame, 0)[0] == ycocg
    assert native.decode(frame, 1)[0] == alpha


def test_encoder_containers_byte_identical_when_snappy_agrees(rng):
    """Where our snappy emission matches google's (see FORMAT_NOTES.md —
    most content; divergence is legal, both conforming), our whole container
    must be byte-identical to real HapEncode output, pinning every header,
    table, and fallback decision (hap.c:391-499)."""
    checked = 0
    for fmt in (TextureFormat.RGB_DXT1, TextureFormat.YCoCg_DXT5):
        g = bytes_per_block(fmt)
        for kind in KINDS:
            for chunks in (1, 8):
                payload = content(kind, 512 * g, g, rng)
                ours = serialize_texture(payload, fmt, Compressor.SNAPPY, chunks)
                real = oracle.encode([payload], [int(fmt)], [1], [chunks])
                cc = legalize_chunk_count(len(payload), fmt, chunks)
                import math
                sz = math.ceil(len(payload) / cc)
                emission_matches = all(
                    oracle.snappy_compress(payload[i * sz:(i + 1) * sz])
                    == __import__("hap_tpu.snappy.pyref", fromlist=["compress"])
                    .compress(payload[i * sz:(i + 1) * sz])
                    for i in range(cc)
                )
                if emission_matches:
                    assert ours == real, f"{fmt.name}/{kind}/c{chunks}"
                    checked += 1
                else:
                    # divergent emission: containers differ but must
                    # cross-decode exactly
                    assert oracle.decode(ours)[0] == payload
                    assert _decode_texture_python(real, 0) == payload
    assert checked >= 10, checked


# ---------------------------------------------------------------------------
# (c) sizing + introspection parity
# ---------------------------------------------------------------------------

def test_max_encoded_length_matches_real(rng):
    """Our max_encoded_length must equal the real HapMaxEncodedLength
    (hap.c:324-353) over a randomized sweep, including two-texture frames
    and degenerate arguments."""
    for _ in range(200):
        count = int(rng.integers(1, 3))
        fmts = [int(FORMATS[int(rng.integers(0, len(FORMATS)))]) for _ in range(count)]
        lens = [int(rng.integers(1, 1 << 24)) for _ in range(count)]
        chunks = [int(rng.integers(1, 40)) for _ in range(count)]
        ours = max_encoded_length(lens, fmts, chunks)
        real = oracle.max_encoded_length(lens, fmts, chunks)
        assert ours == real, (lens, fmts, chunks)
    # degenerate: zero chunk count -> 0 (hap.c:341-346)
    assert oracle.max_encoded_length([64], [0x83F0], [0]) == \
        max_encoded_length([64], [0x83F0], [0]) == 0


def test_introspection_matches_real(rng):
    """Count/format/chunk-count parity with the real introspection trio over
    frames from both sides."""
    for fmt in FORMATS:
        g = bytes_per_block(fmt)
        payload = content("mixed", 333 * g, g, rng)
        for frame in (
            serialize_texture(payload, fmt, Compressor.SNAPPY, 5),
            oracle.encode([payload], [int(fmt)], [1], [5]),
            serialize_texture(payload, fmt, Compressor.NONE, 1),
        ):
            assert frame_texture_count(frame) == oracle.texture_count(frame)
            assert int(frame_texture_format(frame)) == oracle.texture_format(frame)
            assert frame_texture_chunk_count(frame) == \
                oracle.texture_chunk_count(frame)
    # legalized chunk counts: stored count reflects the decrement rule
    # (hap.c:295-298) identically on both sides
    payload = content("periodic", 997 * 8, 8, rng)
    ours = serialize_texture(payload, TextureFormat.RGB_DXT1, Compressor.SNAPPY, 13)
    real = oracle.encode([payload], [0x83F0], [1], [13])
    assert frame_texture_chunk_count(ours) == oracle.texture_chunk_count(real)
