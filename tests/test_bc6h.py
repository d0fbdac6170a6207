"""BC6H: vectorized decoder vs scalar oracle; mode-11 encoder round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu.kernels.bc6h import (
    bc6h_decode_blocks,
    bc6h_encode_blocks_mode11,
    f32_to_half_bits,
    half_bits_to_f32,
)
from hap_tpu.kernels import scalar_ref_bc6h
from hap_tpu.kernels.bc6h_tables import MODES6


def words_from_bytes(raw: bytes):
    return jnp.asarray(np.frombuffer(raw, dtype="<u4").reshape(-1, 4))


def make_mode_blocks(rng, mode_key: int, count: int) -> bytes:
    raw = rng.integers(0, 256, (count, 16), dtype=np.uint8)
    bits = MODES6[mode_key]["bits"]
    mask = (1 << bits) - 1
    raw[:, 0] = (raw[:, 0] & (0xFF ^ mask)) | mode_key
    return raw.tobytes()


@pytest.mark.parametrize("mode_key", sorted(MODES6))
@pytest.mark.parametrize("signed", [False, True])
def test_bc6h_decode_matches_oracle_per_mode(rng, mode_key, signed):
    raw = make_mode_blocks(rng, mode_key, 128)
    got = np.asarray(bc6h_decode_blocks(words_from_bytes(raw), signed=signed))
    want = scalar_ref_bc6h.bc6h_decode(raw, signed=signed)
    np.testing.assert_array_equal(got, want)


def test_bc6h_decode_random_blocks(rng):
    raw = rng.integers(0, 256, 16 * 512, dtype=np.uint8).tobytes()
    got = np.asarray(bc6h_decode_blocks(words_from_bytes(raw)))
    want = scalar_ref_bc6h.bc6h_decode(raw)
    np.testing.assert_array_equal(got, want)


def test_bc6h_half_conversions():
    vals = np.array([0.0, 0.5, 1.0, 2.0, 100.0, 65504.0], dtype=np.float32)
    bits = f32_to_half_bits(jnp.asarray(vals))
    back = np.asarray(half_bits_to_f32(bits))
    np.testing.assert_allclose(back, vals, rtol=1e-3)


def test_bc6h_mode11_structure(rng):
    h = f32_to_half_bits(jnp.asarray(rng.random((32, 16, 3), dtype=np.float32) * 100))
    words = np.asarray(bc6h_encode_blocks_mode11(h))
    assert ((words[:, 0] & 0x1F) == 0x03).all()


def test_bc6h_mode11_solid_blocks(rng):
    vals = rng.random((16, 1, 3), dtype=np.float32) * 1000
    px = np.repeat(vals, 16, axis=1)
    h = f32_to_half_bits(jnp.asarray(px))
    words = bc6h_encode_blocks_mode11(h)
    out = half_bits_to_f32(bc6h_decode_blocks(words))
    rel = np.abs(np.asarray(out) - px) / np.maximum(px, 1e-3)
    assert rel.max() < 0.02, rel.max()  # 10-bit endpoints ~0.1% + half rounding


def test_bc6h_mode11_gradient_quality(rng):
    # Wide-range (exponent-crossing) blocks: BC6H interpolates half-float
    # BIT patterns, i.e. geometrically in value — a single shared index per
    # texel then can't track three channels exactly; ~8% relative RMSE is
    # the simple-encoder reality here.
    lo = rng.random((64, 1, 3), dtype=np.float32) * 10
    hi = lo + rng.random((64, 1, 3), dtype=np.float32) * 100
    t = rng.random((64, 16, 1), dtype=np.float32)
    px = lo + t * (hi - lo)
    h = f32_to_half_bits(jnp.asarray(px))
    words = bc6h_encode_blocks_mode11(h)
    out = np.asarray(half_bits_to_f32(bc6h_decode_blocks(words)))
    rel_rmse = np.sqrt(np.mean(((out - px) / np.maximum(px, 1.0)) ** 2))
    assert rel_rmse < 0.12, rel_rmse


def test_bc6h_mode11_narrow_range_quality(rng):
    # Correlated (luminance-ramp) blocks within one octave quantize tightly —
    # the shared per-texel index tracks all three channels.
    base = 64.0 + rng.random((64, 1, 3), dtype=np.float32) * 16
    t = rng.random((64, 16, 1), dtype=np.float32)
    px = (base * (1.0 + 0.5 * t)).astype(np.float32)
    h = f32_to_half_bits(jnp.asarray(px))
    words = bc6h_encode_blocks_mode11(h)
    out = np.asarray(half_bits_to_f32(bc6h_decode_blocks(words)))
    rel = np.abs(out - px) / px
    assert np.sqrt(np.mean(rel**2)) < 0.02, np.sqrt(np.mean(rel**2))


def test_bc6h_mode11_roundtrip_oracle_agrees(rng):
    h = f32_to_half_bits(jnp.asarray(rng.random((32, 16, 3), dtype=np.float32) * 500))
    words = np.asarray(bc6h_encode_blocks_mode11(h))
    raw = words.astype("<u4").tobytes()
    got = np.asarray(bc6h_decode_blocks(jnp.asarray(words)))
    want = scalar_ref_bc6h.bc6h_decode(raw)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# SF16 (signed) mode-11 encoder
# ---------------------------------------------------------------------------

def test_bc6h_mode11_signed_structure_and_oracle(rng):
    from hap_tpu.kernels.bc6h import bc6h_encode_blocks_mode11_signed

    px = (rng.random((32, 16, 3), dtype=np.float32) - 0.5) * 800
    h = f32_to_half_bits(jnp.asarray(px))
    words = np.asarray(bc6h_encode_blocks_mode11_signed(h))
    assert ((words[:, 0] & 0x1F) == 0x03).all()
    raw = words.astype("<u4").tobytes()
    got = np.asarray(bc6h_decode_blocks(jnp.asarray(words), signed=True))
    want = scalar_ref_bc6h.bc6h_decode(raw, signed=True)
    np.testing.assert_array_equal(got, want)


def test_bc6h_mode11_signed_solid_blocks(rng):
    from hap_tpu.kernels.bc6h import bc6h_encode_blocks_mode11_signed

    vals = (rng.random((16, 1, 3), dtype=np.float32) - 0.5) * 2000
    px = np.repeat(vals, 16, axis=1)
    h = f32_to_half_bits(jnp.asarray(px))
    words = bc6h_encode_blocks_mode11_signed(h)
    out = half_bits_to_f32(bc6h_decode_blocks(words, signed=True))
    rel = np.abs(np.asarray(out) - px) / np.maximum(np.abs(px), 1e-3)
    assert rel.max() < 0.04, rel.max()  # 9-bit magnitude + half rounding


def test_bc6h_mode11_signed_narrow_range_quality(rng):
    from hap_tpu.kernels.bc6h import bc6h_encode_blocks_mode11_signed

    base = 64.0 + rng.random((64, 1, 3), dtype=np.float32) * 16
    sign = np.where(rng.random((64, 1, 1)) < 0.5, -1.0, 1.0).astype(np.float32)
    t = rng.random((64, 16, 1), dtype=np.float32)
    px = (sign * base * (1.0 + 0.5 * t)).astype(np.float32)
    h = f32_to_half_bits(jnp.asarray(px))
    words = bc6h_encode_blocks_mode11_signed(h)
    out = np.asarray(half_bits_to_f32(bc6h_decode_blocks(words, signed=True)))
    rel = np.abs(out - px) / np.abs(px)
    assert np.sqrt(np.mean(rel**2)) < 0.03, np.sqrt(np.mean(rel**2))


def test_hap_hdr_signed_frame_roundtrip(rng):
    """Full container roundtrip of the SF16 codec family, host + device."""
    from hap_tpu.pipeline.codecs import decode_frame, encode_frame
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

    h, w = 16, 32
    # Channel-constant signs: the signed encoder must match the unsigned
    # encoder's quality on the magnitude image. (Mode 11 shares ONE texel
    # index across channels and interpolates in half-float BIT space, so
    # content with sign-crossing or phase-uncorrelated channels is lossy
    # for ANY mode-11 encoder — that's a property of the format, not a
    # regression surface.)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mag = np.stack(
        [
            200 + 150 * np.sin(xx / 7.0) * np.cos(yy / 5.0),
            180 + 90 * np.cos(xx / 9.0),
            220 + 100 * np.sin((xx + yy) / 11.0),
        ],
        axis=-1,
    ).astype(np.float32)
    img = mag * np.asarray([1.0, -1.0, -1.0], np.float32)

    frame = encode_frame(img, "hap_hdr_signed", chunk_count=2)
    out = decode_frame(frame, h, w)
    assert (np.sign(out) == np.sign(img)).all()
    rel_signed = np.sqrt(np.mean(((out - img) / img) ** 2))

    frame_u = encode_frame(mag, "hap_hdr", chunk_count=2)
    out_u = decode_frame(frame_u, h, w)
    rel_unsigned = np.sqrt(np.mean(((out_u - mag) / mag) ** 2))
    # signed endpoints have one less magnitude bit (9 vs 10): allow 2.5x
    assert rel_signed < max(2.5 * rel_unsigned, 0.02), (rel_signed, rel_unsigned)

    out_d, flen, ok = roundtrip_pipeline(jnp.asarray(img), "hap_hdr_signed", 2)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out_d), out)
