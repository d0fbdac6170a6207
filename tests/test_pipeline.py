"""End-to-end pixel pipelines: encode_frame/decode_frame for all codec

families, plus the reference-shaped hap_* API surface."""

import numpy as np
import pytest

from hap_tpu import Compressor, TextureFormat
from hap_tpu.api import (
    hap_decode,
    hap_encode,
    hap_get_frame_texture_chunk_count,
    hap_get_frame_texture_count,
    hap_get_frame_texture_format,
    hap_max_encoded_length,
)
from hap_tpu.pipeline import CODECS, codec_for_frame, decode_frame, encode_frame


def psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


def make_image(h, w, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [
        128 + 80 * np.sin(xx / 31.0 + i) * np.cos(yy / (17.0 + 5 * i))
        for i in range(channels)
    ]
    img = np.stack(chans, axis=-1) + rng.normal(0, 3, (h, w, channels))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


QUALITY_DB = {
    "hap": 33.0,
    "hap_alpha": 33.0,
    "hap_q": 36.0,
    "hap_alpha_only": 30.0,
    "hap_q_alpha": 34.0,
    "hap_r": 36.0,
}


@pytest.mark.parametrize(
    "codec", [c for c in CODECS if c not in ("hap_hdr", "hap_hdr_signed")]
)
def test_roundtrip_all_codecs(codec):
    spec = CODECS[codec]
    h, w = 48, 64
    img = make_image(h, w, spec.channels, seed=11)
    if spec.channels == 1:
        img = img[..., 0]
    frame = encode_frame(img, codec, chunk_count=4)
    got = codec_for_frame(frame)
    assert got.name == codec
    out = decode_frame(frame, h, w)
    if spec.channels == 1:
        out = out if out.ndim == 2 else out[..., 0]
    q = psnr(img, out)
    assert q > QUALITY_DB[codec], f"{codec}: PSNR {q:.2f} dB"


@pytest.mark.parametrize("h,w", [(48, 64), (37, 53), (5, 3), (4, 4)])
def test_roundtrip_odd_dimensions(h, w):
    img = make_image(h, w, 3, seed=5)
    frame = encode_frame(img, "hap", chunk_count=4)
    out = decode_frame(frame, h, w)
    assert out.shape == (h, w, 3)
    assert psnr(img, out) > 30.0


def test_hap_q_alpha_frame_structure():
    img = make_image(32, 32, 4, seed=9)
    frame = encode_frame(img, "hap_q_alpha", chunk_count=2)
    assert hap_get_frame_texture_count(frame) == 2
    assert hap_get_frame_texture_format(frame, 0) == TextureFormat.YCoCg_DXT5
    assert hap_get_frame_texture_format(frame, 1) == TextureFormat.A_RGTC1
    out = decode_frame(frame, 32, 32)
    assert out.shape == (32, 32, 4)


def test_chunk_count_stored():
    # Flat image -> highly compressible BC1 payload -> Complex storage with
    # the requested (legalized) chunk count.
    img = np.full((64, 64, 3), 77, dtype=np.uint8)
    frame = encode_frame(img, "hap", chunk_count=8)
    assert hap_get_frame_texture_chunk_count(frame) == 8


# ---------------------------------------------------------------------------
# Reference-shaped API over raw texture bytes
# ---------------------------------------------------------------------------

def test_hap_api_surface(rng):
    data = np.tile(rng.integers(0, 16, (64, 8), dtype=np.uint8), (16, 1)).tobytes()
    cap = hap_max_encoded_length([len(data)], [TextureFormat.RGB_DXT1], [4])
    assert cap > 0
    frame = hap_encode([data], [TextureFormat.RGB_DXT1], [Compressor.SNAPPY], [4])
    assert len(frame) <= cap
    out, fmt = hap_decode(frame)
    assert out == data and fmt == TextureFormat.RGB_DXT1
    assert hap_get_frame_texture_count(frame) == 1
    assert hap_get_frame_texture_chunk_count(frame) == 4


def test_roundtrip_hap_hdr():
    """Hap HDR (BC6H) carries float pixels; quality measured in relative RMSE."""
    rng = np.random.default_rng(3)
    h, w = 32, 48
    base = rng.random((1, 1, 3), dtype=np.float32) * 50 + 10
    t = rng.random((h, w, 1), dtype=np.float32)
    img = (base * (1.0 + t)).astype(np.float32)
    frame = encode_frame(img, "hap_hdr", chunk_count=2)
    assert codec_for_frame(frame).name == "hap_hdr"
    out = decode_frame(frame, h, w)
    assert out.dtype == np.float32
    rel = np.abs(out - img) / np.maximum(img, 1e-3)
    assert np.sqrt(np.mean(rel**2)) < 0.03


def test_roundtrip_hap_r_quality():
    h, w = 48, 48
    img4 = np.concatenate(
        [make_image(h, w, 3, seed=2), np.full((h, w, 1), 200, np.uint8)], axis=-1
    )
    frame = encode_frame(img4, "hap_r", chunk_count=4)
    assert codec_for_frame(frame).name == "hap_r"
    out = decode_frame(frame, h, w)
    assert psnr(img4, out) > 38.0


@pytest.mark.parametrize("codec", ["hap", "hap_q", "hap_r"])
def test_slabbed_encode_quality_parity(codec, monkeypatch):
    """Tall frames encode as row-slabs under lax.map (a 16K perf fix,
    tools/probe_16k_slab.py). Slab and direct graphs compile differently,
    so f32 near-ties in PCA/LS endpoint fits may quantize differently —
    words are NOT bit-identical across the threshold. Assert the real
    contract instead: the slabbed encode decodes (own decoder) to the
    same quality as the direct encode, within a tight tolerance."""
    import jax.numpy as jnp

    import hap_tpu.pipeline.device_pipeline as dp

    h, w = 96, 64
    img = make_image(h, w, 4 if codec == "hap_r" else 3, seed=11)
    x = jnp.asarray(img)

    def sse_of(words):
        dec = np.asarray(dp._decode_blocks(codec, jnp.asarray(words), h, w))
        return float(((dec.astype(np.int64)
                       - img[..., : dec.shape[-1]].astype(np.int64)) ** 2
                      ).sum())

    monkeypatch.setattr(dp, "_SLAB_MIN_H", 1 << 30)
    direct = np.asarray(dp._encode_blocks(codec, x))
    monkeypatch.setattr(dp, "_SLAB_MIN_H", 8)
    monkeypatch.setattr(dp, "_SLAB_TARGET_ROWS", 24)
    assert dp._slab_count(h) > 1
    slab = np.asarray(dp._encode_blocks(codec, x))
    assert slab.shape == direct.shape and slab.dtype == direct.dtype
    s_direct, s_slab = sse_of(direct), sse_of(slab)
    # near-tie drift only: total SSE within 1% + tiny absolute slack
    assert abs(s_slab - s_direct) <= 0.01 * s_direct + 64.0, (
        s_direct, s_slab)
