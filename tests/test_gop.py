"""GOP-batched device pipeline == per-frame pipeline, bit-exactly.

The GOP path (pipeline/device_pipeline.py: *_pipeline_gop) folds all frames'
chunks into single Pallas grids; these tests pin that the produced container
bytes, frame lengths, decoded pixels, and ok flags are identical to the
per-frame path (which itself is differentially tested against the host
serializer and the reference semantics in test_device_frame.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hap_tpu.pipeline.device_pipeline import (
    decode_pipeline,
    decode_pipeline_gop,
    encode_pipeline,
    encode_pipeline_gop,
    roundtrip_pipeline_gop,
)


def _frames(B, H, W, C, seed=0, compressible=True):
    rng = np.random.default_rng(seed)
    if compressible:
        base = np.tile(
            rng.integers(0, 256, (B, H, 8, C), dtype=np.uint8), (1, 1, W // 8 + 1, 1)
        )[:, :, :W]
        noise_rows = H // 4
        base[:, :noise_rows] = rng.integers(
            0, 256, (B, noise_rows, W, C), dtype=np.uint8
        )
        return base
    return rng.integers(0, 256, (B, H, W, C), dtype=np.uint8)


@pytest.mark.parametrize("codec,chans", [("hap", 3), ("hap_q", 3), ("hap_alpha", 4)])
def test_gop_encode_matches_per_frame(codec, chans):
    B, H, W = 3, 32, 64
    imgs = jnp.asarray(_frames(B, H, W, chans, seed=1))
    frames_g, lens_g = jax.jit(
        lambda x: encode_pipeline_gop(x, codec, 4)
    )(imgs)
    for b in range(B):
        f, l = jax.jit(lambda x: encode_pipeline(x, codec, 4))(imgs[b])
        assert int(lens_g[b]) == int(l)
        np.testing.assert_array_equal(
            np.asarray(frames_g[b])[: int(l)], np.asarray(f)[: int(l)]
        )


def test_gop_roundtrip_matches_per_frame_and_flags_ok():
    B, H, W = 4, 48, 48
    imgs = jnp.asarray(_frames(B, H, W, 3, seed=2))
    out, lens, ok = jax.jit(lambda x: roundtrip_pipeline_gop(x, "hap_q", 4))(imgs)
    assert np.asarray(ok).all()
    for b in range(B):
        frame, l = jax.jit(lambda x: encode_pipeline(x, "hap_q", 4))(imgs[b])
        img, okb = jax.jit(
            lambda f: decode_pipeline(f, H, W, "hap_q", 4)
        )(frame)
        assert bool(okb)
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(img))


def test_gop_decode_handles_raw_fallback_frames():
    # Incompressible frames trigger the whole-frame raw fallback
    # (hap.c:478-495); the GOP decoder routes them through the same kernel
    # as strided raw chunks.
    B, H, W = 3, 32, 32
    imgs = jnp.asarray(_frames(B, H, W, 3, seed=3, compressible=False))
    frames, lens = jax.jit(lambda x: encode_pipeline_gop(x, "hap", 4))(imgs)
    # Confirm at least one frame stored raw (compressor nibble 0xA).
    nibbles = [int(np.asarray(frames[b, 3])) >> 4 for b in range(B)]
    assert 0xA in nibbles, nibbles
    out, ok = jax.jit(lambda f: decode_pipeline_gop(f, H, W, "hap", 4))(frames)
    assert np.asarray(ok).all()
    for b in range(B):
        img, okb = jax.jit(lambda f: decode_pipeline(f, H, W, "hap", 4))(frames[b])
        assert bool(okb)
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(img))


def test_gop_mixed_raw_and_complex_frames():
    B, H, W = 2, 32, 32
    comp = np.full((H, W, 3), 77, np.uint8)  # flat -> G-periodic BC1 payload
    rawf = _frames(1, H, W, 3, seed=5, compressible=False)[0]
    imgs = jnp.asarray(np.stack([comp, rawf]))
    frames, lens = jax.jit(lambda x: encode_pipeline_gop(x, "hap", 4))(imgs)
    nibbles = [int(np.asarray(frames[b, 3])) >> 4 for b in range(B)]
    assert sorted(nibbles) == [0xA, 0xC], nibbles
    out, ok = jax.jit(lambda f: decode_pipeline_gop(f, H, W, "hap", 4))(frames)
    assert np.asarray(ok).all()
    for b in range(B):
        img, _ = jax.jit(lambda f: decode_pipeline(f, H, W, "hap", 4))(frames[b])
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(img))


def test_gop_odd_dimensions():
    B, H, W = 2, 37, 53
    imgs = jnp.asarray(_frames(B, H, W, 3, seed=6))
    out, lens, ok = jax.jit(lambda x: roundtrip_pipeline_gop(x, "hap_q", 2))(imgs)
    assert np.asarray(ok).all()
    assert out.shape == (B, H, W, 3)
    for b in range(B):
        frame, _ = jax.jit(lambda x: encode_pipeline(x, "hap_q", 2))(imgs[b])
        img, _ = jax.jit(lambda f: decode_pipeline(f, H, W, "hap_q", 2))(frame)
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(img))


def test_gop_chunk_count_not_tile_multiple():
    # chunk_count that is not a multiple of the kernel tile (_TC=8):
    # per-frame padding must keep DMA tiles inside one frame.
    B, H, W = 3, 40, 40
    imgs = jnp.asarray(_frames(B, H, W, 3, seed=7))
    out, lens, ok = jax.jit(lambda x: roundtrip_pipeline_gop(x, "hap_q", 5))(imgs)
    assert np.asarray(ok).all()
    for b in range(B):
        frame, _ = jax.jit(lambda x: encode_pipeline(x, "hap_q", 5))(imgs[b])
        img, _ = jax.jit(lambda f: decode_pipeline(f, H, W, "hap_q", 5))(frame)
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(img))


def test_gop_multi_image_fallback():
    # hap_q_alpha has two texture sections; the GOP entry points fall back
    # to a map over the per-frame path and must still match it.
    B, H, W = 2, 16, 16
    imgs = jnp.asarray(_frames(B, H, W, 4, seed=8))
    frames, lens = jax.jit(lambda x: encode_pipeline_gop(x, "hap_q_alpha", 2))(imgs)
    out, ok = jax.jit(
        lambda f: decode_pipeline_gop(f, H, W, "hap_q_alpha", 2)
    )(frames)
    assert np.asarray(ok).all()
    for b in range(B):
        f, l = jax.jit(lambda x: encode_pipeline(x, "hap_q_alpha", 2))(imgs[b])
        assert int(lens[b]) == int(l)
        np.testing.assert_array_equal(np.asarray(frames[b]), np.asarray(f))
