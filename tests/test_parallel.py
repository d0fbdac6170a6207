"""Sharding semantics on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hap_tpu.kernels.bc3 import bc3_encode_blocks
from hap_tpu.kernels.ycocg import rgb_to_cocgsy
from hap_tpu.parallel import (
    make_mesh,
    make_train_step,
    mesh_shape_for,
    sharded_gop_encode,
    sharded_spatial_encode,
)


def test_mesh_shape_for():
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(7) == (7, 1)
    assert mesh_shape_for(16) == (4, 4)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(jax.devices()[:8], (4, 2))


def ref_encode(blocks):
    flat = blocks.reshape((-1,) + blocks.shape[2:])
    return np.asarray(bc3_encode_blocks(rgb_to_cocgsy(jnp.asarray(flat)))).reshape(
        blocks.shape[0], blocks.shape[1], 4
    )


def test_gop_encode_matches_single_device(rng, mesh8):
    blocks = rng.integers(0, 256, (8, 4, 16, 3), dtype=np.uint8)
    fn = sharded_gop_encode(mesh8, "hap_q")
    out = np.asarray(fn(jnp.asarray(blocks)))
    np.testing.assert_array_equal(out, ref_encode(blocks))


def test_spatial_encode_matches_single_device(rng, mesh8):
    blocks = rng.integers(0, 256, (64, 16, 3), dtype=np.uint8)
    fn = sharded_spatial_encode(mesh8, "hap_q")
    out = np.asarray(fn(jnp.asarray(blocks)))
    single = np.asarray(bc3_encode_blocks(rgb_to_cocgsy(jnp.asarray(blocks))))
    np.testing.assert_array_equal(out, single)


@pytest.mark.parametrize("codec", ["hap", "hap_q", "hap_alpha", "hap_alpha_only"])
def test_train_step_all_codecs(rng, mesh8, codec):
    channels = {"hap": 3, "hap_q": 3, "hap_alpha": 4, "hap_alpha_only": 1}[codec]
    blocks = rng.integers(0, 256, (4, 16, 16, channels), dtype=np.uint8)
    step = make_train_step(mesh8, codec)
    words, sse = step(jnp.asarray(blocks))
    assert np.isfinite(float(sse))
    assert words.shape[0] == 4 and words.shape[1] == 16


def test_train_step_collective_consistency(rng, mesh8):
    """The all_gather'ed words must equal the unsharded encode."""
    blocks = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    step = make_train_step(mesh8, "hap_q")
    words, _ = step(jnp.asarray(blocks))
    np.testing.assert_array_equal(np.asarray(words), ref_encode(blocks))


def test_sharded_frame_roundtrip_matches_single_device(rng, mesh8):
    from hap_tpu.parallel.sharded import sharded_frame_roundtrip
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline_gop

    imgs = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    fn = sharded_frame_roundtrip(mesh8, "hap_q", chunk_count=2)
    out, flen, ok = fn(jnp.asarray(imgs))
    assert np.asarray(ok).all()
    ref_out, ref_flen, ref_ok = jax.jit(
        lambda x: roundtrip_pipeline_gop(x, "hap_q", 2)
    )(jnp.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(flen), np.asarray(ref_flen))


@pytest.mark.parametrize("content", ["structured", "noise"])
def test_sharded_spatial_roundtrip_bit_exact(rng, mesh8, content):
    """One frame striped over 8 devices must produce the byte-identical
    container and pixels as the single-device pipeline (noise content
    exercises the whole-frame raw fallback through the sharded path)."""
    from hap_tpu.parallel.sharded import sharded_spatial_roundtrip
    from hap_tpu.pipeline.device_pipeline import encode_pipeline, decode_pipeline
    from hap_tpu.kernels.layout import blocks_to_image, image_to_blocks

    H, W = 32, 64
    if content == "structured":
        img = np.broadcast_to(
            np.linspace(0, 255, W, dtype=np.uint8)[None, :, None], (H, W, 3)
        ).copy()
    else:
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    rt = sharded_spatial_roundtrip(mesh8, H, W, "hap_q", chunk_count=8)
    blocks = jax.jit(image_to_blocks)(jnp.asarray(img))
    out_blocks, frame, flen, ok = rt(blocks)
    assert bool(np.asarray(ok))

    ref_frame, ref_len = jax.jit(lambda x: encode_pipeline(x, "hap_q", 8))(
        jnp.asarray(img)
    )
    assert int(flen) == int(ref_len)
    np.testing.assert_array_equal(
        np.asarray(frame)[: int(flen)], np.asarray(ref_frame)[: int(ref_len)]
    )
    ref_img, ref_ok = jax.jit(lambda f: decode_pipeline(f, H, W, "hap_q", 8))(
        ref_frame
    )
    assert bool(ref_ok)
    out_img = np.asarray(
        jax.jit(lambda b: blocks_to_image(b, H, W))(out_blocks)
    )
    np.testing.assert_array_equal(out_img, np.asarray(ref_img))


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.block_until_ready(fn(*args))
    assert out.shape == (128 * 128, 4)


@pytest.mark.parametrize("codec,ch,cc_req", [
    ("hap", 3, 8),            # even: cc % D == 0
    ("hap", 3, 6),            # uneven: 6 chunks over 8 devices (padded slots)
    ("hap_alpha", 4, 5),      # uneven
    ("hap_r", 4, 8),          # BC7 family
    ("hap_q_alpha", 4, 4),    # multi-texture (two sections, shared geometry)
])
def test_sharded_spatial_all_families(rng, mesh8, codec, ch, cc_req):
    """Every codec family stripes over the mesh and emits a container
    bit-identical to the single-device pipeline, including chunk counts
    that do not divide the device count (ceil-padded chunk slots)."""
    from hap_tpu.parallel.sharded import sharded_spatial_roundtrip
    from hap_tpu.pipeline.device_pipeline import encode_pipeline
    from hap_tpu.kernels.layout import image_to_blocks

    H, W = 16, 32
    img = rng.integers(0, 256, (H, W, ch), dtype=np.uint8)
    img[: H // 2] = 44  # compressible half
    rt = sharded_spatial_roundtrip(mesh8, H, W, codec, chunk_count=cc_req)
    blocks = np.asarray(jax.jit(image_to_blocks)(jnp.asarray(img)))
    n_real = blocks.shape[0]
    pad = rt.blocks_padded - n_real
    blocks_p = np.pad(blocks, ((0, pad), (0, 0), (0, 0)))
    out_blocks, frame, flen, ok = rt(jnp.asarray(blocks_p))
    assert bool(np.asarray(ok)), codec

    ref_frame, ref_len = jax.jit(
        lambda x: encode_pipeline(x, codec, cc_req))(jnp.asarray(img))
    assert int(flen) == int(ref_len), codec
    np.testing.assert_array_equal(
        np.asarray(frame)[: int(flen)], np.asarray(ref_frame)[: int(ref_len)])
    # decoded stripes (cropped past padding) == single-device decode
    from hap_tpu.pipeline.device_pipeline import decode_pipeline

    ref_img, ref_ok = jax.jit(
        lambda f: decode_pipeline(f, H, W, codec, cc_req))(ref_frame)
    assert bool(ref_ok)
    from hap_tpu.kernels.layout import blocks_to_image

    got = np.asarray(jax.jit(
        lambda b: blocks_to_image(b, H, W))(out_blocks[:n_real]))
    np.testing.assert_array_equal(got, np.asarray(ref_img))


def test_sharded_spatial_hdr(rng, mesh8):
    """BC6H (float pixels) through the spatial pipeline, bit-identical
    container; values compare exactly (same kernels both sides)."""
    from hap_tpu.parallel.sharded import sharded_spatial_roundtrip
    from hap_tpu.pipeline.device_pipeline import encode_pipeline
    from hap_tpu.kernels.layout import image_to_blocks

    H, W = 16, 16
    img = (rng.random((H, W, 3), dtype=np.float32) * 4.0).astype(np.float32)
    rt = sharded_spatial_roundtrip(mesh8, H, W, "hap_hdr", chunk_count=4)
    blocks = np.asarray(jax.jit(image_to_blocks)(jnp.asarray(img)))
    pad = rt.blocks_padded - blocks.shape[0]
    blocks_p = np.pad(blocks, ((0, pad), (0, 0), (0, 0)))
    out_blocks, frame, flen, ok = rt(jnp.asarray(blocks_p))
    assert bool(np.asarray(ok))
    ref_frame, ref_len = jax.jit(
        lambda x: encode_pipeline(x, "hap_hdr", 4))(jnp.asarray(img))
    assert int(flen) == int(ref_len)
    np.testing.assert_array_equal(
        np.asarray(frame)[: int(flen)], np.asarray(ref_frame)[: int(ref_len)])
