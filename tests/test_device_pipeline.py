"""Device pixel pipelines (split from test_device_frame.py: one
pytest process accumulating every device-frame + pipeline XLA CPU
compilation segfaulted in backend_compile_and_load — the known LLVM
stack-depth issue runtests.sh isolates per file; the r5 LZ graphs
pushed the combined file over the budget)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu import Compressor, TextureFormat
from hap_tpu import native
from hap_tpu.constants import CONSTANT_TO_FORMAT_ID, bytes_per_block
from hap_tpu.container.parse import frame_texture_chunk_count, parse_frame
from hap_tpu.container.serialize import serialize_texture
from hap_tpu.pipeline.codecs import _decode_texture_python
from hap_tpu.pipeline.device_frame import decode_frame_device, encode_frame_device
from hap_tpu.pipeline.device_pipeline import (
    decode_pipeline,
    encode_pipeline,
    roundtrip_pipeline,
)
from hap_tpu.snappy import pyref
from hap_tpu.snappy.device import snappy_decode_chunks, snappy_encode_chunks


def mixed_payload(rng, nbytes, g):
    """Half flat (repeated g-byte blocks), half random — exercises both

    copy and literal units and the per-chunk raw fallback."""
    out = np.empty(nbytes, np.uint8)
    half = nbytes // 2
    out[:half] = np.tile(rng.integers(0, 256, g, dtype=np.uint8), half // g + 1)[:half]
    out[half:] = rng.integers(0, 256, nbytes - half, dtype=np.uint8)
    return out



# ---------------------------------------------------------------------------
# Device pixel pipelines
# ---------------------------------------------------------------------------

def gradient_image(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack(
        [128 + 100 * np.sin(xx / (23 + 7 * i)) * np.cos(yy / (31 + 5 * i)) for i in range(c)],
        axis=-1,
    )
    # flat band to exercise copy units
    img[: h // 3] = 90
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("codec,channels", [
    ("hap", 3), ("hap_alpha", 4), ("hap_q", 3), ("hap_alpha_only", 1),
    ("hap_r", 4), ("hap_q_alpha", 4),
])
def test_device_pipeline_roundtrip(codec, channels):
    h, w = 64, 96
    img = gradient_image(h, w, max(channels, 3))[:, :, :channels]
    if channels == 1:
        img = img[..., 0]
    out, flen, ok = roundtrip_pipeline(jnp.asarray(img), codec, chunk_count=8)
    assert bool(np.asarray(ok))
    out = np.asarray(out)
    ref = img if img.ndim == 3 else img[..., None]
    outc = out if out.ndim == 3 else out[..., None]
    mse = np.mean((outc.astype(np.float64) - ref.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 30.0, f"{codec}: {psnr:.1f} dB"


@pytest.mark.parametrize("h,w", [(37, 53), (17, 33), (5, 3)])
def test_device_pipeline_odd_dimensions(h, w):
    """Odd sizes (reference Odd Dimensions pack, README.md:24) through the
    fully on-device path: edge blocks pad on encode, crop on decode, and the
    emitted frame stays host-decodable."""
    img = gradient_image(max(h, 8), max(w, 8), 3)[:h, :w]
    out, flen, ok = roundtrip_pipeline(jnp.asarray(img), "hap_q", chunk_count=4)
    assert bool(np.asarray(ok))
    out = np.asarray(out)
    assert out.shape == (h, w, 3)
    mse = np.mean((out.astype(np.float64) - img.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 30.0
    # host decode agrees bit-exactly with the device decode
    frame_buf, flen = encode_pipeline(jnp.asarray(img), "hap_q", chunk_count=4)
    frame = np.asarray(frame_buf)[: int(flen)].tobytes()
    from hap_tpu.pipeline import decode_frame

    np.testing.assert_array_equal(decode_frame(frame, h, w), out)


def test_device_pipeline_frame_is_conformant():
    h, w = 64, 64
    img = gradient_image(h, w, 3, seed=2)
    frame_buf, flen = encode_pipeline(jnp.asarray(img), "hap_q", chunk_count=4)
    frame = np.asarray(frame_buf)[: int(flen)].tobytes()
    # Host path decodes the device-built frame.
    from hap_tpu.pipeline import codec_for_frame, decode_frame

    assert codec_for_frame(frame).name == "hap_q"
    host_img = decode_frame(frame, h, w)
    dev_img, ok = decode_pipeline(
        jnp.asarray(np.frombuffer(frame, np.uint8)), h, w, "hap_q", 4
    )
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(host_img, np.asarray(dev_img))


def test_device_pipeline_hap_q_alpha_host_decodes():
    """A device-built HapM (multi-image) frame must parse and decode via the
    host paths (python plan + native)."""
    from hap_tpu.pipeline import codec_for_frame, decode_frame
    from hap_tpu import native
    from hap_tpu.container.parse import frame_texture_count

    h, w = 64, 64
    img = gradient_image(h, w, 4, seed=4)
    frame_buf, flen = encode_pipeline(jnp.asarray(img), "hap_q_alpha", chunk_count=4)
    frame = np.asarray(frame_buf)[: int(flen)].tobytes()
    assert frame_texture_count(frame) == 2
    assert codec_for_frame(frame).name == "hap_q_alpha"
    host_img = decode_frame(frame, h, w)
    assert host_img.shape == (h, w, 4)
    # native decodes both textures
    c0, f0 = native.decode(frame, 0)
    c1, f1 = native.decode(frame, 1)
    assert int(f0) == 0x01 and int(f1) == 0x8DBB
    # device decode agrees with host decode bit-exactly
    dev_img, ok = decode_pipeline(
        jnp.asarray(np.frombuffer(frame, np.uint8)), h, w, "hap_q_alpha", 4
    )
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(host_img, np.asarray(dev_img))


def test_device_pipeline_hap_hdr_roundtrip():
    rng = np.random.default_rng(5)
    h, w = 32, 32
    base = rng.random((1, 1, 3), dtype=np.float32) * 40 + 5
    t = rng.random((h, w, 1), dtype=np.float32)
    img = (base * (1.0 + t)).astype(np.float32)
    out, flen, ok = roundtrip_pipeline(jnp.asarray(img), "hap_hdr", chunk_count=2)
    assert bool(np.asarray(ok))
    out = np.asarray(out)
    rel = np.abs(out - img) / np.maximum(img, 1e-3)
    assert np.sqrt(np.mean(rel**2)) < 0.03


def test_device_decode_word_path_matches_bytes(rng):
    """decode_frame_device(out_words=True) == packed bytes path, all layouts."""
    import jax.numpy as jnp

    from hap_tpu.pipeline.device_frame import decode_frame_device, encode_frame_device
    from hap_tpu.kernels.layout import pack_u8_to_u32

    G = 16
    for nbytes, cc, compressible in [(16384, 8, True), (4096, 4, False)]:
        if compressible:
            payload = np.tile(rng.integers(0, 256, G, dtype=np.uint8), nbytes // G)
        else:
            payload = rng.integers(0, 256, nbytes, dtype=np.uint8)
        frame, flen = encode_frame_device(jnp.asarray(payload), cc, 0xF, G)
        by, ok_b = decode_frame_device(frame, nbytes, cc, 0xF, G)
        wo, ok_w = decode_frame_device(frame, nbytes, cc, 0xF, G, out_words=True)
        assert bool(ok_b) and bool(ok_w)
        want = np.asarray(pack_u8_to_u32(by.reshape(-1, 4)).reshape(-1))
        np.testing.assert_array_equal(np.asarray(wo), want)
