"""DeviceSession: GOP-batched encode/decode with host interop."""

import numpy as np

import jax.numpy as jnp

from hap_tpu.pipeline import decode_frame
from hap_tpu.pipeline.session import DeviceSession
from hap_tpu.snappy.device import snappy_decode_chunks, snappy_encode_chunks


def test_session_roundtrip(rng):
    h, w, b = 48, 64, 3
    frames = rng.integers(0, 200, (b, h, w, 3), dtype=np.uint8)
    frames[:, :16] = 77  # compressible band
    sess = DeviceSession(h, w, "hap_q", chunk_count=4, batch=b)
    out, flen, ok = sess.roundtrip(frames)
    assert ok.all() and out.shape == frames.shape


def test_session_encode_decodes_on_host(rng):
    h, w, b = 32, 32, 2
    frames = np.broadcast_to(
        rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8), (b, h, w, 3)
    ).copy()
    frames[:, : h // 2] = 10
    sess = DeviceSession(h, w, "hap", chunk_count=2, batch=b)
    encoded = sess.encode(frames)
    assert len(encoded) == b
    for i, fb in enumerate(encoded):
        img = decode_frame(fb, h, w)  # host path decodes device frames
        assert img.shape == (h, w, 3)
    # session decode of its own bytes
    imgs, ok = sess.decode_bytes(encoded)
    assert ok.all() and imgs.shape == (b, h, w, 3)


def test_snappy_xla_fallback_impl(rng):
    """The portable XLA implementation must agree with the Pallas one."""
    S, G, C = 1024, 16, 8
    data = rng.integers(0, 256, (C, S), dtype=np.uint8)
    data[: C // 2] = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
    cp, lp = snappy_encode_chunks(jnp.asarray(data), S, G, impl="pallas")
    cx, lx = snappy_encode_chunks(jnp.asarray(data), S, G, impl="xla")
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lx))
    cp, cx = np.asarray(cp), np.asarray(cx)
    for c in range(C):
        assert (cp[c, : lp[c]] == cx[c, : lp[c]]).all()
    for impl in ("pallas", "xla"):
        out, ok = snappy_decode_chunks(
            jnp.asarray(cp), jnp.asarray(lp), S, G, impl=impl
        )
        assert np.asarray(ok).all(), impl
        np.testing.assert_array_equal(np.asarray(out), data)


def test_session_fast_effort_roundtrips():
    import numpy as np
    from hap_tpu.pipeline.session import DeviceSession
    from hap_tpu.utils import EncodeConfig, psnr
    import pytest

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 200, (2, 24, 40, 3), dtype=np.uint8)
    out, flen, ok = DeviceSession(24, 40, "hap_q", 2, effort="fast").roundtrip(imgs)
    assert ok.all()
    # fast effort must stay within a small PSNR margin of high effort
    out_hi, _, ok_hi = DeviceSession(24, 40, "hap_q", 2, effort="high").roundtrip(imgs)
    assert ok_hi.all()
    assert psnr(imgs, out) >= psnr(imgs, out_hi) - 1.0
    with pytest.raises(ValueError):
        EncodeConfig(effort="ultra")
