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


def test_session_encode_stats_match_host(rng):
    """Stats from the device must equal values recomputed on the host from
    the emitted container bytes (VERDICT r1 #7)."""
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY, COMPRESSOR_NONE
    from hap_tpu.container.parse import parse_frame

    h, w, b = 48, 64, 4
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    frames[0, :] = 50  # fully compressible
    frames[1, :24] = 90  # mixed: half flat, half noise
    # frames[2], frames[3]: pure noise -> raw fallbacks engage
    sess = DeviceSession(h, w, "hap_q", chunk_count=4, batch=b)
    encoded, stats = sess.encode_with_stats(frames)
    assert {s.whole_frame_raw_sections for s in stats} == {0, 1}, (
        "content classes should exercise both container modes"
    )
    for fb, s in zip(encoded, stats):
        assert s.frame_bytes == len(fb)
        assert s.compression_ratio == s.input_bytes / len(fb)
        plan = parse_frame(fb)
        tex = plan.textures[0]
        if tex.stored_compressor == COMPRESSOR_NONE:
            assert s.whole_frame_raw_sections == 1
            assert s.snappy_chunks == 0 and s.raw_chunk_fallbacks == 0
        else:
            comps = np.asarray(tex.chunk_compressors)
            assert s.snappy_chunks == int(
                (comps == CHUNK_COMPRESSOR_SNAPPY).sum()
            )
            assert s.raw_chunk_fallbacks == s.chunk_count - s.snappy_chunks
            assert s.input_bytes == int(
                np.asarray(tex.chunk_uncompressed_sizes).sum()
            )


def test_session_encode_stats_multi_image(rng):
    from hap_tpu.container.parse import parse_frame

    h, w = 32, 32
    frames = rng.integers(0, 256, (1, h, w, 4), dtype=np.uint8)
    frames[0, : h // 2] = 128
    sess = DeviceSession(h, w, "hap_q_alpha", chunk_count=2, batch=1)
    encoded, stats = sess.encode_with_stats(frames)
    (s,) = stats
    assert s.frame_bytes == len(encoded[0])
    # two sections: YCoCg_DXT5 (1 B/pix) + RGTC1 (0.5 B/pix)
    assert s.input_bytes == h * w + h * w // 2
    assert s.chunk_count == 4
    imgs, ok = sess.decode_bytes(encoded)
    assert ok.all()


def test_session_decode_reasons(rng):
    from hap_tpu.pipeline.session import DECODE_REASONS

    h, w, b = 32, 32, 2
    frames = rng.integers(0, 200, (b, h, w, 3), dtype=np.uint8)
    frames[:, : h // 2] = 60
    sess = DeviceSession(h, w, "hap_q", chunk_count=2, batch=b)
    encoded = sess.encode(frames)
    fmax = max(len(f) for f in encoded)
    padded = np.zeros((b, fmax), np.uint8)
    for i, f in enumerate(encoded):
        padded[i, : len(f)] = np.frombuffer(f, np.uint8)

    img, ok, reasons = sess.decode_with_reasons(padded)
    assert ok.all()
    for d in reasons:
        assert set(d) == set(DECODE_REASONS)
        assert all(all(v) for v in d.values())

    # corrupt frame 1's format nibble: only that reason flips
    bad = padded.copy()
    bad[1, 3] = (bad[1, 3] & 0xF0) | 0x5
    img, ok, reasons = sess.decode_with_reasons(bad)
    assert bool(ok[0]) and not bool(ok[1])
    assert reasons[1]["format_nibble"] == [False]
    assert all(reasons[1][k] == [True] for k in DECODE_REASONS
               if k != "format_nibble")

    # corrupt frame 0's chunk-compressor table (top_hdr=4, +8; hap.c:137-187
    # table layout): the tables reason flips
    bad = padded.copy()
    assert bad[0, 3] >> 4 == 0xC  # complex frame (flat band compresses)
    bad[0, 12] = 0x07  # unknown chunk compressor
    img, ok, reasons = sess.decode_with_reasons(bad)
    assert not bool(ok[0])
    assert reasons[0]["tables"] == [False]


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
