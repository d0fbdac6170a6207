"""Corruption fuzzing of the on-device frame decoder.

The reference degrades malformed input to HapResult_Bad_Frame instead of
crashing (hap.c bounds checks throughout; SURVEY.md §5). The device decoder
mirrors that as a total function with an ok flag. Invariants asserted here:

* NEVER crash on corrupted bytes;
* ok=True implies the host decoder accepts the same bytes AND produces the
  same pixels (corruptions inside raw-chunk payload produce different but
  still-legal frames — both sides must then agree);
* corruption of STRUCTURAL bytes of a Complex frame (top length, type byte,
  section headers, size table) must be rejected, like the reference's
  section bounds checks (hap.c:142-184).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hap_tpu.constants import HapError
from hap_tpu.pipeline.codecs import decode_frame
from hap_tpu.pipeline.device_pipeline import decode_pipeline, encode_pipeline


H, W, CODEC, CHUNKS = 32, 64, "hap_q", 4


def _encode(img):
    buf, flen = jax.jit(lambda x: encode_pipeline(x, CODEC, CHUNKS))(
        jnp.asarray(img)
    )
    return np.asarray(buf), int(flen)


@pytest.fixture(scope="module")
def complex_frame():
    """Compressible content (flat -> G-periodic BC3 payload) -> Complex."""
    img = np.full((H, W, 3), 77, np.uint8)
    buf, flen = _encode(img)
    assert (buf[3] >> 4) == 0xC, "fixture must store Complex"
    return buf, flen


@pytest.fixture(scope="module")
def raw_frame():
    """Incompressible content -> whole-frame raw fallback (hap.c:478-495)."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    buf, flen = _encode(img)
    assert (buf[3] >> 4) == 0xA, "fixture must store raw"
    return buf, flen


def _check(frame_np, flen):
    dev, ok = jax.jit(lambda f: decode_pipeline(f, H, W, CODEC, CHUNKS))(
        jnp.asarray(frame_np)
    )
    ok = bool(ok)
    fb = bytes(frame_np[:flen])
    try:
        host = decode_frame(fb, H, W)
        host_ok = True
    except (HapError, ValueError, AssertionError):
        host_ok = False
    if ok:
        assert host_ok, "device accepted a frame the host rejects"
        np.testing.assert_array_equal(np.asarray(dev), np.asarray(host))
    return ok


@pytest.mark.parametrize("fixture", ["complex_frame", "raw_frame"])
def test_clean_frames_decode(fixture, request):
    buf, flen = request.getfixturevalue(fixture)
    assert _check(buf, flen)


@pytest.mark.parametrize("fixture", ["complex_frame", "raw_frame"])
def test_single_byte_corruptions_consistent(fixture, request):
    buf, flen = request.getfixturevalue(fixture)
    rng = np.random.default_rng(7)
    positions = list(range(min(48, flen))) + sorted(
        rng.integers(48, flen, 32).tolist()
    )
    for pos in positions:
        for delta in (1, 0x80):
            f = buf.copy()
            f[pos] ^= delta
            _check(f, flen)  # invariants asserted inside


def test_complex_structural_corruptions_rejected(complex_frame):
    buf, flen = complex_frame
    rejected = total = 0
    # Top header (length + type), DIC header, compressor-table header: all
    # structural for a Complex frame.
    for pos in range(16):
        for delta in (1, 0x80):
            f = buf.copy()
            f[pos] ^= delta
            total += 1
            if not _check(f, flen):
                rejected += 1
    assert rejected == total, f"only {rejected}/{total} rejected"
    # Size-table corruption shifts every later chunk -> must reject.
    f = buf.copy()
    f[4 + 4 + 4 + CHUNKS + 4] ^= 0x40  # first size entry, mid bits
    assert not _check(f, flen)


def test_truncated_and_zeroed_frames(complex_frame):
    buf, flen = complex_frame
    zero = np.zeros_like(buf)
    assert not _check(zero, flen)
    trunc = buf.copy()
    trunc[flen // 2 :] = 0  # torn snappy streams
    assert not _check(trunc, flen)


def test_wrong_type_nibbles(complex_frame):
    buf, flen = complex_frame
    for nib in (0x00, 0x5F, 0xBF, 0xCE):
        f = buf.copy()
        f[3] = nib
        assert not _check(f, flen)
