"""BCn block kernels: decode golden tests vs the scalar oracle, encode

quality and structural properties, layout round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu.kernels import (
    bc1_decode_blocks,
    bc1_encode_blocks,
    bc3_decode_blocks,
    bc3_encode_blocks,
    bc4_decode_blocks,
    bc4_encode_blocks,
    blocks_to_image,
    cocgsy_to_rgb,
    image_to_blocks,
    pack_u8_to_u32,
    rgb_to_cocgsy,
    unpack_u32_to_u8,
)
from hap_tpu.kernels import scalar_ref


def words_from_bytes(raw: bytes, words_per_block: int) -> jnp.ndarray:
    arr = np.frombuffer(raw, dtype="<u4").reshape(-1, words_per_block)
    return jnp.asarray(arr)


def psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(255.0**2 / mse)


def smooth_test_image(h, w, seed=0):
    """Natural-ish image: smooth gradients + low-amplitude noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    g = 128 + 90 * np.cos(xx / 17.0 + 1) * np.sin(yy / 41.0)
    b = 128 + 90 * np.sin((xx + yy) / 29.0)
    img = np.stack([r, g, b], axis=-1) + rng.normal(0, 4, (h, w, 3))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Layout
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("h,w", [(4, 4), (8, 16), (64, 128), (5, 7), (1, 1), (17, 33)])
def test_layout_roundtrip(rng, h, w):
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blocks = image_to_blocks(jnp.asarray(img))
    back = blocks_to_image(blocks, h, w)
    np.testing.assert_array_equal(np.asarray(back), img)


def test_layout_single_channel(rng):
    img = rng.integers(0, 256, (12, 20), dtype=np.uint8)
    blocks = image_to_blocks(jnp.asarray(img))
    assert blocks.shape == (3 * 5, 16)
    np.testing.assert_array_equal(np.asarray(blocks_to_image(blocks, 12, 20)), img)


def test_pack_unpack_u32(rng):
    b = rng.integers(0, 256, (7, 16), dtype=np.uint8)
    w = pack_u8_to_u32(jnp.asarray(b))
    assert w.shape == (7, 4)
    np.testing.assert_array_equal(np.asarray(unpack_u32_to_u8(w)), b)
    # little-endian check
    one = pack_u8_to_u32(jnp.asarray(np.array([[1, 2, 3, 4]], dtype=np.uint8)))
    assert int(one[0, 0]) == 0x04030201


# ---------------------------------------------------------------------------
# Decode golden tests vs scalar oracle
# ---------------------------------------------------------------------------

def test_bc1_decode_matches_oracle(rng):
    raw = rng.integers(0, 256, 8 * 512, dtype=np.uint8).tobytes()
    rgb_j, alpha_j = bc1_decode_blocks(words_from_bytes(raw, 2))
    rgb_s, alpha_s = scalar_ref.bc1_decode(raw)
    np.testing.assert_array_equal(np.asarray(rgb_j), rgb_s)
    np.testing.assert_array_equal(np.asarray(alpha_j), alpha_s)


def test_bc1_decode_both_modes():
    # Force c0 > c1 and c0 <= c1 cases explicitly, all 4 codes used.
    blocks = []
    for c0, c1 in [(0xF800, 0x001F), (0x001F, 0xF800), (0x1234, 0x1234)]:
        idx = 0b11100100_11100100_11100100_11100100
        blocks.append(
            bytes([c0 & 0xFF, c0 >> 8, c1 & 0xFF, c1 >> 8])
            + idx.to_bytes(4, "little")
        )
    raw = b"".join(blocks)
    rgb_j, alpha_j = bc1_decode_blocks(words_from_bytes(raw, 2))
    rgb_s, alpha_s = scalar_ref.bc1_decode(raw)
    np.testing.assert_array_equal(np.asarray(rgb_j), rgb_s)
    np.testing.assert_array_equal(np.asarray(alpha_j), alpha_s)
    # 3-color mode (c0<=c1) with code 3 -> transparent black
    assert (np.asarray(alpha_j)[1] == 0).any()


def test_bc4_decode_matches_oracle(rng):
    raw = rng.integers(0, 256, 8 * 512, dtype=np.uint8).tobytes()
    vals_j = bc4_decode_blocks(words_from_bytes(raw, 2))
    vals_s = scalar_ref.bc4_decode(raw)
    np.testing.assert_array_equal(np.asarray(vals_j), vals_s)


def test_bc3_decode_matches_oracle(rng):
    raw = rng.integers(0, 256, 16 * 512, dtype=np.uint8).tobytes()
    rgba_j = bc3_decode_blocks(words_from_bytes(raw, 4))
    rgba_s = scalar_ref.bc3_decode(raw)
    np.testing.assert_array_equal(np.asarray(rgba_j), rgba_s)


# ---------------------------------------------------------------------------
# Encode: structure + round-trip quality
# ---------------------------------------------------------------------------

def test_bc1_encode_solid_blocks_exact():
    # Solid primary-ish colors representable in 565 must round-trip exactly.
    # All channel values are exact 565 fixpoints (expand565(quantize565(v)) == v).
    colors = np.array([[255, 255, 255], [0, 0, 0], [255, 0, 0], [8, 65, 16]],
                      dtype=np.uint8)
    px = np.repeat(colors[:, None, :], 16, axis=1)
    words = bc1_encode_blocks(jnp.asarray(px))
    rgb, _ = bc1_decode_blocks(words)
    np.testing.assert_array_equal(np.asarray(rgb), px)


def test_bc1_encode_never_punchthrough(rng):
    px = rng.integers(0, 256, (256, 16, 3), dtype=np.uint8)
    words = np.asarray(bc1_encode_blocks(jnp.asarray(px)))
    c0 = words[:, 0] & 0xFFFF
    c1 = words[:, 0] >> 16
    assert (c0 >= c1).all()
    _, alpha = bc1_decode_blocks(jnp.asarray(words))
    assert (np.asarray(alpha) == 255).all()


def test_bc1_encode_two_color_blocks_exact():
    # Blocks with exactly two 565-representable colors must be exact.
    a = np.array([255, 0, 0], dtype=np.uint8)
    b = np.array([0, 0, 255], dtype=np.uint8)
    px = np.stack([np.array([a if t % 2 else b for t in range(16)])])
    words = bc1_encode_blocks(jnp.asarray(px))
    rgb, _ = bc1_decode_blocks(words)
    np.testing.assert_array_equal(np.asarray(rgb), px)


def test_bc1_roundtrip_quality():
    img = smooth_test_image(64, 64)
    blocks = image_to_blocks(jnp.asarray(img))
    words = bc1_encode_blocks(blocks)
    rgb, _ = bc1_decode_blocks(words)
    out = blocks_to_image(rgb, 64, 64)
    q = psnr(img, out)
    assert q > 35.0, f"BC1 PSNR too low: {q:.2f} dB"


def test_bc4_encode_solid_exact(rng):
    vals = np.repeat(rng.integers(0, 256, (32, 1), dtype=np.uint8), 16, axis=1)
    words = bc4_encode_blocks(jnp.asarray(vals))
    out = bc4_decode_blocks(words)
    np.testing.assert_array_equal(np.asarray(out), vals)


def test_bc4_encode_endpoints_exact(rng):
    # Blocks containing only two distinct values must round-trip exactly.
    vals = np.where(rng.random((64, 16)) < 0.5, 40, 200).astype(np.uint8)
    words = bc4_encode_blocks(jnp.asarray(vals))
    out = bc4_decode_blocks(words)
    np.testing.assert_array_equal(np.asarray(out), vals)


def test_bc4_roundtrip_quality_fullrange(rng):
    # Full 0..255 ramp per block: 8 palette levels -> ~28 dB is the format's
    # theoretical ceiling; assert we are near it.
    ramp = np.linspace(0, 255, 16)[None, :] + rng.normal(0, 6, (128, 16))
    vals = np.clip(np.round(ramp), 0, 255).astype(np.uint8)
    words = bc4_encode_blocks(jnp.asarray(vals))
    out = bc4_decode_blocks(words)
    q = psnr(vals, out)
    assert q > 26.0, f"BC4 PSNR too low: {q:.2f} dB"


def test_bc4_roundtrip_quality_narrowrange(rng):
    # Narrow-range blocks (real alpha masks) should be near-transparent.
    base = rng.integers(0, 200, (128, 1))
    vals = np.clip(base + rng.integers(0, 40, (128, 16)), 0, 255).astype(np.uint8)
    words = bc4_encode_blocks(jnp.asarray(vals))
    out = bc4_decode_blocks(words)
    q = psnr(vals, out)
    assert q > 40.0, f"BC4 narrow-range PSNR too low: {q:.2f} dB"


def test_bc3_roundtrip_quality(rng):
    img = smooth_test_image(32, 32, seed=3)
    alpha = np.clip(
        np.round(128 + 90 * np.sin(np.arange(32)[:, None] / 9.0)
                 + np.zeros((32, 32))), 0, 255
    ).astype(np.uint8)
    rgba = np.concatenate([img, alpha[:, :, None]], axis=-1)
    blocks = image_to_blocks(jnp.asarray(rgba))
    words = bc3_encode_blocks(blocks)
    assert words.shape == (64, 4)
    out_blocks = bc3_decode_blocks(words)
    out = blocks_to_image(out_blocks, 32, 32)
    q = psnr(rgba, out)
    assert q > 35.0, f"BC3 PSNR too low: {q:.2f} dB"


def test_bc3_bytes_layout(rng):
    # BC3 words -> bytes -> scalar oracle agrees with JAX decode.
    px = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    words = bc3_encode_blocks(jnp.asarray(px))
    raw = unpack_u32_to_u8(words.reshape(1, -1))  # interleave check
    raw_bytes = np.asarray(raw, dtype=np.uint8).tobytes()
    rgba_s = scalar_ref.bc3_decode(raw_bytes)
    rgba_j = np.asarray(bc3_decode_blocks(words))
    np.testing.assert_array_equal(rgba_j, rgba_s)


# ---------------------------------------------------------------------------
# YCoCg
# ---------------------------------------------------------------------------

def test_ycocg_roundtrip_exactish(rng):
    px = rng.integers(0, 256, (100, 16, 3), dtype=np.uint8)
    enc = rgb_to_cocgsy(jnp.asarray(px))
    dec = cocgsy_to_rgb(enc)
    err = np.abs(np.asarray(dec).astype(int) - px.astype(int))
    # Transform quantization error must be tiny (scale >= 1 keeps chroma
    # within +-1, scale>1 blocks are even tighter).
    assert err.max() <= 2, err.max()


def test_ycocg_gray_is_exact():
    gray = np.repeat(np.arange(16, dtype=np.uint8)[None, :, None] * 17, 3, axis=2)
    enc = rgb_to_cocgsy(jnp.asarray(gray))
    dec = cocgsy_to_rgb(enc)
    np.testing.assert_array_equal(np.asarray(dec), gray)
    # Gray blocks have zero chroma -> scale 4.
    assert (np.asarray(enc)[..., 2] == 24).all()


def test_ycocg_scale_selection():
    # Saturated red block: large chroma -> scale 1 (B byte == 0).
    red = np.zeros((1, 16, 3), dtype=np.uint8)
    red[..., 0] = 255
    enc = rgb_to_cocgsy(jnp.asarray(red))
    assert (np.asarray(enc)[..., 2] == 0).all()


def test_ycocg_hapq_pipeline_quality():
    img = smooth_test_image(64, 64, seed=7)
    blocks = image_to_blocks(jnp.asarray(img))
    cocg = rgb_to_cocgsy(blocks)
    words = bc3_encode_blocks(cocg)
    out_cocg = bc3_decode_blocks(words)
    out = blocks_to_image(cocgsy_to_rgb(out_cocg), 64, 64)
    q = psnr(img, out)
    # Hap Q should beat plain BC1 on quality.
    assert q > 38.0, f"Hap Q PSNR too low: {q:.2f} dB"


def test_f32_reciprocal_palette_math_exhaustive():
    """The decode kernels compute (w*a + (wmax-w)*b + bias) // div as
    floor(m * f32(1/div)) (VPU-native f32 instead of slow int32 mul/div).
    Exhaustive proof over the full operand space that the f32 form equals
    integer division for every divisor the BCn palettes use."""
    f32 = np.float32
    for div, bias, wmax in ((3, 1, 3), (7, 3, 7), (5, 2, 5), (2, 1, 1)):
        recip = f32(1.0) / f32(div)
        w = np.arange(0, wmax + 1, dtype=np.int64)[:, None, None]
        a = np.arange(256, dtype=np.int64)[None, :, None]
        b = np.arange(256, dtype=np.int64)[None, None, :]
        m = w * a + (wmax - w) * b + bias if div != 2 else a + b + bias
        ref = m // div
        got = np.floor((m.astype(f32) * recip).astype(f32)).astype(np.int64)
        assert (got == ref).all(), div


# ---------------------------------------------------------------------------
# Planar decode twins (round 4): bit-identical to the interleaved decoders
# ---------------------------------------------------------------------------

def test_bc1_decode_planes_matches_interleaved(rng):
    from hap_tpu.kernels.bc1 import bc1_decode_planes

    words = rng.integers(0, 2**32, (512, 2), dtype=np.uint32)
    # Force a spread of both 3- and 4-color blocks.
    w = jnp.asarray(words)
    for punch in (True, False):
        rgb_i, alpha_i = bc1_decode_blocks(w, dxt1_punchthrough=punch)
        rgb_p, opaque_p = bc1_decode_planes(w[:, 0], w[:, 1],
                                            dxt1_punchthrough=punch)
        # planar (3, 16, N) f32 -> interleaved (N, 16, 3) u8
        got = np.asarray(rgb_p).astype(np.uint8).transpose(2, 1, 0)
        np.testing.assert_array_equal(got, np.asarray(rgb_i))
        np.testing.assert_array_equal(
            np.asarray(opaque_p).T, np.asarray(alpha_i) == 255)


def test_bc4_decode_planes_matches_interleaved(rng):
    from hap_tpu.kernels.bc4 import bc4_decode_planes

    words = rng.integers(0, 2**32, (512, 2), dtype=np.uint32)
    w = jnp.asarray(words)
    got = np.asarray(bc4_decode_planes(w[:, 0], w[:, 1])).astype(np.uint8).T
    np.testing.assert_array_equal(got, np.asarray(bc4_decode_blocks(w)))


def test_cocgs_y_to_rgb_planes_matches_interleaved(rng):
    from hap_tpu.kernels.ycocg import cocgs_y_to_rgb, cocgs_y_to_rgb_planes

    n = 256
    cocgs = rng.integers(0, 256, (n, 16, 3), dtype=np.uint8)
    cocgs[..., 2] = rng.choice([0, 8, 24], (n, 16))
    y = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    want = np.asarray(cocgs_y_to_rgb(jnp.asarray(cocgs), jnp.asarray(y)))
    planes = jnp.asarray(
        cocgs.transpose(2, 1, 0).astype(np.float32))  # (3, 16, N)
    got = np.asarray(cocgs_y_to_rgb_planes(
        planes, jnp.asarray(y.T.astype(np.float32))))
    np.testing.assert_array_equal(got.transpose(2, 1, 0), want)


def test_bc1_best_effort_beats_fast_and_stays_valid(rng):
    """effort='best' (endpoint-shrink + cluster-fit candidates) must
    never lose to the fast recipe under EXACT decode, win clearly on
    structured content, and keep emitting valid 4-color-mode blocks that
    the scalar oracle decodes identically to the JAX decoder."""
    from hap_tpu.kernels.bc1 import bc1_encode_planes_words
    from hap_tpu.kernels.layout import image_to_block_planes
    from hap_tpu.kernels import scalar_ref

    # the anchor graphics class — sharp flat regions where index-
    # assignment search beats local LS refine (the measured +1.87 dB
    # gap-to-optimal case; on smooth gradients or dithered content both
    # recipes land within a few percent of each other)
    from tools.bench_content import make_frame

    h = w = 128
    img = make_frame("graphics", 0, h, w)
    planes = image_to_block_planes(jnp.asarray(img))
    src = np.asarray(planes).astype(np.int64)

    def run(cand):
        w0, w1 = bc1_encode_planes_words(planes, refine_iters=2,
                                         candidates=cand)
        words = np.stack([np.asarray(w0), np.asarray(w1)], 1)
        rgb, _ = scalar_ref.bc1_decode(words.astype("<u4").tobytes())
        dec = np.asarray(rgb).reshape(-1, 16, 3).transpose(2, 1, 0)
        jrgb, _ = bc1_decode_blocks(jnp.asarray(words))
        np.testing.assert_array_equal(
            np.asarray(jrgb).transpose(2, 1, 0), dec)
        c0 = words[:, 0] & 0xFFFF
        c1 = words[:, 0] >> 16
        assert (c0 >= c1).all()
        err = (dec.astype(np.int64) - src) ** 2
        return err.sum(), err[:, :, : err.shape[2] // 2].sum()

    sse_fast, _ = run(False)
    sse_best, _ = run(True)
    assert sse_best <= sse_fast
    # anchor-measured improvement is ~35% MSE (44.69 -> 46.56 dB at
    # 256px); require a solid fraction of it with margin
    assert sse_best < 0.8 * sse_fast
