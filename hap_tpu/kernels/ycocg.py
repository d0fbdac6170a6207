"""Scaled YCoCg <-> RGB transform for Hap Q (normative external reference [3]

of the Hap spec: van Waveren & Castano, "Real-Time YCoCg-DXT Compression",
HapVideoDRAFT.md:24,147). Hap Q stores CoCg_Y layout inside a BC3 texture:

  R channel = Co/scale + 0.5,   G channel = Cg/scale + 0.5,
  B channel = (scale - 1) * 8   (so scale = B/8 + 1; legal scales 1, 2, 4),
  A channel = Y.

The per-4x4-block scale expands low-amplitude chroma to use more of the
quantization range; the decode shader divides it back out. Both directions
are pure element-wise VPU math and fuse into the adjacent BC3 kernels under
jit.
"""

from __future__ import annotations

import jax.numpy as jnp

_F32 = jnp.float32

_OFFSET = 128.0  # chroma zero point in 8-bit space


def rgb_to_cocgsy(blocks_rgb: jnp.ndarray) -> jnp.ndarray:
    """(N, 16, 3) uint8 RGB -> (N, 16, 4) uint8 CoCg_scale_Y blocks.

    Per-block scale in {1, 2, 4} chosen from the chroma amplitude, exactly
    the scaled-YCoCg-DXT5 scheme: scale 4 when max|Co|,|Cg| < 32, scale 2
    when < 64, else 1.
    """
    rgb = blocks_rgb.astype(_F32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    co = r - b  # [-255, 255]
    t = b + co * 0.5
    cg = g - t  # [-255, 255]
    y = t + cg * 0.5  # [0, 255]

    amp = jnp.maximum(
        jnp.max(jnp.abs(co), axis=1), jnp.max(jnp.abs(cg), axis=1)
    )  # (N,)
    # Halved chroma fits in +-127.5; choose the largest power-of-two scale
    # that keeps scale*|c|/2 within the byte range.
    half_amp = amp * 0.5
    scale = jnp.where(half_amp < 32.0, 4.0, jnp.where(half_amp < 64.0, 2.0, 1.0))
    s = scale[:, None]

    co_b = jnp.clip(jnp.round(co * 0.5 * s + _OFFSET), 0, 255)
    cg_b = jnp.clip(jnp.round(cg * 0.5 * s + _OFFSET), 0, 255)
    scale_b = jnp.broadcast_to((scale[:, None] - 1.0) * 8.0, co_b.shape)
    y_b = jnp.clip(jnp.round(y), 0, 255)
    return jnp.stack([co_b, cg_b, scale_b, y_b], axis=-1).astype(jnp.uint8)


def rgb_to_cocgs_y(blocks_rgb: jnp.ndarray):
    """Split-output encoder transform: (N, 16, 3) uint8 RGB ->
    ((N, 16, 3) uint8 CoCg_scale, (N, 16) uint8 Y).

    Same math as rgb_to_cocgsy without interleaving Y into a 4-channel
    array the BC3 encoder would immediately split back out (the interleave
    is a payload-sized relayout on TPU)."""
    rgb = blocks_rgb.astype(_F32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    co = r - b
    t = b + co * 0.5
    cg = g - t
    y = t + cg * 0.5
    amp = jnp.maximum(jnp.max(jnp.abs(co), axis=1), jnp.max(jnp.abs(cg), axis=1))
    half_amp = amp * 0.5
    scale = jnp.where(half_amp < 32.0, 4.0, jnp.where(half_amp < 64.0, 2.0, 1.0))
    s = scale[:, None]
    co_b = jnp.clip(jnp.round(co * 0.5 * s + _OFFSET), 0, 255)
    cg_b = jnp.clip(jnp.round(cg * 0.5 * s + _OFFSET), 0, 255)
    scale_b = jnp.broadcast_to((scale[:, None] - 1.0) * 8.0, co_b.shape)
    y_b = jnp.clip(jnp.round(y), 0, 255)
    cocgs = jnp.stack([co_b, cg_b, scale_b], axis=-1).astype(jnp.uint8)
    return cocgs, y_b.astype(jnp.uint8)


def cocgsy_to_rgb(blocks: jnp.ndarray) -> jnp.ndarray:
    """(N, 16, 4) uint8 CoCg_scale_Y -> (N, 16, 3) uint8 RGB (decode shader)."""
    return cocgs_y_to_rgb(blocks[..., :3], blocks[..., 3])


def cocgs_y_to_rgb(cocgs: jnp.ndarray, y8: jnp.ndarray) -> jnp.ndarray:
    """Split-input decode shader: ((N, 16, 3) CoCg_scale, (N, 16) Y) -> RGB.

    Takes the BC1-half and BC4-half decoder outputs directly, so the hap_q
    device path never materializes an interleaved (N, 16, 4) block array
    (a payload-sized relayout). Scales are powers of two, so the divide is
    an exact multiply by a selected reciprocal.
    """
    v = cocgs.astype(_F32)
    sb = v[..., 2]  # (scale - 1) * 8 in {0, 8, 24}
    inv2 = jnp.where(sb < 4.0, 2.0, jnp.where(sb < 16.0, 1.0, 0.5))  # 2/scale
    co = (v[..., 0] - _OFFSET) * inv2
    cg = (v[..., 1] - _OFFSET) * inv2
    y = y8.astype(_F32)
    t = y - cg * 0.5
    g = cg + t
    b = t - co * 0.5
    r = b + co
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def cocgs_y_to_rgb_planes(cocgs: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LANE-MAJOR twin of cocgs_y_to_rgb: ((3, 16, N) float CoCg_scale
    planes, (16, N) float Y) -> (3, 16, N) uint8 RGB planes. Same
    round/clip results as the interleaved path."""
    return cocgs_y_to_rgb_planes_f32(cocgs, y).astype(jnp.uint8)


def cocgs_y_to_rgb_planes_f32(cocgs: jnp.ndarray, y: jnp.ndarray
                              ) -> jnp.ndarray:
    """cocgs_y_to_rgb_planes before the final uint8 cast (integer-valued
    f32 — the fused Pallas kernel casts via int32; Mosaic has no direct
    f32 -> u8 cast)."""
    sb = cocgs[2]  # (scale - 1) * 8 in {0, 8, 24}
    inv2 = jnp.where(sb < 4.0, 2.0, jnp.where(sb < 16.0, 1.0, 0.5))  # 2/scale
    co = (cocgs[0] - _OFFSET) * inv2
    cg = (cocgs[1] - _OFFSET) * inv2
    t = y - cg * 0.5
    g = cg + t
    b = t - co * 0.5
    r = b + co
    rgb = jnp.stack([r, g, b])
    return jnp.clip(jnp.round(rgb), 0, 255)


def rgb_to_cocgs_y_planes(rgb_planes: jnp.ndarray):
    """LANE-MAJOR twin of rgb_to_cocgs_y: (3, 16, N) uint8 RGB planes ->
    ((3, 16, N) float32 CoCg_scale planes, (16, N) float32 Y).

    Outputs stay float (they feed the BC1/BC4 plane encoders directly);
    values are the same round/clip results as the uint8 path.
    """
    r = rgb_planes[0].astype(_F32)
    g = rgb_planes[1].astype(_F32)
    b = rgb_planes[2].astype(_F32)
    co = r - b
    t = b + co * 0.5
    cg = g - t
    y = t + cg * 0.5
    amp = jnp.maximum(jnp.max(jnp.abs(co), axis=0), jnp.max(jnp.abs(cg), axis=0))
    half_amp = amp * 0.5
    scale = jnp.where(half_amp < 32.0, 4.0, jnp.where(half_amp < 64.0, 2.0, 1.0))
    s = scale[None, :]
    co_b = jnp.clip(jnp.round(co * 0.5 * s + _OFFSET), 0, 255)
    cg_b = jnp.clip(jnp.round(cg * 0.5 * s + _OFFSET), 0, 255)
    scale_b = jnp.broadcast_to((scale[None, :] - 1.0) * 8.0, co_b.shape)
    y_b = jnp.clip(jnp.round(y), 0, 255)
    return jnp.stack([co_b, cg_b, scale_b]), y_b
