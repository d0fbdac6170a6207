"""Pixel <-> 4x4-block layout transforms and byte/word packing.

S3TC stores a frame as raster-ordered 4x4 texel blocks. On TPU we keep
frames as (H, W, C) arrays and blocks as (N, 16, C) arrays (N = block count,
16 texels in row-major order within the block) so every per-block op
vectorizes over the leading axis.

Odd dimensions (width/height not multiples of 4 — the reference's 'Odd
Dimensions' test pack, README.md:24) are handled by edge-replication padding
on encode and cropping on decode; block count is ceil(W/4)*ceil(H/4)
(hap.c:285-294 implies the payload covers whole blocks).
"""

from __future__ import annotations

import jax.numpy as jnp


def padded_dims(height: int, width: int) -> tuple:
    return ((height + 3) // 4) * 4, ((width + 3) // 4) * 4


def image_to_blocks(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) or (H, W) -> (N, 16[, C]) with edge-replication padding."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    ph, pw = padded_dims(h, w)
    if (ph, pw) != (h, w):
        img = jnp.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    bh, bw = ph // 4, pw // 4
    # Four static row-slices + stack instead of a 5-D transpose: the XLA
    # TPU lowering of the uint8 transpose costs ~6 ms at 4K while this
    # formulation is ~0.1 ms (tools/profile_pack_variants.py) — each slice
    # is a contiguous copy and the stack is a concatenate on a new axis.
    x = img.reshape(bh, 4, pw, c)
    rows = [x[:, r].reshape(bh, bw, 4, c) for r in range(4)]
    blocks = jnp.stack(rows, axis=2).reshape(bh * bw, 16, c)
    return blocks[..., 0] if squeeze else blocks


def blocks_to_image(blocks: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(N, 16[, C]) -> (H, W[, C]), cropping any edge-block padding."""
    squeeze = blocks.ndim == 2
    if squeeze:
        blocks = blocks[..., None]
    n, sixteen, c = blocks.shape
    ph, pw = padded_dims(height, width)
    bh, bw = ph // 4, pw // 4
    # Row-slices + stack (see image_to_blocks): ~0 ms at 4K vs ~5.6 ms for
    # the 5-D uint8 transpose lowering.
    x = blocks.reshape(bh, bw, 4, 4, c)
    rows = [x[:, :, r].reshape(bh, pw, c) for r in range(4)]
    img = jnp.stack(rows, axis=1).reshape(ph, pw, c)
    img = img[:height, :width]
    return img[..., 0] if squeeze else img


def pack_u8_to_u32(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4k) uint8 -> (..., k) uint32, little-endian.

    Uses bitcast (free — both TPU and CPU backends are little-endian; the
    shift/or formulation costs several ms at 4K frame sizes)."""
    import jax

    grouped = b.reshape(*b.shape[:-1], -1, 4)
    return jax.lax.bitcast_convert_type(grouped, jnp.uint32)


def unpack_u32_to_u8(w: jnp.ndarray) -> jnp.ndarray:
    """(..., k) uint32 -> (..., 4k) uint8, little-endian (bitcast)."""
    import jax

    bytes4 = jax.lax.bitcast_convert_type(w, jnp.uint8)  # (..., k, 4)
    return bytes4.reshape(*w.shape[:-1], -1)


def words_to_payload(words: jnp.ndarray) -> jnp.ndarray:
    """Any-shape uint32 words -> (4k,) uint8 little-endian payload.

    Reshapes to 128-lane rows before the bitcast: a (k, 4)-shaped bitcast
    intermediate tiles each 4-byte row onto an (8, 128) vreg — 32x padding,
    which XLA materializes at 16K frame sizes (a 15.8 GB HBM allocation)
    when fusion doesn't elide it. The (m, 128, 4) form is layout-native.
    """
    import jax

    flat = words.reshape(-1)
    k = flat.shape[0]
    pad = (-k) % 128
    if pad:
        flat = jnp.pad(flat, (0, pad))
    by = jax.lax.bitcast_convert_type(flat.reshape(-1, 128), jnp.uint8)
    # Pin the (m, 512) u8 materialization: without the barrier XLA keeps the
    # (m, 128, 4) bitcast shape through downstream converts and tiles its
    # trailing dim onto (8, 128) vregs — 32x padding, a 15.8 GB HLO temp at
    # 16K frame sizes.
    by = jax.lax.optimization_barrier(by.reshape(-1, 512))
    return by.reshape(-1)[: 4 * k]


def payload_to_words(payload: jnp.ndarray) -> jnp.ndarray:
    """(4k,) uint8 little-endian payload -> (k,) uint32 (lane-safe bitcast)."""
    import jax

    n = payload.shape[0]
    assert n % 4 == 0
    pad = (-n) % 512
    if pad:
        payload = jnp.pad(payload, (0, pad))
    w = jax.lax.bitcast_convert_type(
        payload.reshape(-1, 128, 4), jnp.uint32
    )  # (m, 128)
    return w.reshape(-1)[: n // 4]


# ---------------------------------------------------------------------------
# MXU lane permutations (round 4)
#
# Word interleave/de-interleave ((k, N) word planes <-> the (k*N,) payload
# word stream) is a fixed periodic LANE permutation — the class of op the
# VPU does worst (measured ~1 ms/frame at 4K via XLA relayouts) and the
# MXU does for free: permuting 128-lane rows is a matmul with a 0/1
# selection matrix. Operands are split into u8-valued f32 planes first, so
# every product is exact even under the MXU's bf16 passes (each output
# element receives exactly one nonzero product <= 255).
# ---------------------------------------------------------------------------

_IL_MATS: dict = {}


def _interleave_mats(k: int):
    """P_j (128, k*128) f32 one-hots: out[g, m] = W_j[g, 32q + l//k] for
    m = 128q + l with l % k == j — i.e. out word 128k*g + m is block
    (128g + c)'s word j."""
    import numpy as np

    if k in _IL_MATS:
        return _IL_MATS[k]
    assert 128 % k == 0
    mats = []
    for j in range(k):
        P = np.zeros((128, k * 128), np.float32)
        for m in range(k * 128):
            q, l = divmod(m, 128)
            if l % k == j:
                P[(128 // k) * q + l // k, m] = 1.0
        mats.append(P)
    _IL_MATS[k] = mats
    return mats


_DIL_MATS: dict = {}


def _deinterleave_mats(k: int):
    """Q_j (k*128, 128) f32 one-hots: the exact inverse of
    _interleave_mats — out_j[g, c] = X[g, (k*c + j) // 128, (k*c + j) % 128]
    with X viewed as (G, k, 128)."""
    import numpy as np

    if k in _DIL_MATS:
        return _DIL_MATS[k]
    mats = []
    for j in range(k):
        Q = np.zeros((k * 128, 128), np.float32)
        for c in range(128):
            w = k * c + j
            Q[128 * (w // 128) + (w % 128), c] = 1.0
        mats.append(Q)
    _DIL_MATS[k] = mats
    return mats


def interleave_words_mxu(ws) -> jnp.ndarray:
    """k word planes ((N,) uint32 each) -> (k*N,) uint32 payload words
    (block-major order: out[k*b + j] = ws[j][b])."""
    import jax

    k = len(ws)
    n = ws[0].shape[0]
    npad = -(-n // 128) * 128
    mats = _interleave_mats(k)
    acc = None
    for byte in range(4):
        tot = None
        for j, w in enumerate(ws):
            p = ((w >> jnp.uint32(8 * byte)) & jnp.uint32(0xFF)).astype(
                jnp.float32)
            if npad != n:
                p = jnp.pad(p, (0, npad - n))
            y = jnp.dot(p.reshape(-1, 128), mats[j],
                        preferred_element_type=jnp.float32)
            tot = y if tot is None else tot + y
        b = tot.astype(jnp.int32) << (8 * byte)
        acc = b if acc is None else acc | b
    out = jax.lax.bitcast_convert_type(acc, jnp.uint32)
    return out.reshape(-1)[: k * n]


def deinterleave_words_mxu(flat: jnp.ndarray, k: int):
    """(k*N,) uint32 payload words -> tuple of k (N,) uint32 word planes
    (inverse of interleave_words_mxu)."""
    import jax

    kn = flat.shape[0]
    n = kn // k
    npad = -(-kn // (k * 128)) * (k * 128)
    if npad != kn:
        flat = jnp.pad(flat, (0, npad - kn))
    mats = _deinterleave_mats(k)
    rows = flat.reshape(-1, k * 128)  # (G, k*128)
    accs = [None] * k
    for byte in range(4):
        p = ((rows >> jnp.uint32(8 * byte)) & jnp.uint32(0xFF)).astype(
            jnp.float32)
        for j in range(k):
            y = jnp.dot(p, mats[j], preferred_element_type=jnp.float32)
            b = y.astype(jnp.int32) << (8 * byte)
            accs[j] = b if accs[j] is None else accs[j] | b
    return tuple(
        jax.lax.bitcast_convert_type(a, jnp.uint32).reshape(-1)[:n]
        for a in accs)


def image_to_block_planes(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) or (H, W) -> (C, 16, N) uint8 LANE-MAJOR block planes.

    Same block (N) and texel (t = 4*row + col) ordering as
    image_to_blocks, but channel-planar with the block axis minor — every
    downstream (16, N) op tiles (8, 128) vregs with zero padding, where
    the (N, 16, C) form pads its (16, C) tiled dims ~42x.

    The column split (moving the 4 in-block columns off the lane axis)
    would be a strided lane shuffle; instead the 4 adjacent u8 columns are
    bitcast to ONE u32 lane and the texels extracted with elementwise
    shifts — the only true relayout is the initial channel transpose.
    """
    import jax

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    ph, pw = padded_dims(h, w)
    if (ph, pw) != (h, w):
        img = jnp.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    bh, bw = ph // 4, pw // 4
    # Channel deinterleave: the plain u8 transpose measures 0.19 ms/frame
    # at 4K — an MXU one-hot-matmul variant was measured 10x SLOWER
    # (1.99 ms: the (.., 96)-lane byte-plane reshapes it needs are
    # themselves relayouts), unlike the word interleave below where the
    # operands are native 128-lane rows. Keep the transpose.
    p = img.transpose(2, 0, 1)  # (C, PH, PW): the one interleaved-read
    x = p.reshape(c, bh, 4, pw)
    texels = []
    for r in range(4):
        row = x[:, :, r, :].reshape(c, bh, bw, 4)
        w32 = jax.lax.bitcast_convert_type(row, jnp.uint32)  # (C, bh, bw)
        flat = w32.reshape(c, bh * bw)
        for col in range(4):
            texels.append(((flat >> (8 * col)) & 0xFF).astype(jnp.uint8))
    return jnp.stack(texels, axis=1)  # (C, 16, N)


def block_planes_to_image(planes: jnp.ndarray, height: int, width: int
                          ) -> jnp.ndarray:
    """(C, 16, N) uint8 planes -> (H, W[, C]) — inverse of
    image_to_block_planes (u32-compose twin of the extract trick)."""
    import jax

    c = planes.shape[0]
    ph, pw = padded_dims(height, width)
    bh, bw = ph // 4, pw // 4
    rows = []
    for r in range(4):
        w32 = sum(
            planes[:, 4 * r + col].astype(jnp.uint32) << (8 * col)
            for col in range(4)
        )  # (C, N)
        by = jax.lax.bitcast_convert_type(
            w32.reshape(c, bh, bw)[..., None], jnp.uint8
        )  # (C, bh, bw, 1, 4)
        rows.append(by.reshape(c, bh, pw))
    # Channel interleave: plain transpose (see image_to_block_planes'
    # route note — the MXU variant loses here).
    img = jnp.stack(rows, axis=2).reshape(c, ph, pw).transpose(1, 2, 0)
    img = img[:height, :width]
    return img[..., 0] if c == 1 else img
