"""BC7 (BPTC UNORM) block decoder in pure JAX, plus a mode-6 encoder.

Format: BPTC specification (normative external reference [4] of the Hap
spec, HapVideoDRAFT.md:25,148). A 16-byte block's mode is the position of
the lowest set bit of byte 0; fields follow in spec order: partition /
rotation / index-selection, color endpoints (all R, all G, all B), alpha
endpoints, P-bits, then index planes. Blocks with byte0 == 0 are invalid
and decode to transparent black, per the D3D11 functional spec.

Decode computes all 8 modes vectorized and selects per block — 8x the
arithmetic but no divergence, which is the right trade on a VPU.

Hap carries BC7 as the 'Hap R' / Hap7 family (HapVideoDRAFT.md:141); the
reference container treats it as pass-through payload (hap.c:49,292-294).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.kernels.bc7_tables import (
    ANCHOR2_2,
    ANCHOR3_2,
    ANCHOR3_3,
    MODES,
    PARTITIONS2,
    PARTITIONS3,
    WEIGHTS,
)

_I32 = jnp.int32
_U32 = jnp.uint32


def _get_bits_static(words: jnp.ndarray, start: int, length: int) -> jnp.ndarray:
    """Extract bits [start, start+length) from (N, 4) uint32 blocks (LE)."""
    if length == 0:
        return jnp.zeros(words.shape[0], _I32)
    w = start // 32
    b = start % 32
    lo = words[:, w] >> b
    if b + length > 32:
        lo = lo | (words[:, w + 1] << (32 - b))
    return (lo & ((1 << length) - 1)).astype(_I32)


def _get_bits_dynamic(words: jnp.ndarray, start: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Extract bits at per-texel dynamic offsets. words (N,4); start/length

    (N,16) int32. Returns (N,16) int32."""
    widx = (start >> 5).astype(_I32)  # (N,16)
    b = (start & 31).astype(_U32)
    # Select word widx and widx+1 via where-chain over the 4 words.
    w_sel = jnp.zeros(start.shape, _U32)
    w_nxt = jnp.zeros(start.shape, _U32)
    for k in range(4):
        w_sel = jnp.where(widx == k, words[:, k][:, None], w_sel)
        w_nxt = jnp.where(widx + 1 == k, words[:, k][:, None], w_nxt)
    up = jnp.clip(32 - b.astype(_I32), 0, 31).astype(_U32)
    val = (w_sel >> b) | jnp.where(b > 0, w_nxt << up, 0)
    mask = ((1 << length.astype(_U32)) - 1).astype(_U32)
    return (val & mask).astype(_I32)


def _unquant(e: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Left-align to 8 bits with high-bit replication."""
    if depth >= 8:
        return e
    v = e << (8 - depth)
    return v | (v >> depth)


def _decode_mode(words: jnp.ndarray, mode: int):
    """Decode every block as if it were ``mode``. Returns (N, 16, 4) int32."""
    cfg = MODES[mode]
    NS, PB, RB, ISB = cfg["NS"], cfg["PB"], cfg["RB"], cfg["ISB"]
    CB, AB, EPB, SPB = cfg["CB"], cfg["AB"], cfg["EPB"], cfg["SPB"]
    IB, IB2 = cfg["IB"], cfg["IB2"]
    n = words.shape[0]
    ne = 2 * NS

    pos = mode + 1
    partition = _get_bits_static(words, pos, PB); pos += PB
    rotation = _get_bits_static(words, pos, RB); pos += RB
    idx_mode = _get_bits_static(words, pos, ISB); pos += ISB

    # Endpoints: R[ne], G[ne], B[ne], A[ne]
    chans = []
    for _ in range(3):
        ch = [ _get_bits_static(words, pos + i * CB, CB) for i in range(ne) ]
        pos += ne * CB
        chans.append(ch)
    if AB:
        ch = [ _get_bits_static(words, pos + i * AB, AB) for i in range(ne) ]
        pos += ne * AB
        chans.append(ch)

    # P-bits
    if EPB:
        pbits = [ _get_bits_static(words, pos + i, 1) for i in range(ne) ]
        pos += ne
    elif SPB:
        shared = [ _get_bits_static(words, pos + i, 1) for i in range(NS) ]
        pbits = [ shared[i // 2] for i in range(ne) ]
        pos += NS
    else:
        pbits = None

    # Reconstruct 8-bit endpoints: (ne, N, 4) -> stack to (N, ne, 4)
    cdepth = CB + (1 if pbits is not None else 0)
    adepth = (AB + (1 if pbits is not None else 0)) if AB else 0
    endpoints = []
    for i in range(ne):
        vals = []
        for c in range(3):
            e = chans[c][i]
            if pbits is not None:
                e = (e << 1) | pbits[i]
            vals.append(_unquant(e, cdepth))
        if AB:
            a = chans[3][i]
            if pbits is not None:
                a = (a << 1) | pbits[i]
            vals.append(_unquant(a, adepth))
        else:
            vals.append(jnp.full(n, 255, _I32))
        endpoints.append(jnp.stack(vals, axis=-1))  # (N, 4)
    endpoints = jnp.stack(endpoints, axis=1)  # (N, ne, 4)

    # Subset assignment and anchors per texel. Table rows are fetched with a
    # one-hot matmul instead of a gather (TPU gathers cost ~8ns/element;
    # (N,64)x(64,16) rides the MXU).
    def table_rows(table):
        onehot = jax.nn.one_hot(partition, table.shape[0], dtype=jnp.float32)
        return jnp.round(
            onehot @ jnp.asarray(table, jnp.float32)
        ).astype(_I32)

    def table_scalar(table):
        onehot = jax.nn.one_hot(partition, table.shape[0], dtype=jnp.float32)
        return jnp.round(onehot @ jnp.asarray(table, jnp.float32)).astype(_I32)

    if NS == 1:
        subset = jnp.zeros((n, 16), _I32)
        anchors = [jnp.zeros(n, _I32)]
    elif NS == 2:
        subset = table_rows(PARTITIONS2)  # (N, 16)
        anchors = [jnp.zeros(n, _I32), table_scalar(ANCHOR2_2[:, None])[:, 0]]
    else:
        subset = table_rows(PARTITIONS3)
        anchors = [
            jnp.zeros(n, _I32),
            table_scalar(ANCHOR3_2[:, None])[:, 0],
            table_scalar(ANCHOR3_3[:, None])[:, 0],
        ]

    texel = jnp.arange(16, dtype=_I32)[None, :]
    is_anchor = jnp.zeros((n, 16), jnp.bool_)
    for a in anchors:
        is_anchor = is_anchor | (texel == a[:, None])

    def read_index_plane(base_pos: int, bits: int):
        widths = jnp.where(is_anchor, bits - 1, bits)  # (N, 16)
        offs = jnp.concatenate(
            [jnp.zeros((n, 1), _I32), jnp.cumsum(widths[:, :-1], axis=1)], axis=1
        )
        return _get_bits_dynamic(words, base_pos + offs, widths)

    idx1 = read_index_plane(pos, IB)
    pos1_total = 16 * IB - len(anchors)
    if IB2:
        idx2 = read_index_plane(pos + pos1_total, IB2)
    else:
        idx2 = None

    # Per-texel endpoint pairs via where-chain over subsets
    e0 = endpoints[:, 0][:, None, :]
    e1 = endpoints[:, 1][:, None, :]
    for s in range(1, NS):
        sel = (subset == s)[:, :, None]
        e0 = jnp.where(sel, endpoints[:, 2 * s][:, None, :], e0)
        e1 = jnp.where(sel, endpoints[:, 2 * s + 1][:, None, :], e1)

    def interp(idx, bits):
        # gather-free weight lookup: where-chain over the small weight table
        table = WEIGHTS[bits]
        w = jnp.full(idx.shape, int(table[0]), _I32)
        for k in range(1, len(table)):
            w = jnp.where(idx == k, int(table[k]), w)
        w = w[:, :, None]
        return (e0 * (64 - w) + e1 * w + 32) >> 6

    if IB2:
        # Two planes: primary = color, secondary = alpha; idx_mode swaps.
        val1 = interp(idx1, IB)
        val2 = interp(idx2, IB2)
        swap = (idx_mode == 1)[:, None, None]
        color = jnp.where(swap, val2[..., :3], val1[..., :3])
        alpha = jnp.where(swap[..., 0], val1[..., 3], val2[..., 3])
        out = jnp.concatenate([color, alpha[..., None]], axis=-1)
    else:
        out = interp(idx1, IB)

    # Rotation: swap alpha with R/G/B
    if RB:
        for r, c in ((1, 0), (2, 1), (3, 2)):
            sel = (rotation == r)[:, None]
            a = out[..., 3]
            ch = out[..., c]
            out = out.at[..., 3].set(jnp.where(sel, ch, a))
            out = out.at[..., c].set(jnp.where(sel, a, ch))
    return out


@jax.jit
def bc7_decode_blocks(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) uint32 BC7 blocks -> (N, 16, 4) uint8 RGBA."""
    words = words.astype(_U32)
    byte0 = (words[:, 0] & 0xFF).astype(_I32)
    # mode = index of lowest set bit of byte0; byte0==0 -> invalid
    out = jnp.zeros((words.shape[0], 16, 4), _I32)
    for mode in range(8):
        sel = (byte0 & ((1 << (mode + 1)) - 1)) == (1 << mode)
        decoded = _decode_mode(words, mode)
        out = jnp.where(sel[:, None, None], decoded, out)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Mode-6 encoder: 1 subset, RGBA 7777+P, 4-bit indices — the workhorse
# single-subset mode; a good-quality general-purpose BC7 encode.
# ---------------------------------------------------------------------------

_W4 = WEIGHTS[4]


@partial(jax.jit, static_argnames=("refine_iters",))
def bc7_encode_blocks_mode6(pixels: jnp.ndarray, refine_iters: int = 1) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC7 mode-6 blocks."""
    from hap_tpu.kernels.bc1 import _fit_endpoints_ls, _principal_axis

    px = pixels.astype(jnp.float32)
    n = px.shape[0]

    axis = _principal_axis(px)  # works for 4 channels too
    mean = jnp.mean(px, axis=1)
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    e0f = mean + axis * jnp.min(t, axis=1)[:, None]
    e1f = mean + axis * jnp.max(t, axis=1)[:, None]

    weights_f = jnp.asarray(_W4, jnp.float32)[None, None, :] / 64.0  # (1,1,16)

    def quant(e):
        # 7 bits + shared-by-endpoint P bit: choose p minimizing error.
        e = jnp.clip(e, 0.0, 255.0)
        cands = []
        for p in (0, 1):
            q = jnp.clip(jnp.round((e - p) / 2.0), 0, 127).astype(_I32)
            v = (q << 1) | p
            v = v | (v >> 8)  # depth 8: identity
            cands.append((q, jnp.asarray(v, _I32)))
        err0 = jnp.sum((cands[0][1].astype(jnp.float32) - e) ** 2, axis=-1)
        err1 = jnp.sum((cands[1][1].astype(jnp.float32) - e) ** 2, axis=-1)
        use1 = (err1 < err0)[:, None]
        q = jnp.where(use1, cands[1][0], cands[0][0])
        p = jnp.where(use1[:, 0], 1, 0).astype(_I32)
        v = jnp.where(use1, cands[1][1], cands[0][1])
        return q, p, v

    def one_round(e0f, e1f):
        q0, p0, v0 = quant(e0f)
        q1, p1, v1 = quant(e1f)
        # palette (N,16_weights,4)
        pal = (
            v0[:, None, :].astype(jnp.float32) * (1.0 - weights_f.transpose(0, 2, 1))
            + v1[:, None, :].astype(jnp.float32) * weights_f.transpose(0, 2, 1)
        )  # (N,16,4) – entry per weight index
        d = px[:, :, None, :] - pal[:, None, :, :]
        codes = jnp.argmin(jnp.sum(d * d, axis=-1), axis=-1).astype(_I32)
        return q0, p0, q1, p1, codes

    q0, p0, q1, p1, codes = one_round(e0f, e1f)
    for _ in range(refine_iters):
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 16):  # gather-free weight select
            w = jnp.where(codes == k, float(_W4[k]) / 64.0, w)
        e0n, e1n = _fit_endpoints_ls(px, w, e0f, e1f)
        q0, p0, q1, p1, codes = one_round(e0n, e1n)
        e0f, e1f = e0n, e1n

    # Anchor rule: texel 0's index MSB must be 0; swap endpoints if violated.
    swap = codes[:, 0] >= 8
    codes = jnp.where(swap[:, None], 15 - codes, codes)
    q0s = jnp.where(swap[:, None], q1, q0)
    q1s = jnp.where(swap[:, None], q0, q1)
    p0s = jnp.where(swap, p1, p0)
    p1s = jnp.where(swap, p0, p1)

    # Pack: [1 bit mode=0b1000000? no: mode 6 -> bits '1000000' (7 bits:
    # six zeros then 1? lowest set bit = bit 6)] then R0,R1,G0,G1,B0,B1,
    # A0,A1 (7 bits each), P0, P1, then 63 index bits (texel 0 has 3 bits).
    bits = jnp.zeros((n, 4), _U32)

    def set_bits(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w, b = start // 32, start % 32
        bits = bits.at[:, w].set(bits[:, w] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w + 1].set(bits[:, w + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits(bits, 0, 7, jnp.full(n, 1 << 6, _I32))
    posn = 7
    for c in range(4):
        bits = set_bits(bits, posn, 7, q0s[:, c]); posn += 7
        bits = set_bits(bits, posn, 7, q1s[:, c]); posn += 7
    bits = set_bits(bits, posn, 1, p0s); posn += 1
    bits = set_bits(bits, posn, 1, p1s); posn += 1
    # Index field: texel 0 uses 3 bits, texels 1..15 use 4.
    bits = set_bits(bits, posn, 3, codes[:, 0]); posn += 3
    for t in range(1, 16):
        bits = set_bits(bits, posn, 4, codes[:, t]); posn += 4
    return bits


# ---------------------------------------------------------------------------
# Mode-1 encoder: 2 subsets, RGB 6.6.6 + shared P-bit per subset, 3-bit
# indices over 64 partition shapes — the mode that carries blocks whose
# pixels form two distinct color populations (edges, text, UI overlays),
# which a single line through color space (mode 6) represents poorly.
# ---------------------------------------------------------------------------

_W3 = WEIGHTS[3]


def _masked_principal_axis(px: jnp.ndarray, mask: jnp.ndarray, iters: int = 8):
    """Principal axis of the masked pixel subset. px (N,16,C); mask (N,16)."""
    nch = px.shape[-1]
    m = mask[..., None]
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    mean = jnp.sum(px * m, axis=1) / cnt[:, None]
    d = (px - mean[:, None, :]) * m  # masked-out pixels contribute zero
    cov = [
        [jnp.sum(d[..., i] * d[..., j], axis=1) for j in range(nch)]
        for i in range(nch)
    ]
    v = [sum(jnp.abs(cov[i][j]) for j in range(nch)) + 1e-4 for i in range(nch)]
    for _ in range(iters):
        nv = [sum(cov[i][j] * v[j] for j in range(nch)) for i in range(nch)]
        norm = jax.lax.rsqrt(sum(x * x for x in nv) + 1e-24)
        v = [x * norm for x in nv]
    return mean, jnp.stack(v, axis=-1)


def _masked_fit_endpoints_ls(px, weights, mask, e0, e1):
    """Least-squares endpoints over the masked pixels (see bc1 variant)."""
    one_m = (1.0 - weights) * mask
    wm = weights * mask
    alpha = jnp.sum(one_m * (1.0 - weights), axis=1)
    beta = jnp.sum(one_m * weights, axis=1)
    gamma = jnp.sum(wm * weights, axis=1)
    r0 = jnp.sum(one_m[:, :, None] * px, axis=1)
    r1 = jnp.sum(wm[:, :, None] * px, axis=1)
    det = alpha * gamma - beta * beta
    ok = jnp.abs(det) > 1e-4
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    n0 = (gamma[:, None] * r0 - beta[:, None] * r1) * inv_det[:, None]
    n1 = (alpha[:, None] * r1 - beta[:, None] * r0) * inv_det[:, None]
    return jnp.where(ok[:, None], n0, e0), jnp.where(ok[:, None], n1, e1)


def _quant_667p(e: jnp.ndarray, p: jnp.ndarray):
    """Quantize (N, 3) float endpoints to 6 bits given the shared P bit.

    Returns (q, reconstructed) where reconstructed applies the decoder's
    exact rule: v7 = (q << 1) | p, then unquantize depth 7 (_unquant).
    """
    v7_ideal = jnp.clip(e, 0.0, 255.0) * (127.0 / 255.0)
    q = jnp.clip(jnp.round((v7_ideal - p[:, None]) / 2.0), 0, 63).astype(_I32)
    v7 = (q << 1) | p[:, None]
    return q, _unquant(v7, 7)


def _quant_subset_shared_p(e0: jnp.ndarray, e1: jnp.ndarray):
    """Choose the shared P bit minimizing both endpoints' joint error.

    Returns (q0, q1, r0, r1, p): 6-bit codes, exact reconstructions, P bit.
    """
    cands = []
    for p in (0, 1):
        pv = jnp.full(e0.shape[0], p, _I32)
        q0, r0 = _quant_667p(e0, pv)
        q1, r1 = _quant_667p(e1, pv)
        err = jnp.sum((r0.astype(jnp.float32) - e0) ** 2, axis=-1) + jnp.sum(
            (r1.astype(jnp.float32) - e1) ** 2, axis=-1
        )
        cands.append((err, q0, q1, r0, r1, pv))
    use1 = cands[1][0] < cands[0][0]  # (N,)
    out = []
    for a, b in zip(cands[0][1:], cands[1][1:]):
        sel = use1[:, None] if a.ndim == 2 else use1
        out.append(jnp.where(sel, b, a))
    return tuple(out)  # q0, q1, r0, r1, p


@partial(jax.jit, static_argnames=("refine_iters", "kmeans_iters"))
def bc7_encode_blocks_mode1(
    pixels: jnp.ndarray, refine_iters: int = 1, kmeans_iters: int = 3
) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC7 mode-1 blocks.

    Alpha is not representable in mode 1 (decodes to 255); callers that care
    use bc7_encode_blocks, which folds the alpha error into mode selection.

    Partition choice: 2-means clustering of the block's RGB pixels, then the
    2-subset partition shape nearest (by Hamming distance, either polarity)
    to the cluster assignment — one (N,16)x(16,64) matmul, no per-partition
    fitting. Endpoints: masked PCA + least-squares refinement per subset.
    """
    px = pixels[..., :3].astype(jnp.float32)
    n = px.shape[0]

    # --- 2-means cluster assignment ------------------------------------
    mean, axis = _masked_principal_axis(px, jnp.ones((n, 16), jnp.float32))
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    med = jnp.median(t, axis=1, keepdims=True)
    assign = (t > med).astype(jnp.float32)  # (N, 16) in {0, 1}
    for _ in range(kmeans_iters):
        c1 = jnp.sum(px * assign[..., None], axis=1) / jnp.maximum(
            jnp.sum(assign, axis=1), 1.0
        )[:, None]
        c0 = jnp.sum(px * (1.0 - assign)[..., None], axis=1) / jnp.maximum(
            jnp.sum(1.0 - assign, axis=1), 1.0
        )[:, None]
        d0 = jnp.sum((px - c0[:, None, :]) ** 2, axis=-1)
        d1 = jnp.sum((px - c1[:, None, :]) ** 2, axis=-1)
        assign = (d1 < d0).astype(jnp.float32)

    # --- nearest partition shape (either polarity) ----------------------
    pt = jnp.asarray(PARTITIONS2, jnp.float32)  # (64, 16)
    ones_p = jnp.sum(pt, axis=1)  # (64,)
    overlap = assign @ pt.T  # (N, 64)
    ones_a = jnp.sum(assign, axis=1, keepdims=True)
    ham = ones_a + ones_p[None, :] - 2.0 * overlap
    ham = jnp.minimum(ham, 16.0 - ham)  # complement polarity
    partition = jnp.argmin(ham, axis=1).astype(_I32)  # (N,)

    onehot = jax.nn.one_hot(partition, 64, dtype=jnp.float32)
    subset = jnp.round(onehot @ pt).astype(_I32)  # (N, 16) in {0,1}
    anchor2 = jnp.round(onehot @ jnp.asarray(ANCHOR2_2, jnp.float32)).astype(
        _I32
    )  # (N,)

    masks = [(subset == s).astype(jnp.float32) for s in (0, 1)]

    # --- per-subset endpoint seed (masked PCA extremes) ------------------
    seeds = []
    for m in masks:
        smean, saxis = _masked_principal_axis(px, m)
        st = jnp.sum((px - smean[:, None, :]) * saxis[:, None, :], axis=-1)
        stm = jnp.where(m > 0, st, jnp.inf)
        stx = jnp.where(m > 0, st, -jnp.inf)
        tmin = jnp.min(stm, axis=1)
        tmax = jnp.max(stx, axis=1)
        tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
        tmax = jnp.where(jnp.isfinite(tmax), tmax, 0.0)
        seeds.append(
            (smean + saxis * tmin[:, None], smean + saxis * tmax[:, None])
        )

    w3f = jnp.asarray(_W3, jnp.float32) / 64.0  # (8,)

    def select_codes(recon):
        """recon: [(r0, r1)] per subset (int32 (N,3)) -> codes (N,16)."""
        # Per-texel endpoint pair by subset membership.
        e0 = jnp.where(
            (subset == 0)[:, :, None], recon[0][0][:, None, :], recon[1][0][:, None, :]
        ).astype(jnp.float32)
        e1 = jnp.where(
            (subset == 0)[:, :, None], recon[0][1][:, None, :], recon[1][1][:, None, :]
        ).astype(jnp.float32)
        pal = (
            e0[:, :, None, :] * (1.0 - w3f)[None, None, :, None]
            + e1[:, :, None, :] * w3f[None, None, :, None]
        )  # (N, 16, 8, 3)
        d = px[:, :, None, :] - pal
        return jnp.argmin(jnp.sum(d * d, axis=-1), axis=-1).astype(_I32)

    def quantize_all(ends):
        return [_quant_subset_shared_p(e0, e1) for (e0, e1) in ends]

    qs = quantize_all(seeds)
    codes = select_codes([(q[2], q[3]) for q in qs])

    ends = seeds
    for _ in range(refine_iters):
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 8):
            w = jnp.where(codes == k, float(_W3[k]) / 64.0, w)
        new_ends = []
        for s, m in enumerate(masks):
            e0n, e1n = _masked_fit_endpoints_ls(
                px, w, m, ends[s][0], ends[s][1]
            )
            new_ends.append((e0n, e1n))
        ends = new_ends
        qs = quantize_all(ends)
        codes = select_codes([(q[2], q[3]) for q in qs])

    # --- anchor fix-ups: anchor texel's index MSB must be 0 --------------
    q_sub = [list(q) for q in qs]  # per subset: [q0, q1, r0, r1, p]
    texel = jnp.arange(16, dtype=_I32)[None, :]
    anchors = [jnp.zeros(n, _I32), anchor2]
    for s in (0, 1):
        a_code = jnp.sum(
            jnp.where(texel == anchors[s][:, None], codes, 0), axis=1
        )
        swap = a_code >= 4
        in_s = subset == s
        codes = jnp.where(swap[:, None] & in_s, 7 - codes, codes)
        q0, q1, r0, r1, p = q_sub[s]
        q_sub[s][0] = jnp.where(swap[:, None], q1, q0)
        q_sub[s][1] = jnp.where(swap[:, None], q0, q1)

    # --- pack -------------------------------------------------------------
    bits = jnp.zeros((n, 4), _U32)

    def set_bits(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w, b = start // 32, start % 32
        bits = bits.at[:, w].set(bits[:, w] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w + 1].set(bits[:, w + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits(bits, 0, 2, jnp.full(n, 2, _I32))  # mode 1 marker (bit 1)
    bits = set_bits(bits, 2, 6, partition)
    posn = 8
    # Endpoint order: R x4 (s0e0, s0e1, s1e0, s1e1), then G x4, then B x4.
    for c in range(3):
        for s in (0, 1):
            for e in (0, 1):
                bits = set_bits(bits, posn, 6, q_sub[s][e][:, c])
                posn += 6
    bits = set_bits(bits, posn, 1, q_sub[0][4]); posn += 1
    bits = set_bits(bits, posn, 1, q_sub[1][4]); posn += 1
    assert posn == 82

    # Index field: per-texel width 2 at anchors (texel 0 and anchor2), 3
    # elsewhere; bit positions are per-block dynamic.
    is_anchor = (texel == 0) | (texel == anchor2[:, None])
    widths = jnp.where(is_anchor, 2, 3)
    offs = 82 + jnp.concatenate(
        [jnp.zeros((n, 1), _I32), jnp.cumsum(widths[:, :-1], axis=1)], axis=1
    )  # (N, 16); max start 82+45-2 = 125
    vals = codes.astype(_U32)
    for wword in (2, 3):
        rel = offs - 32 * wword  # (N, 16)
        shift_l = jnp.clip(rel, 0, 31).astype(_U32)
        shift_r = jnp.clip(-rel, 0, 31).astype(_U32)
        lo = jnp.where((rel >= 0) & (rel < 32), vals << shift_l, 0)
        spill = jnp.where((rel < 0) & (rel > -3), vals >> shift_r, 0)
        contrib = jnp.bitwise_or(lo, spill).astype(_U32)
        acc = jnp.zeros(n, _U32)
        for ti in range(16):
            acc = acc | contrib[:, ti]
        bits = bits.at[:, wword].set(bits[:, wword] | acc)
    return bits


# ---------------------------------------------------------------------------
# Mode-7 encoder: 2 subsets, RGBA 5.5.5.5 + a P-bit per ENDPOINT, 2-bit
# indices over 64 partition shapes — the mode for two-population RGBA
# blocks whose alpha edge follows the color edge (sprite cutouts, matted
# overlays): mode 1 cannot represent their alpha at all and mode 5's
# single color line blurs the two populations. Round-4 adjudication
# (tools/eval_bc7m7_bc6hdelta.py): idealized mode-7 bound showed
# +1.5-1.8 dB over the shipped 1/5/6 set on such content.
# ---------------------------------------------------------------------------


def _quant_55p_own(e: jnp.ndarray):
    """Quantize (N, 4) float RGBA endpoint to 5 bits + its OWN P bit.

    Both P values are tried and the joint 4-channel error decides.
    Returns (q, recon, p) with recon the decoder-exact 8-bit value
    (v6 = (q << 1) | p, unquant depth 6)."""
    cands = []
    for p in (0, 1):
        pv = jnp.full(e.shape[0], p, _I32)
        v6_ideal = jnp.clip(e, 0.0, 255.0) * (63.0 / 255.0)
        q = jnp.clip(jnp.round((v6_ideal - pv[:, None]) / 2.0), 0, 31).astype(_I32)
        r = _unquant((q << 1) | pv[:, None], 6)
        err = jnp.sum((r.astype(jnp.float32) - e) ** 2, axis=-1)
        cands.append((err, q, r, pv))
    use1 = cands[1][0] < cands[0][0]
    out = []
    for a, b in zip(cands[0][1:], cands[1][1:]):
        sel = use1[:, None] if a.ndim == 2 else use1
        out.append(jnp.where(sel, b, a))
    return tuple(out)  # q, recon, p


@partial(jax.jit, static_argnames=("refine_iters", "kmeans_iters"))
def bc7_encode_blocks_mode7(
    pixels: jnp.ndarray, refine_iters: int = 1, kmeans_iters: int = 3
) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC7 mode-7 blocks.

    Same skeleton as mode 1 (2-means RGBA clustering -> nearest 2-subset
    partition -> masked PCA seeds -> LS refine) with RGBA endpoints and
    2-bit indices; each endpoint picks its own P bit.
    """
    px = pixels.astype(jnp.float32)  # all 4 channels
    n = px.shape[0]

    mean, axis = _masked_principal_axis(px, jnp.ones((n, 16), jnp.float32))
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    med = jnp.median(t, axis=1, keepdims=True)
    assign = (t > med).astype(jnp.float32)
    for _ in range(kmeans_iters):
        c1 = jnp.sum(px * assign[..., None], axis=1) / jnp.maximum(
            jnp.sum(assign, axis=1), 1.0)[:, None]
        c0 = jnp.sum(px * (1.0 - assign)[..., None], axis=1) / jnp.maximum(
            jnp.sum(1.0 - assign, axis=1), 1.0)[:, None]
        d0 = jnp.sum((px - c0[:, None, :]) ** 2, axis=-1)
        d1 = jnp.sum((px - c1[:, None, :]) ** 2, axis=-1)
        assign = (d1 < d0).astype(jnp.float32)

    pt = jnp.asarray(PARTITIONS2, jnp.float32)
    ones_p = jnp.sum(pt, axis=1)
    overlap = assign @ pt.T
    ones_a = jnp.sum(assign, axis=1, keepdims=True)
    ham = ones_a + ones_p[None, :] - 2.0 * overlap
    ham = jnp.minimum(ham, 16.0 - ham)
    partition = jnp.argmin(ham, axis=1).astype(_I32)

    onehot = jax.nn.one_hot(partition, 64, dtype=jnp.float32)
    subset = jnp.round(onehot @ pt).astype(_I32)
    anchor2 = jnp.round(
        onehot @ jnp.asarray(ANCHOR2_2, jnp.float32)).astype(_I32)
    masks = [(subset == s).astype(jnp.float32) for s in (0, 1)]

    seeds = []
    for m in masks:
        smean, saxis = _masked_principal_axis(px, m)
        st = jnp.sum((px - smean[:, None, :]) * saxis[:, None, :], axis=-1)
        stm = jnp.where(m > 0, st, jnp.inf)
        stx = jnp.where(m > 0, st, -jnp.inf)
        tmin = jnp.min(stm, axis=1)
        tmax = jnp.max(stx, axis=1)
        tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
        tmax = jnp.where(jnp.isfinite(tmax), tmax, 0.0)
        seeds.append(
            (smean + saxis * tmin[:, None], smean + saxis * tmax[:, None]))

    w2f = jnp.asarray(_W2, jnp.float32) / 64.0  # (4,)

    def select_codes(recon):
        e0 = jnp.where(
            (subset == 0)[:, :, None], recon[0][0][:, None, :],
            recon[1][0][:, None, :]).astype(jnp.float32)
        e1 = jnp.where(
            (subset == 0)[:, :, None], recon[0][1][:, None, :],
            recon[1][1][:, None, :]).astype(jnp.float32)
        pal = (e0[:, :, None, :] * (1.0 - w2f)[None, None, :, None]
               + e1[:, :, None, :] * w2f[None, None, :, None])
        d = px[:, :, None, :] - pal
        return jnp.argmin(jnp.sum(d * d, axis=-1), axis=-1).astype(_I32)

    def quantize_all(ends):
        out = []
        for (e0, e1) in ends:
            q0, r0, p0 = _quant_55p_own(e0)
            q1, r1, p1 = _quant_55p_own(e1)
            out.append([q0, q1, r0, r1, p0, p1])
        return out

    qs = quantize_all(seeds)
    codes = select_codes([(q[2], q[3]) for q in qs])

    ends = seeds
    for _ in range(refine_iters):
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 4):
            w = jnp.where(codes == k, float(_W2[k]) / 64.0, w)
        new_ends = []
        for s, m in enumerate(masks):
            e0n, e1n = _masked_fit_endpoints_ls(
                px, w, m, ends[s][0], ends[s][1])
            new_ends.append((e0n, e1n))
        ends = new_ends
        qs = quantize_all(ends)
        codes = select_codes([(q[2], q[3]) for q in qs])

    # anchor fix-ups: the anchor texel's index MSB must be 0
    q_sub = qs
    texel = jnp.arange(16, dtype=_I32)[None, :]
    anchors = [jnp.zeros(n, _I32), anchor2]
    for s in (0, 1):
        a_code = jnp.sum(
            jnp.where(texel == anchors[s][:, None], codes, 0), axis=1)
        swap = a_code >= 2
        in_s = subset == s
        codes = jnp.where(swap[:, None] & in_s, 3 - codes, codes)
        q0, q1, r0, r1, p0, p1 = q_sub[s]
        q_sub[s] = [jnp.where(swap[:, None], q1, q0),
                    jnp.where(swap[:, None], q0, q1), r0, r1,
                    jnp.where(swap, p1, p0), jnp.where(swap, p0, p1)]

    bits = jnp.zeros((n, 4), _U32)

    def set_bits(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w, b = start // 32, start % 32
        bits = bits.at[:, w].set(bits[:, w] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w + 1].set(bits[:, w + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits(bits, 0, 8, jnp.full(n, 0x80, _I32))  # mode 7 marker
    bits = set_bits(bits, 8, 6, partition)
    posn = 14
    # Endpoint order: R x4 (s0e0, s0e1, s1e0, s1e1), G x4, B x4, A x4.
    for c in range(4):
        for s in (0, 1):
            for e in (0, 1):
                bits = set_bits(bits, posn, 5, q_sub[s][e][:, c])
                posn += 5
    # P-bits: one per endpoint (s0e0, s0e1, s1e0, s1e1).
    for s in (0, 1):
        bits = set_bits(bits, posn, 1, q_sub[s][4]); posn += 1
        bits = set_bits(bits, posn, 1, q_sub[s][5]); posn += 1
    assert posn == 98

    # Index field: width 1 at anchors (texel 0 and anchor2), 2 elsewhere;
    # all 30 bits land in word 3 (starts at bit 96).
    is_anchor = (texel == 0) | (texel == anchor2[:, None])
    widths = jnp.where(is_anchor, 1, 2)
    offs = 98 + jnp.concatenate(
        [jnp.zeros((n, 1), _I32), jnp.cumsum(widths[:, :-1], axis=1)], axis=1)
    vals = codes.astype(_U32)
    rel = offs - 96
    contrib = vals << jnp.clip(rel, 0, 31).astype(_U32)
    acc = jnp.zeros(n, _U32)
    for ti in range(16):
        acc = acc | contrib[:, ti]
    bits = bits.at[:, 3].set(bits[:, 3] | acc)
    return bits


# ---------------------------------------------------------------------------
# Mode-3 encoder: 2 subsets, RGB 7.7.7 + a P-bit per ENDPOINT (8-bit
# effective), 2-bit indices over 64 partitions — the high-precision RGB
# two-subset mode. Round-4 adjudication (tools/eval_bc7_modes023.py,
# shared-index bounds): modes 0 and 2 are EXCLUDED by measurement
# (<= +0.15 dB over the adaptive set on every anchor class — their 3
# subsets cost endpoint precision the extra partition freedom never
# repays); mode 3's bound adds +0.35 dB on natural and dominates the
# near-flat two-population blocks that cap graphics content (its 8-bit
# endpoints represent them exactly where mode 1's 6.6.6+shared-P and
# mode 6's shared RGBA line each round away ~1 LSB/texel).
# ---------------------------------------------------------------------------


def _quant_77p_own(e: jnp.ndarray):
    """Quantize (N, 3) float RGB endpoint to 7 bits + its OWN P bit.

    Both P values are tried; joint 3-channel error decides. recon is
    decoder-exact: depth 8 means unquant((q << 1) | p, 8) is identity."""
    cands = []
    for p in (0, 1):
        pv = jnp.full(e.shape[0], p, _I32)
        q = jnp.clip(
            jnp.round((jnp.clip(e, 0.0, 255.0) - pv[:, None]) / 2.0),
            0, 127).astype(_I32)
        r = (q << 1) | pv[:, None]
        err = jnp.sum((r.astype(jnp.float32) - e) ** 2, axis=-1)
        cands.append((err, q, r, pv))
    use1 = cands[1][0] < cands[0][0]
    out = []
    for a, b in zip(cands[0][1:], cands[1][1:]):
        sel = use1[:, None] if a.ndim == 2 else use1
        out.append(jnp.where(sel, b, a))
    return tuple(out)  # q, recon, p


@partial(jax.jit, static_argnames=("refine_iters", "kmeans_iters"))
def bc7_encode_blocks_mode3(
    pixels: jnp.ndarray, refine_iters: int = 1, kmeans_iters: int = 3
) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC7 mode-3 blocks.

    Mode-7 skeleton on the RGB channels only (2-means clustering ->
    nearest 2-subset partition -> masked PCA seeds -> LS refine ->
    2-bit indices); alpha decodes 255 by mode construction, so the
    adaptive selector keeps mode 3 away from translucent blocks.
    """
    px = pixels[..., :3].astype(jnp.float32)
    n = px.shape[0]

    mean, axis = _masked_principal_axis(px, jnp.ones((n, 16), jnp.float32))
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    med = jnp.median(t, axis=1, keepdims=True)
    assign = (t > med).astype(jnp.float32)
    for _ in range(kmeans_iters):
        c1 = jnp.sum(px * assign[..., None], axis=1) / jnp.maximum(
            jnp.sum(assign, axis=1), 1.0)[:, None]
        c0 = jnp.sum(px * (1.0 - assign)[..., None], axis=1) / jnp.maximum(
            jnp.sum(1.0 - assign, axis=1), 1.0)[:, None]
        d0 = jnp.sum((px - c0[:, None, :]) ** 2, axis=-1)
        d1 = jnp.sum((px - c1[:, None, :]) ** 2, axis=-1)
        assign = (d1 < d0).astype(jnp.float32)

    pt = jnp.asarray(PARTITIONS2, jnp.float32)
    ones_p = jnp.sum(pt, axis=1)
    overlap = assign @ pt.T
    ones_a = jnp.sum(assign, axis=1, keepdims=True)
    ham = ones_a + ones_p[None, :] - 2.0 * overlap
    ham = jnp.minimum(ham, 16.0 - ham)
    partition = jnp.argmin(ham, axis=1).astype(_I32)

    onehot = jax.nn.one_hot(partition, 64, dtype=jnp.float32)
    subset = jnp.round(onehot @ pt).astype(_I32)
    anchor2 = jnp.round(
        onehot @ jnp.asarray(ANCHOR2_2, jnp.float32)).astype(_I32)
    masks = [(subset == s).astype(jnp.float32) for s in (0, 1)]

    seeds = []
    for m in masks:
        smean, saxis = _masked_principal_axis(px, m)
        st = jnp.sum((px - smean[:, None, :]) * saxis[:, None, :], axis=-1)
        stm = jnp.where(m > 0, st, jnp.inf)
        stx = jnp.where(m > 0, st, -jnp.inf)
        tmin = jnp.min(stm, axis=1)
        tmax = jnp.max(stx, axis=1)
        tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
        tmax = jnp.where(jnp.isfinite(tmax), tmax, 0.0)
        seeds.append(
            (smean + saxis * tmin[:, None], smean + saxis * tmax[:, None]))

    w2f = jnp.asarray(_W2, jnp.float32) / 64.0  # (4,)

    def select_codes(recon):
        e0 = jnp.where(
            (subset == 0)[:, :, None], recon[0][0][:, None, :],
            recon[1][0][:, None, :]).astype(jnp.float32)
        e1 = jnp.where(
            (subset == 0)[:, :, None], recon[0][1][:, None, :],
            recon[1][1][:, None, :]).astype(jnp.float32)
        pal = (e0[:, :, None, :] * (1.0 - w2f)[None, None, :, None]
               + e1[:, :, None, :] * w2f[None, None, :, None])
        d = px[:, :, None, :] - pal
        return jnp.argmin(jnp.sum(d * d, axis=-1), axis=-1).astype(_I32)

    def quantize_all(ends):
        out = []
        for (e0, e1) in ends:
            q0, r0, p0 = _quant_77p_own(e0)
            q1, r1, p1 = _quant_77p_own(e1)
            out.append([q0, q1, r0, r1, p0, p1])
        return out

    qs = quantize_all(seeds)
    codes = select_codes([(q[2], q[3]) for q in qs])

    ends = seeds
    for _ in range(refine_iters):
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 4):
            w = jnp.where(codes == k, float(_W2[k]) / 64.0, w)
        new_ends = []
        for s, m in enumerate(masks):
            e0n, e1n = _masked_fit_endpoints_ls(
                px, w, m, ends[s][0], ends[s][1])
            new_ends.append((e0n, e1n))
        ends = new_ends
        qs = quantize_all(ends)
        codes = select_codes([(q[2], q[3]) for q in qs])

    # anchor fix-ups: the anchor texel's index MSB must be 0
    q_sub = qs
    texel = jnp.arange(16, dtype=_I32)[None, :]
    anchors = [jnp.zeros(n, _I32), anchor2]
    for s in (0, 1):
        a_code = jnp.sum(
            jnp.where(texel == anchors[s][:, None], codes, 0), axis=1)
        swap = a_code >= 2
        in_s = subset == s
        codes = jnp.where(swap[:, None] & in_s, 3 - codes, codes)
        q0, q1, r0, r1, p0, p1 = q_sub[s]
        q_sub[s] = [jnp.where(swap[:, None], q1, q0),
                    jnp.where(swap[:, None], q0, q1), r0, r1,
                    jnp.where(swap, p1, p0), jnp.where(swap, p0, p1)]

    bits = jnp.zeros((n, 4), _U32)

    def set_bits(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w, b = start // 32, start % 32
        bits = bits.at[:, w].set(bits[:, w] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w + 1].set(bits[:, w + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits(bits, 0, 4, jnp.full(n, 0x8, _I32))  # mode 3 marker
    bits = set_bits(bits, 4, 6, partition)
    posn = 10
    # Endpoint order: R x4 (s0e0, s0e1, s1e0, s1e1), G x4, B x4.
    for c in range(3):
        for s in (0, 1):
            for e in (0, 1):
                bits = set_bits(bits, posn, 7, q_sub[s][e][:, c])
                posn += 7
    # P-bits: one per endpoint (s0e0, s0e1, s1e0, s1e1).
    for s in (0, 1):
        bits = set_bits(bits, posn, 1, q_sub[s][4]); posn += 1
        bits = set_bits(bits, posn, 1, q_sub[s][5]); posn += 1
    assert posn == 98

    # Index field: width 1 at anchors; all 30 bits land in word 3.
    is_anchor = (texel == 0) | (texel == anchor2[:, None])
    widths = jnp.where(is_anchor, 1, 2)
    offs = 98 + jnp.concatenate(
        [jnp.zeros((n, 1), _I32), jnp.cumsum(widths[:, :-1], axis=1)], axis=1)
    vals = codes.astype(_U32)
    rel = offs - 96
    contrib = vals << jnp.clip(rel, 0, 31).astype(_U32)
    acc = jnp.zeros(n, _U32)
    for ti in range(16):
        acc = acc | contrib[:, ti]
    bits = bits.at[:, 3].set(bits[:, 3] | acc)
    return bits


# ---------------------------------------------------------------------------
# Mode-5 encoder: 1 subset, RGB 7.7.7 with 2-bit indices + alpha 8.8 with
# its OWN 2-bit indices — the mode that carries blocks whose alpha is
# decorrelated from color (UI overlays, independent alpha mattes), which
# mode 6's single shared RGBA index represents poorly.
# ---------------------------------------------------------------------------

_W2 = WEIGHTS[2]


@partial(jax.jit, static_argnames=("refine_iters",))
def bc7_encode_blocks_mode5(pixels: jnp.ndarray, refine_iters: int = 1) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC7 mode-5 blocks (rotation 0).

    Color: PCA endpoints quantized to 7 bits (dequant (q<<1)|(q>>6)),
    2-bit indices, least-squares refit. Alpha: 8-bit endpoints, separate
    2-bit indices, scalar refit. Rotation is fixed to 0 (alpha stays alpha)
    — the decorrelated-channel win comes from the separate index plane.
    """
    from hap_tpu.kernels.bc1 import _fit_endpoints_ls, _principal_axis

    px = pixels.astype(jnp.float32)
    rgb = px[..., :3]
    a = px[..., 3:4]
    n = px.shape[0]

    def quant7(e):
        # 7-bit endpoint with +-1 local search on the dequantized value
        e = jnp.clip(e, 0.0, 255.0)
        q = jnp.clip(jnp.round(e / 2.0), 0, 127).astype(_I32)
        best, best_err = None, None
        for dq in (-1, 0, 1):
            qq = jnp.clip(q + dq, 0, 127)
            v = (qq << 1) | (qq >> 6)
            err = jnp.abs(v.astype(jnp.float32) - e)
            if best is None:
                best, best_err = qq, err
            else:
                take = err < best_err
                best = jnp.where(take, qq, best)
                best_err = jnp.where(take, err, best_err)
        return best

    def assign2(vals, v0, v1):
        """vals (N,16,C); v0/v1 (N,C) dequantized -> (codes, sse)."""
        best_idx = jnp.zeros(vals.shape[:2], _I32)
        best_err = None
        for k in range(4):
            w = float(_W2[k])
            pal = (v0 * (64.0 - w) + v1 * w) / 64.0
            d = vals - pal[:, None, :]
            err = jnp.sum(d * d, axis=-1)
            if best_err is None:
                best_err = err
            else:
                take = err < best_err
                best_idx = jnp.where(take, k, best_idx)
                best_err = jnp.where(take, err, best_err)
        return best_idx, jnp.sum(best_err, axis=1)

    def deq7(q):
        return ((q << 1) | (q >> 6)).astype(jnp.float32)

    # --- color plane ------------------------------------------------------
    axis = _principal_axis(rgb)
    mean = jnp.mean(rgb, axis=1)
    t = jnp.sum((rgb - mean[:, None, :]) * axis[:, None, :], axis=-1)
    e0 = mean + axis * jnp.min(t, axis=1)[:, None]
    e1 = mean + axis * jnp.max(t, axis=1)[:, None]
    q0, q1 = quant7(e0), quant7(e1)
    codes, _ = assign2(rgb, deq7(q0), deq7(q1))
    for _ in range(refine_iters):
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 4):
            w = jnp.where(codes == k, float(_W2[k]) / 64.0, w)
        e0, e1 = _fit_endpoints_ls(rgb, w, e0, e1)
        q0, q1 = quant7(e0), quant7(e1)
        codes, _ = assign2(rgb, deq7(q0), deq7(q1))

    # --- alpha plane ------------------------------------------------------
    a0 = jnp.min(a, axis=1)
    a1 = jnp.max(a, axis=1)
    qa0 = jnp.clip(jnp.round(a0), 0, 255).astype(_I32)
    qa1 = jnp.clip(jnp.round(a1), 0, 255).astype(_I32)
    acodes, _ = assign2(a, qa0.astype(jnp.float32), qa1.astype(jnp.float32))
    for _ in range(refine_iters):
        w = jnp.zeros(acodes.shape, jnp.float32)
        for k in range(1, 4):
            w = jnp.where(acodes == k, float(_W2[k]) / 64.0, w)
        a0, a1 = _fit_endpoints_ls(a, w, a0, a1)
        qa0 = jnp.clip(jnp.round(a0), 0, 255).astype(_I32)
        qa1 = jnp.clip(jnp.round(a1), 0, 255).astype(_I32)
        acodes, _ = assign2(a, qa0.astype(jnp.float32), qa1.astype(jnp.float32))

    # Anchor rules: texel 0's index MSB must be 0 in EACH index plane
    # (weights are symmetric: w[3-k] == 64 - w[k]).
    swap = codes[:, 0] >= 2
    codes = jnp.where(swap[:, None], 3 - codes, codes)
    q0s = jnp.where(swap[:, None], q1, q0)
    q1s = jnp.where(swap[:, None], q0, q1)
    aswap = acodes[:, 0] >= 2
    acodes = jnp.where(aswap[:, None], 3 - acodes, acodes)
    qa0s = jnp.where(aswap[:, None], qa1, qa0)
    qa1s = jnp.where(aswap[:, None], qa0, qa1)

    # Pack: mode '100000' (6 bits), rotation (2) = 0, R0 R1 G0 G1 B0 B1
    # (7 each), A0 A1 (8 each), 31 color index bits, 31 alpha index bits.
    bits = jnp.zeros((n, 4), _U32)

    def set_bits(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w_, b = start // 32, start % 32
        bits = bits.at[:, w_].set(bits[:, w_] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w_ + 1].set(bits[:, w_ + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits(bits, 0, 6, jnp.full(n, 1 << 5, _I32))
    posn = 8  # 6 mode bits + 2 rotation bits (rotation 0)
    for c in range(3):
        bits = set_bits(bits, posn, 7, q0s[:, c]); posn += 7
        bits = set_bits(bits, posn, 7, q1s[:, c]); posn += 7
    bits = set_bits(bits, posn, 8, qa0s[:, 0]); posn += 8
    bits = set_bits(bits, posn, 8, qa1s[:, 0]); posn += 8
    bits = set_bits(bits, posn, 1, codes[:, 0]); posn += 1
    for t_ in range(1, 16):
        bits = set_bits(bits, posn, 2, codes[:, t_]); posn += 2
    bits = set_bits(bits, posn, 1, acodes[:, 0]); posn += 1
    for t_ in range(1, 16):
        bits = set_bits(bits, posn, 2, acodes[:, t_]); posn += 2
    return bits


@partial(jax.jit, static_argnames=("refine_iters",))
def bc7_encode_blocks(pixels: jnp.ndarray, refine_iters: int = 1) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC7 blocks, adaptive mode.

    Encodes each block in mode 6 (single subset, shared RGBA index), mode 5
    (single subset, separate alpha index plane), mode 1 (two subsets, RGB),
    mode 7 (two subsets, RGBA — round-4, for two-population blocks whose
    alpha edge follows the color edge) and mode 3 (two subsets, RGB at
    8-bit effective endpoints — round-4, for near-flat two-population
    blocks where 6/7-bit endpoint rounding is the whole error) and keeps
    the lowest-SSE encoding — exact decoder semantics (_decode_mode) are
    used for the comparison, so the chosen block is the one that truly
    reconstructs better. Modes 0/2 are excluded by measurement
    (tools/eval_bc7_modes023.py: <= +0.15 dB bound over this set).
    """
    w6 = bc7_encode_blocks_mode6(pixels, refine_iters=refine_iters)
    w1 = bc7_encode_blocks_mode1(pixels, refine_iters=refine_iters)
    w5 = bc7_encode_blocks_mode5(pixels, refine_iters=refine_iters)
    w7 = bc7_encode_blocks_mode7(pixels, refine_iters=refine_iters)
    w3 = bc7_encode_blocks_mode3(pixels, refine_iters=refine_iters)
    pxi = pixels.astype(_I32)

    def sse(words, mode):
        r = jnp.clip(_decode_mode(words.astype(_U32), mode), 0, 255)
        d = r - pxi
        return jnp.sum(d * d, axis=(1, 2))

    best_w, best_e = w6, sse(w6, 6)
    for w, m in ((w1, 1), (w5, 5), (w7, 7), (w3, 3)):
        e = sse(w, m)
        take = (e < best_e)[:, None]
        best_w = jnp.where(take, w, best_w)
        best_e = jnp.minimum(best_e, e)
    return best_w
