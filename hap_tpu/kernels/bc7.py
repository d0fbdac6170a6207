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
