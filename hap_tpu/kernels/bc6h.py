"""BC6H (BPTC FLOAT) block codec in pure JAX: full 14-mode decoder (UF16 and

SF16 variants) + a mode-11 (10.10 untransformed) encoder.

Format: BPTC specification (normative external reference [4] of the Hap
spec, HapVideoDRAFT.md:27,148); carried by Hap as the HapH family
(HapVideoDRAFT.md:142; container nibbles 0x2/0x3, hap.c:50-51). Blocks are
16 bytes of scattered endpoint fields (bc6h_tables.py) + 5-bit partition
(2-subset modes) + 46 or 63 index bits. Output texels are half-float bit
patterns (uint16); use half_bits_to_f32 for float pixels.

Semantics follow the D3D11 functional spec: delta endpoints wrap at the
endpoint width; unquantize to a 17-bit workspace; (64-w)/w interpolation;
final scale by 31/64 (unsigned) or 31/32 with sign-magnitude (signed);
reserved modes decode to zero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.kernels.bc6h_tables import MODES6
from hap_tpu.kernels.bc7_tables import ANCHOR2_2, PARTITIONS2, WEIGHTS

_I32 = jnp.int32
_U32 = jnp.uint32

_W3 = WEIGHTS[3]
_W4 = WEIGHTS[4]


def _get_bits_static(words, start, length):
    if length == 0:
        return jnp.zeros(words.shape[0], _I32)
    w = start // 32
    b = start % 32
    lo = words[:, w] >> b
    if b + length > 32:
        lo = lo | (words[:, w + 1] << (32 - b))
    return (lo & ((1 << length) - 1)).astype(_I32)


def _get_bits_dynamic(words, start, length):
    widx = (start >> 5).astype(_I32)
    b = (start & 31).astype(_U32)
    w_sel = jnp.zeros(start.shape, _U32)
    w_nxt = jnp.zeros(start.shape, _U32)
    for k in range(4):
        w_sel = jnp.where(widx == k, words[:, k][:, None], w_sel)
        w_nxt = jnp.where(widx + 1 == k, words[:, k][:, None], w_nxt)
    up = jnp.clip(32 - b.astype(_I32), 0, 31).astype(_U32)
    val = (w_sel >> b) | jnp.where(b > 0, w_nxt << up, 0)
    mask = ((1 << length.astype(_U32)) - 1).astype(_U32)
    return (val & mask).astype(_I32)


def _sign_extend(v, bits):
    sign = 1 << (bits - 1)
    return (v ^ sign) - sign


def _unquantize(x, bits, signed):
    """Per the spec: lift an endpoint to the 17-bit interpolation space."""
    if not signed:
        if bits >= 15:
            return x
        full = (1 << bits) - 1
        unq = ((x << 16) + 0x8000) >> bits
        return jnp.where(x == 0, 0, jnp.where(x == full, 0xFFFF, unq))
    if bits >= 16:
        return x
    s = x < 0
    ax = jnp.abs(x)
    full = (1 << (bits - 1)) - 1
    unq = ((ax << 15) + 0x4000) >> (bits - 1)
    unq = jnp.where(ax == 0, 0, jnp.where(ax >= full, 0x7FFF, unq))
    return jnp.where(s, -unq, unq)


def _finish(x, signed):
    """17-bit interpolated value -> half-float bit pattern (int32)."""
    if not signed:
        return (x * 31) >> 6
    ax = (jnp.abs(x) * 31) >> 5
    return jnp.where(x < 0, ax | 0x8000, ax)


def _decode_mode(words, mode_key, signed):
    cfg = MODES6[mode_key]
    ns, epb, delta = cfg["ns"], cfg["epb"], cfg["delta"]
    n = words.shape[0]

    # Gather scattered endpoint fields.
    fields = {k: jnp.zeros(n, _I32) for k in
              ("rw", "gw", "bw", "rx", "gx", "bx", "ry", "gy", "by", "rz", "gz", "bz")}
    pos = cfg["bits"]
    for (name, lo, nbits, rev) in cfg["layout"]:
        v = _get_bits_static(words, pos, nbits)
        if rev and nbits > 1:
            # first-stored bit is the highest of the run
            acc = jnp.zeros(n, _I32)
            for i in range(nbits):
                bit = (v >> i) & 1
                acc = acc | (bit << (nbits - 1 - i))
            v = acc
        fields[name] = fields[name] | (v << lo)
        pos += nbits

    if ns == 2:
        partition = _get_bits_static(words, pos, 5)
        pos += 5
        ib = 3
    else:
        partition = jnp.zeros(n, _I32)
        ib = 4

    # Resolve endpoints per channel: e0=(rw,gw,bw) e1=(rx,gx,bx) e2,e3.
    names = [("rw", "gw", "bw"), ("rx", "gx", "bx"),
             ("ry", "gy", "by"), ("rz", "gz", "bz")][: 2 * ns]
    endpoints = []
    for ei, chans in enumerate(names):
        vals = []
        for ci, cname in enumerate(chans):
            raw = fields[cname]
            if ei == 0:
                v = _sign_extend(raw, epb) if signed else raw
            elif delta is not None:
                d = _sign_extend(raw, delta[ci])
                v = (endpoints[0][ci] + d) & ((1 << epb) - 1)
                if signed:
                    v = _sign_extend(v, epb)
            else:
                v = _sign_extend(raw, epb) if signed else raw
            vals.append(v)
        endpoints.append(vals)
    unq = [[_unquantize(endpoints[e][c], epb, signed) for c in range(3)]
           for e in range(2 * ns)]

    # Subset table (BC6H uses the first 32 BC7 2-subset partitions).
    if ns == 2:
        onehot = jax.nn.one_hot(partition, 32, dtype=jnp.float32)
        subset = jnp.round(
            onehot @ jnp.asarray(PARTITIONS2[:32], jnp.float32)
        ).astype(_I32)  # (N, 16)
        anchor2 = jnp.round(
            onehot @ jnp.asarray(ANCHOR2_2[:32, None], jnp.float32)
        ).astype(_I32)[:, 0]
        anchors = [jnp.zeros(n, _I32), anchor2]
    else:
        subset = jnp.zeros((n, 16), _I32)
        anchors = [jnp.zeros(n, _I32)]

    texel = jnp.arange(16, dtype=_I32)[None, :]
    is_anchor = jnp.zeros((n, 16), jnp.bool_)
    for a in anchors:
        is_anchor = is_anchor | (texel == a[:, None])
    widths = jnp.where(is_anchor, ib - 1, ib)
    offs = jnp.concatenate(
        [jnp.zeros((n, 1), _I32), jnp.cumsum(widths[:, :-1], axis=1)], axis=1
    )
    idx = _get_bits_dynamic(words, pos + offs, widths)  # (N, 16)

    table = _W3 if ib == 3 else _W4
    w = jnp.zeros(idx.shape, _I32)
    for k in range(1, len(table)):
        w = jnp.where(idx == k, int(table[k]), w)

    out = []
    for c in range(3):
        e0 = unq[0][c][:, None]
        e1 = unq[1][c][:, None]
        if ns == 2:
            sel = subset == 1
            e0 = jnp.where(sel, unq[2][c][:, None], e0)
            e1 = jnp.where(sel, unq[3][c][:, None], e1)
        val = (e0 * (64 - w) + e1 * w + 32) >> 6
        out.append(_finish(val, signed))
    return jnp.stack(out, axis=-1)  # (N, 16, 3) int32 half bits


@partial(jax.jit, static_argnames=("signed",))
def bc6h_decode_blocks(words: jnp.ndarray, signed: bool = False) -> jnp.ndarray:
    """(N, 4) uint32 BC6H blocks -> (N, 16, 3) uint16 half-float bits."""
    words = words.astype(_U32)
    two = (words[:, 0] & 0x3).astype(_I32)
    five = (words[:, 0] & 0x1F).astype(_I32)
    out = jnp.zeros((words.shape[0], 16, 3), _I32)
    for mode_key, cfg in MODES6.items():
        if cfg["bits"] == 2:
            sel = two == mode_key
        else:
            sel = (five == mode_key) & (two >= 2)
        decoded = _decode_mode(words, mode_key, signed)
        out = jnp.where(sel[:, None, None], decoded, out)
    return out.astype(jnp.uint16)


def half_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.float16).astype(
        jnp.float32
    )


def f32_to_half_bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x.astype(jnp.float16), jnp.uint16)


# ---------------------------------------------------------------------------
# Mode-11 encoder (10.10 untransformed, one subset, 4-bit indices).
# ---------------------------------------------------------------------------

def _quantize10_unsigned(h: jnp.ndarray) -> jnp.ndarray:
    """Half bits (int32, finite, non-negative) -> 10-bit endpoint.

    The decode path is half_bits = finish(unquantize(q)) = (unq * 31) >> 6,
    so the quantizer targets unq ~= h * 64 / 31, then inverts the
    unquantize map (((q << 16) + 0x8000) >> 10) with a +-1 local search on
    the true end-to-end error.
    """
    target = (h * 64 + 15) // 31
    q = (target << 10) // 0x10000
    best = None
    best_err = None
    for dq in (0, 1, 2):
        qq = jnp.clip(q + dq, 0, 1023)
        rec = _finish(_unquantize(qq, 10, False), False)
        err = jnp.abs(rec - h)
        if best is None:
            best, best_err = qq, err
        else:
            take = err < best_err
            best = jnp.where(take, qq, best)
            best_err = jnp.where(take, err, best_err)
    return best


def _quantize10_signed(v: jnp.ndarray) -> jnp.ndarray:
    """Signed half value-int (sign * magnitude-bits) -> signed 10-bit
    endpoint in [-511, 511], inverting the signed decode chain
    finish(unquantize(q, 10, True), True) with a +-1 local search."""
    m = jnp.abs(v)
    target = (m * 32 + 15) // 31  # invert finish: (|x| * 31) >> 5
    q = (target << 9) // 0x8000  # invert unquantize: (|q| << 15) >> 9
    best = None
    best_err = None
    for dq in (0, 1, 2):
        qq = jnp.clip(q + dq, 0, 511)
        rec = _finish(_unquantize(qq, 10, True), True) & 0x7FFF
        err = jnp.abs(rec - m)
        if best is None:
            best, best_err = qq, err
        else:
            take = err < best_err
            best = jnp.where(take, qq, best)
            best_err = jnp.where(take, err, best_err)
    return jnp.where(v < 0, -best, best)


def _palette16(q0, q1, signed):
    """Endpoints (N, 3) -> decoded palette (N, 16, 3) in the signed
    value-int domain (sign * half-magnitude) — exact decoder semantics."""
    u0 = _unquantize(q0, 10, signed)[:, None, :]
    u1 = _unquantize(q1, 10, signed)[:, None, :]
    pal = []
    for k in range(16):
        w = int(_W4[k])
        fin = _finish((u0 * (64 - w) + u1 * w + 32) >> 6, signed)
        if signed:
            fin = jnp.where(fin >= 0x8000, -(fin & 0x7FFF), fin)
        pal.append(fin)
    return jnp.concatenate(pal, axis=1)  # (N, 16, 3)


def _assign16(h, q0, q1, signed):
    """Nearest palette index per texel under exact decode semantics.

    Returns (codes (N, 16) int32, per-block SSE (N,) float32)."""
    pal = _palette16(q0, q1, signed)
    best_idx = jnp.zeros(h.shape[:2], _I32)
    best_err = None
    for k in range(16):
        d = (h - pal[:, k][:, None, :]).astype(jnp.float32)
        err = jnp.sum(d * d, axis=-1)
        if best_err is None:
            best_err = err
        else:
            take = err < best_err
            best_idx = jnp.where(take, k, best_idx)
            best_err = jnp.where(take, err, best_err)
    return best_idx, jnp.sum(best_err, axis=1)


def _encode_mode11(h: jnp.ndarray, signed: bool, refine_iters: int) -> jnp.ndarray:
    """Shared mode-11 core. h: (N, 16, 3) int32 signed value-ints
    (sign * half-magnitude — the domain the decode chain interpolates in,
    non-negative when signed=False). Returns (N, 4) uint32 blocks.

    Endpoints from the block's PRINCIPAL AXIS, not per-channel min/max:
    mode 11 shares ONE texel index across channels, so box-corner endpoints
    collapse catastrophically on anti-correlated channels (a texel wanting
    index 15 in R and 0 in G). PCA endpoints + least-squares refit rounds,
    same recipe as the BC1 encoder (kernels/bc1.py).
    """
    from hap_tpu.kernels.bc1 import _fit_endpoints_ls, _principal_axis

    n = h.shape[0]
    lo, hi = (-0x7BFF, 0x7BFF) if signed else (0, 0x7BFF)
    quant = _quantize10_signed if signed else _quantize10_unsigned

    def q_of(e):
        return quant(jnp.clip(jnp.round(e), lo, hi).astype(_I32))

    px = h.astype(jnp.float32)
    axis = _principal_axis(px)
    mean = jnp.mean(px, axis=1)
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    e0 = mean + axis * jnp.min(t, axis=1)[:, None]
    e1 = mean + axis * jnp.max(t, axis=1)[:, None]
    q0, q1 = q_of(e0), q_of(e1)
    codes, err = _assign16(h, q0, q1, signed)

    # Second seed: per-channel min/max box corners — better than the PCA
    # line on decorrelated-noise blocks (the cloud has no dominant axis).
    # Keep whichever reconstructs better under exact decode semantics.
    e0b = jnp.min(px, axis=1)
    e1b = jnp.max(px, axis=1)
    q0b, q1b = q_of(e0b), q_of(e1b)
    codes_b, err_b = _assign16(h, q0b, q1b, signed)

    take_b = err_b < err
    q0 = jnp.where(take_b[:, None], q0b, q0)
    q1 = jnp.where(take_b[:, None], q1b, q1)
    codes = jnp.where(take_b[:, None], codes_b, codes)
    e0 = jnp.where(take_b[:, None], e0b, e0)
    e1 = jnp.where(take_b[:, None], e1b, e1)

    spx = jnp.sum(px, axis=1)
    for _ in range(refine_iters):
        # index weights without a gather: 16-way where-chain (small-table
        # rule, CLAUDE.md perf facts)
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 16):
            w = jnp.where(codes == k, float(_W4[k]) / 64.0, w)
        e0n, e1n = _fit_endpoints_ls(px, w, e0, e1, spx)
        q0n, q1n = q_of(e0n), q_of(e1n)
        codes_n, err_n = _assign16(h, q0n, q1n, signed)
        # quantized refit can regress; keep it only where it helps
        take = err_n < err
        q0 = jnp.where(take[:, None], q0n, q0)
        q1 = jnp.where(take[:, None], q1n, q1)
        codes = jnp.where(take[:, None], codes_n, codes)
        e0 = jnp.where(take[:, None], e0n, e0)
        e1 = jnp.where(take[:, None], e1n, e1)
        err = jnp.minimum(err, err_n)

    # Anchor rule: texel 0 index MSB must be 0 (palette is weight-symmetric,
    # w[15-k] == 64 - w[k], so the swap is exact).
    swap = codes[:, 0] >= 8
    codes = jnp.where(swap[:, None], 15 - codes, codes)
    q0s = jnp.where(swap[:, None], q1, q0)
    q1s = jnp.where(swap[:, None], q0, q1)

    bits = jnp.zeros((n, 4), _U32)

    def set_bits(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w_, b = start // 32, start % 32
        bits = bits.at[:, w_].set(bits[:, w_] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w_ + 1].set(bits[:, w_ + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits(bits, 0, 5, jnp.full(n, 0x03, _I32))  # mode 11 marker
    posn = 5
    for c in range(3):
        bits = set_bits(bits, posn, 10, q0s[:, c]); posn += 10
    for c in range(3):
        bits = set_bits(bits, posn, 10, q1s[:, c]); posn += 10
    bits = set_bits(bits, posn, 3, codes[:, 0]); posn += 3
    for t_ in range(1, 16):
        bits = set_bits(bits, posn, 4, codes[:, t_]); posn += 4
    return bits


@partial(jax.jit, static_argnames=("refine_iters",))
def bc6h_encode_blocks_mode11(half_bits: jnp.ndarray, refine_iters: int = 1) -> jnp.ndarray:
    """(N, 16, 3) uint16 half-float bits (non-negative finite; BC6U range)
    -> (N, 4) uint32 BC6H mode-11 blocks."""
    h = half_bits.astype(_I32)
    h = jnp.clip(h, 0, 0x7BFF)  # clamp to finite non-negative halfs
    return _encode_mode11(h, signed=False, refine_iters=refine_iters)


@partial(jax.jit, static_argnames=("refine_iters",))
def bc6h_encode_blocks_mode11_signed(
    half_bits: jnp.ndarray, refine_iters: int = 1
) -> jnp.ndarray:
    """(N, 16, 3) uint16 half-float bits (finite, either sign; BC6S range)
    -> (N, 4) uint32 BC6H SF16 mode-11 blocks.

    Sign-magnitude half bits are compared/interpolated as signed value-ints
    (sign * magnitude), the domain the signed decode chain (_unquantize /
    _finish with signed=True) operates in; endpoints are stored as 10-bit
    two's-complement per the BPTC float spec."""
    hb = half_bits.astype(_I32)
    m = jnp.clip(hb & 0x7FFF, 0, 0x7BFF)  # clamp to finite magnitude
    h = jnp.where(hb >= 0x8000, -m, m)  # signed value-int domain
    return _encode_mode11(h, signed=True, refine_iters=refine_iters)
