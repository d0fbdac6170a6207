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

def _quantize_ep_unsigned(h: jnp.ndarray, epb: int = 10) -> jnp.ndarray:
    """Half bits (int32, finite, non-negative) -> epb-bit endpoint.

    The decode path is half_bits = finish(unquantize(q)) = (unq * 31) >> 6,
    so the quantizer targets unq ~= h * 64 / 31, then inverts the
    unquantize map (((q << 16) + 0x8000) >> epb) with a +-1 local search on
    the true end-to-end error.
    """
    full = (1 << epb) - 1
    target = (h * 64 + 15) // 31
    if epb >= 15:
        q = target  # unquantize is identity at >= 15 bits
    else:
        q = (target << epb) // 0x10000
    best = None
    best_err = None
    for dq in (0, 1, 2):
        qq = jnp.clip(q + dq, 0, full)
        rec = _finish(_unquantize(qq, epb, False), False)
        err = jnp.abs(rec - h)
        if best is None:
            best, best_err = qq, err
        else:
            take = err < best_err
            best = jnp.where(take, qq, best)
            best_err = jnp.where(take, err, best_err)
    return best


def _quantize10_unsigned(h: jnp.ndarray) -> jnp.ndarray:
    return _quantize_ep_unsigned(h, 10)


def _quantize_ep_signed(v: jnp.ndarray, epb: int = 10) -> jnp.ndarray:
    """Signed half value-int (sign * magnitude-bits) -> signed epb-bit
    endpoint, inverting the signed decode chain
    finish(unquantize(q, epb, True), True) with a +-1 local search."""
    full = (1 << (epb - 1)) - 1
    m = jnp.abs(v)
    target = (m * 32 + 15) // 31  # invert finish: (|x| * 31) >> 5
    if epb >= 16:
        q = target
    else:
        q = (target << (epb - 1)) // 0x8000  # invert unquantize
    best = None
    best_err = None
    for dq in (0, 1, 2):
        qq = jnp.clip(q + dq, 0, full)
        rec = _finish(_unquantize(qq, epb, True), True) & 0x7FFF
        err = jnp.abs(rec - m)
        if best is None:
            best, best_err = qq, err
        else:
            take = err < best_err
            best = jnp.where(take, qq, best)
            best_err = jnp.where(take, err, best_err)
    return jnp.where(v < 0, -best, best)


def _quantize10_signed(v: jnp.ndarray) -> jnp.ndarray:
    return _quantize_ep_signed(v, 10)


def _palette16(q0, q1, signed, epb: int = 10):
    """Endpoints (N, 3) -> decoded palette (N, 16, 3) in the signed
    value-int domain (sign * half-magnitude) — exact decoder semantics."""
    u0 = _unquantize(q0, epb, signed)[:, None, :]
    u1 = _unquantize(q1, epb, signed)[:, None, :]
    pal = []
    for k in range(16):
        w = int(_W4[k])
        fin = _finish((u0 * (64 - w) + u1 * w + 32) >> 6, signed)
        if signed:
            fin = jnp.where(fin >= 0x8000, -(fin & 0x7FFF), fin)
        pal.append(fin)
    return jnp.concatenate(pal, axis=1)  # (N, 16, 3)


def _assign16(h, q0, q1, signed, epb: int = 10):
    """Nearest palette index per texel under exact decode semantics.

    Returns (codes (N, 16) int32, per-block SSE (N,) float32)."""
    pal = _palette16(q0, q1, signed, epb)
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
    return _encode_single_region(h, signed, refine_iters, 0x03)


def _encode_single_region(h: jnp.ndarray, signed: bool, refine_iters: int,
                          mode_key: int) -> jnp.ndarray:
    """Single-region encoder core for mode 11 (0x03, 10.10 untransformed)
    and the DELTA modes 0x07 (11.9) and 0x0B (12.8) — round-4 addition:
    on smooth HDR the delta modes' higher base precision halves the
    endpoint quantization step, and their delta fields almost always fit
    (tools/eval_bc7m7_bc6hdelta.py measured 89-100% feasibility on the
    anchor classes; infeasible deltas are CLAMPED, producing a valid but
    worse block that exact-decode adjudication discards).

    h: (N, 16, 3) int32 signed value-ints (sign * half-magnitude — the
    domain the decode chain interpolates in, non-negative when
    signed=False). Returns (N, 4) uint32 blocks.

    Endpoints from the block's PRINCIPAL AXIS, not per-channel min/max:
    these modes share ONE texel index across channels, so box-corner
    endpoints collapse catastrophically on anti-correlated channels (a
    texel wanting index 15 in R and 0 in G). PCA endpoints + least-squares
    refit rounds, same recipe as the BC1 encoder (kernels/bc1.py).
    """
    from hap_tpu.kernels.bc1 import _fit_endpoints_ls, _principal_axis

    cfg = MODES6[mode_key]
    epb, delta = cfg["epb"], cfg["delta"]
    n = h.shape[0]
    lo, hi = (-0x7BFF, 0x7BFF) if signed else (0, 0x7BFF)
    quant = (_quantize_ep_signed if signed else _quantize_ep_unsigned)
    ep_lo = -((1 << (epb - 1)) - 1) if signed else 0
    ep_hi = (1 << (epb - 1)) - 1 if signed else (1 << epb) - 1

    def clamp_delta(q0, q1):
        if delta is None:
            return q1
        db = delta[0]
        # symmetric range so the anchor endpoint swap (d -> -d) stays legal
        half = (1 << (db - 1)) - 1
        d = jnp.clip(q1 - q0, -half, half)
        return jnp.clip(q0 + d, ep_lo, ep_hi)

    def q_of_pair(e0, e1):
        q0 = quant(jnp.clip(jnp.round(e0), lo, hi).astype(_I32), epb)
        q1 = quant(jnp.clip(jnp.round(e1), lo, hi).astype(_I32), epb)
        return q0, clamp_delta(q0, q1)

    px = h.astype(jnp.float32)
    axis = _principal_axis(px)
    mean = jnp.mean(px, axis=1)
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    e0 = mean + axis * jnp.min(t, axis=1)[:, None]
    e1 = mean + axis * jnp.max(t, axis=1)[:, None]
    q0, q1 = q_of_pair(e0, e1)
    codes, err = _assign16(h, q0, q1, signed, epb)

    # Second seed: per-channel min/max box corners — better than the PCA
    # line on decorrelated-noise blocks (the cloud has no dominant axis).
    # Keep whichever reconstructs better under exact decode semantics.
    e0b = jnp.min(px, axis=1)
    e1b = jnp.max(px, axis=1)
    q0b, q1b = q_of_pair(e0b, e1b)
    codes_b, err_b = _assign16(h, q0b, q1b, signed, epb)

    take_b = err_b < err
    q0 = jnp.where(take_b[:, None], q0b, q0)
    q1 = jnp.where(take_b[:, None], q1b, q1)
    codes = jnp.where(take_b[:, None], codes_b, codes)
    e0 = jnp.where(take_b[:, None], e0b, e0)
    e1 = jnp.where(take_b[:, None], e1b, e1)
    err = jnp.minimum(err, err_b)

    spx = jnp.sum(px, axis=1)
    for _ in range(refine_iters):
        # index weights without a gather: 16-way where-chain (small-table
        # rule, CLAUDE.md perf facts)
        w = jnp.zeros(codes.shape, jnp.float32)
        for k in range(1, 16):
            w = jnp.where(codes == k, float(_W4[k]) / 64.0, w)
        e0n, e1n = _fit_endpoints_ls(px, w, e0, e1, spx)
        q0n, q1n = q_of_pair(e0n, e1n)
        codes_n, err_n = _assign16(h, q0n, q1n, signed, epb)
        # quantized refit can regress; keep it only where it helps
        take = err_n < err
        q0 = jnp.where(take[:, None], q0n, q0)
        q1 = jnp.where(take[:, None], q1n, q1)
        codes = jnp.where(take[:, None], codes_n, codes)
        e0 = jnp.where(take[:, None], e0n, e0)
        e1 = jnp.where(take[:, None], e1n, e1)
        err = jnp.minimum(err, err_n)

    # Anchor rule: texel 0 index MSB must be 0 (palette is weight-symmetric,
    # w[15-k] == 64 - w[k], so the swap is exact; the delta range was kept
    # symmetric above so the swapped pair's delta still fits).
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

    bits = set_bits(bits, 0, 5, jnp.full(n, mode_key, _I32))
    posn = 5
    if delta is None:
        for c in range(3):
            bits = set_bits(bits, posn, 10, q0s[:, c]); posn += 10
        for c in range(3):
            bits = set_bits(bits, posn, 10, q1s[:, c]); posn += 10
    else:
        # pack base endpoints + deltas through the mode's layout table
        # (delta fields store q1 - q0 in two's complement)
        field_src = {}
        for ci, cn in enumerate("rgb"):
            field_src[cn + "w"] = q0s[:, ci]
            field_src[cn + "x"] = q1s[:, ci] - q0s[:, ci]
        for (name, flo, nbits, rev) in cfg["layout"]:
            v = (field_src[name] >> flo) & ((1 << nbits) - 1)
            if rev and nbits > 1:
                rv = jnp.zeros_like(v)
                for i in range(nbits):
                    rv = rv | (((v >> i) & 1) << (nbits - 1 - i))
                v = rv
            bits = set_bits(bits, posn, nbits, v)
            posn += nbits
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


# ---------------------------------------------------------------------------
# Two-subset encoder: mode 0x1E (6,6,6,6 untransformed endpoints, 3-bit
# indices, 5-bit partition). The one two-subset mode with no delta
# compression, so endpoints quantize independently — the natural first
# two-subset mode for an encoder. Adaptive wrapper keeps mode 11 where it
# reconstructs better under exact decode semantics (VERDICT r2 item 8).
# ---------------------------------------------------------------------------

def _quantize6(v: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """Value-int -> 6-bit endpoint, inverting finish(unquantize(q, 6))
    with a local search (same recipe as _quantize10_*)."""
    if not signed:
        target = (v * 64 + 15) // 31
        q = (target << 6) // 0x10000
        best = best_err = None
        for dq in (0, 1, 2):
            qq = jnp.clip(q + dq, 0, 63)
            rec = _finish(_unquantize(qq, 6, False), False)
            err = jnp.abs(rec - v)
            if best is None:
                best, best_err = qq, err
            else:
                take = err < best_err
                best = jnp.where(take, qq, best)
                best_err = jnp.where(take, err, best_err)
        return best
    m = jnp.abs(v)
    target = (m * 32 + 15) // 31
    q = (target << 5) // 0x8000
    best = best_err = None
    for dq in (0, 1, 2):
        qq = jnp.clip(q + dq, 0, 31)
        rec = _finish(_unquantize(qq, 6, True), True) & 0x7FFF
        err = jnp.abs(rec - m)
        if best is None:
            best, best_err = qq, err
        else:
            take = err < best_err
            best = jnp.where(take, qq, best)
            best_err = jnp.where(take, err, best_err)
    return jnp.where(v < 0, -best, best)


def _palette8(q0, q1, signed):
    """6-bit endpoints (N, 3) -> decoded 8-entry palette (N, 8, 3) in the
    signed value-int domain (exact decoder semantics, weights _W3)."""
    u0 = _unquantize(q0, 6, signed)[:, None, :]
    u1 = _unquantize(q1, 6, signed)[:, None, :]
    pal = []
    for k in range(8):
        w = int(_W3[k])
        fin = _finish((u0 * (64 - w) + u1 * w + 32) >> 6, signed)
        if signed:
            fin = jnp.where(fin >= 0x8000, -(fin & 0x7FFF), fin)
        pal.append(fin)
    return jnp.concatenate(pal, axis=1)


def _or_bits_dynamic(bits, start, length_mask, vals):
    """OR ``vals`` (N,) into the 128-bit blocks at DYNAMIC bit offsets
    ``start`` (N,). vals must already be masked to their width."""
    vals = vals.astype(_U32)
    w_lo = (start >> 5).astype(_I32)
    b = (start & 31).astype(_U32)
    lo = vals << b
    hi = jnp.where(b == 0, jnp.uint32(0), vals >> (32 - b))
    out = []
    for wi in range(4):
        contrib = jnp.where(w_lo == wi, lo, jnp.uint32(0)) | jnp.where(
            w_lo == wi - 1, hi, jnp.uint32(0))
        out.append(bits[:, wi] | contrib)
    return jnp.stack(out, axis=1)


def _encode_mode1E(h: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """(N, 16, 3) value-ints -> (N, 4) uint32 mode-0x1E blocks.

    Partition seed: threshold the principal-axis projection at its
    midpoint, then pick the 2-subset partition (of the 32) agreeing best
    with that labeling (label polarity is irrelevant — the fit uses the
    table's own subset map). Per-subset per-channel min/max box endpoints,
    6-bit quantization, exact-palette index assignment, per-subset anchor
    swaps (W3 is weight-symmetric, so the swap is exact)."""
    from hap_tpu.kernels.bc1 import _principal_axis
    from hap_tpu.kernels.bc7_tables import ANCHOR2_2, PARTITIONS2

    n = h.shape[0]
    px = h.astype(jnp.float32)
    axis = _principal_axis(px)
    mean = jnp.mean(px, axis=1)
    t = jnp.sum((px - mean[:, None, :]) * axis[:, None, :], axis=-1)
    mid = 0.5 * (jnp.min(t, axis=1) + jnp.max(t, axis=1))
    labels = (t > mid[:, None]).astype(jnp.float32)  # (N, 16)

    parts = jnp.asarray(PARTITIONS2[:32], jnp.float32)  # (32, 16)
    agree = labels @ parts.T + (1.0 - labels) @ (1.0 - parts.T)
    score = jnp.maximum(agree, 16.0 - agree)
    partition = jnp.argmax(score, axis=1).astype(_I32)  # (N,)

    onehot = jax.nn.one_hot(partition, 32, dtype=jnp.float32)
    subset = jnp.round(onehot @ parts).astype(_I32)  # (N, 16)
    anchor2 = jnp.round(
        onehot @ jnp.asarray(ANCHOR2_2[:32, None], jnp.float32)
    ).astype(_I32)[:, 0]

    lo_cl, hi_cl = (-0x7BFF, 0x7BFF) if signed else (0, 0x7BFF)
    qs = []
    codes = jnp.zeros((n, 16), _I32)
    for s in (0, 1):
        in_s = (subset == s)[:, :, None]
        big = jnp.float32(1e9)
        e0 = jnp.min(jnp.where(in_s, px, big), axis=1)
        e1 = jnp.max(jnp.where(in_s, px, -big), axis=1)
        q0 = _quantize6(jnp.clip(jnp.round(e0), lo_cl, hi_cl).astype(_I32),
                        signed)
        q1 = _quantize6(jnp.clip(jnp.round(e1), lo_cl, hi_cl).astype(_I32),
                        signed)
        pal = _palette8(q0, q1, signed)  # (N, 8, 3)
        best_idx = jnp.zeros((n, 16), _I32)
        best_err = None
        for k in range(8):
            d = (h - pal[:, k][:, None, :]).astype(jnp.float32)
            err = jnp.sum(d * d, axis=-1)
            if best_err is None:
                best_err = err
            else:
                take = err < best_err
                best_idx = jnp.where(take, k, best_idx)
                best_err = jnp.where(take, err, best_err)
        codes = jnp.where(subset == s, best_idx, codes)
        qs.append((q0, q1))

    # Anchor swaps: the anchor texel's index MSB must be 0; W3 symmetry
    # (w[7-k] == 64 - w[k]) makes endpoint-swap + index-complement exact.
    texel = jnp.arange(16, dtype=_I32)[None, :]
    anchors = [jnp.zeros(n, _I32), anchor2]
    for s in (0, 1):
        a = anchors[s]
        acode = jnp.take_along_axis(codes, a[:, None], axis=1)[:, 0]
        swap = acode >= 4
        in_s = subset == s
        codes = jnp.where(swap[:, None] & in_s, 7 - codes, codes)
        q0, q1 = qs[s]
        qs[s] = (jnp.where(swap[:, None], q1, q0),
                 jnp.where(swap[:, None], q0, q1))

    # -- bit packing through the mode's layout table ----------------------
    cfg = MODES6[0x1E]
    field_src = {
        "rw": qs[0][0][:, 0], "gw": qs[0][0][:, 1], "bw": qs[0][0][:, 2],
        "rx": qs[0][1][:, 0], "gx": qs[0][1][:, 1], "bx": qs[0][1][:, 2],
        "ry": qs[1][0][:, 0], "gy": qs[1][0][:, 1], "by": qs[1][0][:, 2],
        "rz": qs[1][1][:, 0], "gz": qs[1][1][:, 1], "bz": qs[1][1][:, 2],
    }
    bits = jnp.zeros((n, 4), _U32)

    def set_bits_static(bits, start, length, vals):
        vals = vals.astype(_U32) & ((1 << length) - 1)
        w_, b = start // 32, start % 32
        bits = bits.at[:, w_].set(bits[:, w_] | (vals << b))
        if b + length > 32:
            bits = bits.at[:, w_ + 1].set(
                bits[:, w_ + 1] | (vals >> (32 - b)))
        return bits

    bits = set_bits_static(bits, 0, 5, jnp.full(n, 0x1E, _I32))
    pos = 5
    for (name, lo, nbits, rev) in cfg["layout"]:
        assert not rev  # 0x1E has no reversed runs
        bits = set_bits_static(bits, pos, nbits, field_src[name] >> lo)
        pos += nbits
    bits = set_bits_static(bits, pos, 5, partition)
    pos += 5

    # indices: anchors carry 2 bits, others 3, packed in texel order at
    # data-dependent offsets (mirrors the decoder's _get_bits_dynamic)
    is_anchor = (texel == anchors[0][:, None]) | (texel == anchors[1][:, None])
    widths = jnp.where(is_anchor, 2, 3)
    offs = jnp.concatenate(
        [jnp.zeros((n, 1), _I32), jnp.cumsum(widths[:, :-1], axis=1)], axis=1
    )
    for t_ in range(16):
        v = codes[:, t_] & (
            jnp.where(is_anchor[:, t_], 3, 7).astype(_I32))
        bits = _or_bits_dynamic(bits, pos + offs[:, t_], None, v)
    return bits


def _to_value_int(half_bits, signed):
    x = half_bits.astype(_I32)  # decode emits unsigned bit patterns
    if not signed:
        return x
    m = x & 0x7FFF
    return jnp.where(x >= 0x8000, -m, m)


@partial(jax.jit, static_argnames=("signed", "refine_iters"))
def bc6h_encode_blocks_adaptive(
    half_bits: jnp.ndarray, signed: bool = False, refine_iters: int = 1
) -> jnp.ndarray:
    """Adaptive single-region / two-subset encoder: candidates are mode 11
    (10.10), the DELTA modes 0x07 (11.9) and 0x0B (12.8) — round-4
    addition; their higher base precision wins on smooth HDR where the
    deltas fit — and the two-subset mode 0x1E. Every candidate is DECODED
    with the real decoder and the lowest exact-SSE block wins."""
    hb = half_bits.astype(_I32)
    if signed:
        m = jnp.clip(hb & 0x7FFF, 0, 0x7BFF)
        h = jnp.where(hb >= 0x8000, -m, m)
    else:
        h = jnp.clip(hb, 0, 0x7BFF)

    def sse_of(w):
        d = _to_value_int(bc6h_decode_blocks(w, signed=signed), signed)
        return jnp.sum((d - h).astype(jnp.float32) ** 2, axis=(1, 2))

    best_w = _encode_mode11(h, signed=signed, refine_iters=refine_iters)
    best_e = sse_of(best_w)
    for cand in (
        _encode_single_region(h, signed, refine_iters, 0x07),
        _encode_single_region(h, signed, refine_iters, 0x0B),
        _encode_mode1E(h, signed=signed),
    ):
        e = sse_of(cand)
        take = (e < best_e)[:, None]
        best_w = jnp.where(take, cand, best_w)
        best_e = jnp.minimum(best_e, e)
    return best_w
