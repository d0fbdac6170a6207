"""Adjudicate BC7 mode 7 and the BC6H delta modes (VERDICT r4 item 5),
the way eval_bc7_mode4.py adjudicated mode 4: build an IDEALIZED upper
bound for each candidate mode (every coupling the real mode imposes is
ignored, so a real encoder can only do worse) and compare against the
shipped adaptive encoders on the anchor content classes. Implement only
if the bound beats shipping somewhere; otherwise the numbers become the
measured-exclusion record in BASELINE.md.

* BC7 mode 7 (2 subsets, RGBA 5.5.5.5 + per-endpoint P-bits, 2-bit
  indices, 64 partitions): bound fits each CHANNEL independently at
  6-bit endpoint precision per subset (real mode 7 shares one index
  plane across RGBA and one P-bit per endpoint) over all 64 partitions.
  Target content: two-population blocks whose alpha edge follows the
  color edge — exactly what mode 5's shared 2-bit plane blurs.
* BC6H delta modes 0x07/0x0B/0x0F (11.9 / 12.8 / 16.4 single-region):
  bound quantizes per-channel min/max endpoints at the mode's base
  precision with the spec's exact unquantize+interp+finish semantics,
  requires the quantized delta to fit the mode's signed delta width,
  and grants per-channel independent 4-bit indices (real blocks share
  one index plane). Evaluated in f32 rel-RMSE like the quality anchor.

CPU-only.
"""
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp

H = W = 256

# BC7 interpolation weights
W2 = np.array([0, 21, 43, 64], np.int64)
W4 = np.array([0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64],
              np.int64)


def _fit_plane_masked(vals, mask, ep_bits, weights):
    """Best reconstruction of vals (N, 16) on masked texels with b-bit
    endpoints at min/max + exhaustive nearest-index assignment."""
    big = np.where(mask, vals, np.inf)
    sml = np.where(mask, vals, -np.inf)
    lo = np.min(big, axis=1)
    hi = np.max(sml, axis=1)
    lo = np.where(np.isfinite(lo), lo, 0.0)
    hi = np.where(np.isfinite(hi), hi, 0.0)
    scale = (1 << ep_bits) - 1

    def q(e):
        qq = np.clip(np.round(e / 255.0 * scale), 0, scale).astype(np.int64)
        return (qq << (8 - ep_bits)) | (qq >> (2 * ep_bits - 8))

    e0, e1 = q(lo), q(hi)
    pal = ((e0[:, None] * (64 - weights[None, :])
            + e1[:, None] * weights[None, :] + 32) >> 6)
    d = np.abs(vals[:, :, None] - pal[:, None, :])
    rec = pal[np.arange(len(vals))[:, None], np.argmin(d, axis=2)]
    return np.where(mask, rec, vals)


def bc7_mode7_bound(blocks):
    """blocks (N, 16, 4) float -> (N,) best SSE over 64 partitions with
    per-channel independent 6-bit endpoint fits + 2-bit indices."""
    from hap_tpu.kernels.bc7_tables import PARTITIONS2

    n = blocks.shape[0]
    best = np.full(n, np.inf)
    for part in range(64):
        subset = np.asarray(PARTITIONS2[part])  # (16,)
        rec = np.empty_like(blocks)
        for s in (0, 1):
            mask = (subset == s)[None, :].repeat(n, axis=0)
            for c in range(4):
                rec[:, :, c] = np.where(
                    mask, _fit_plane_masked(blocks[:, :, c], mask, 6, W2),
                    rec[:, :, c] if s else 0)
        sse = ((rec - blocks) ** 2).sum(axis=(1, 2))
        best = np.minimum(best, sse)
    return best


# ---- BC6H helpers (spec-exact, numpy) --------------------------------------

def _unquantize_np(x, bits):
    if bits >= 15:
        return x
    full = (1 << bits) - 1
    unq = ((x << 16) + 0x8000) >> bits
    return np.where(x == 0, 0, np.where(x == full, 0xFFFF, unq))


def _finish_np(x):
    return (x * 31) >> 6


def bc6h_delta_bound(h_bits, epb, delta_bits):
    """h_bits (N, 16, 3) uint16 UF16 halves. Returns (rec_half (N,16,3),
    feasible (N,)) for the idealized (epb, delta) single-region mode."""
    v = h_bits.astype(np.int64)  # UF16: value-int == half bits
    lo = v.min(axis=1)  # (N, 3)
    hi = v.max(axis=1)
    full = (1 << epb) - 1

    def quant(x):
        # best-of floor/ceil of the spec-space target (idealized). The
        # decode chain is finish(unquantize(q)) = ((unq * 31) >> 6), so
        # the target code tracks x * (64/31) lifted to the 17-bit space.
        t = x.astype(np.float64) * (64.0 / 31.0) * full / 65536.0
        cands = np.stack([np.floor(t), np.ceil(t)]).astype(np.int64)
        cands = np.clip(cands, 0, full)
        err = np.abs(_finish_np(_unquantize_np(cands, epb)) - x[None])
        pick = np.argmin(err, axis=0)
        return np.take_along_axis(cands, pick[None], 0)[0]

    q0 = quant(lo)
    q1 = quant(hi)
    dq = q1 - q0
    half = 1 << (delta_bits - 1)
    feasible = ((dq >= -half) & (dq < half)).all(axis=1)  # (N,)
    u0 = _unquantize_np(q0, epb)[:, None, :]  # (N, 1, 3)
    u1 = _unquantize_np(q1, epb)[:, None, :]
    pal = _finish_np(
        (u0[..., None] * (64 - W4[None, None, None, :])
         + u1[..., None] * W4[None, None, None, :] + 32) >> 6
    )  # (N, 1, 3, 16)
    d = np.abs(v[:, :, :, None] - pal)
    rec = np.take_along_axis(
        pal.repeat(16, axis=1), np.argmin(d, axis=3)[..., None], axis=3
    )[..., 0]
    return rec, feasible


def main():
    from tools.bench_content import make_frame
    from hap_tpu.kernels.bc7 import bc7_decode_blocks, bc7_encode_blocks
    from hap_tpu.kernels.layout import image_to_blocks

    p = lambda m: 10 * np.log10(255.0 ** 2 / max(m, 1e-9))

    # ---- BC7 mode 7 --------------------------------------------------------
    rng = np.random.default_rng(0)
    for label in ("sprite (alpha edge == color edge)", "alpha decorrelated"):
        rgb = make_frame("graphics", 0, H, W).astype(np.float64)
        if label.startswith("sprite"):
            # two-population blocks: hard alpha cutout following color
            lum = rgb.mean(-1)
            a = np.where(lum > np.median(lum), 255.0, 20.0)
            a += rng.normal(0, 6, a.shape)
        else:
            a = make_frame("noise", 3, H, W)[..., 0].astype(np.float64)
        img = np.concatenate(
            [rgb, np.clip(a, 0, 255)[..., None]], axis=-1).astype(np.uint8)
        blocks = np.asarray(image_to_blocks(jnp.asarray(img))).astype(np.float64)
        wds = bc7_encode_blocks(jnp.asarray(blocks.astype(np.uint8)))
        out = np.asarray(bc7_decode_blocks(wds)).astype(np.float64)
        mse_ship = np.mean((out - blocks) ** 2)
        # per-block best of shipped vs bound = what adding mode 7 could give
        sse_ship = ((out - blocks) ** 2).sum(axis=(1, 2))
        sse_b = bc7_mode7_bound(blocks)
        mse_added = np.minimum(sse_ship, sse_b).mean() / (16 * 4)
        mse_bound = sse_b.mean() / (16 * 4)
        # NOTE: "shipped" is whatever bc7_encode_blocks currently is —
        # since round 4 that INCLUDES mode 7, so the remaining "potential"
        # is the bound's looseness, not an unimplemented mode.
        print(f"BC7 {label}: shipped adaptive = {p(mse_ship):.2f} dB; "
              f"mode-7 UPPER BOUND alone = {p(mse_bound):.2f} dB; "
              f"adaptive+mode7 bound = {p(mse_added):.2f} dB "
              f"(potential {p(mse_added)-p(mse_ship):+.2f} dB)", flush=True)

    # ---- BC6H delta modes --------------------------------------------------
    from hap_tpu.kernels.bc6h import (
        bc6h_decode_blocks,
        bc6h_encode_blocks_adaptive,
        f32_to_half_bits,
        half_bits_to_f32,
    )

    for cls in ("natural", "graphics", "noise"):
        imgf = make_frame(cls, 0, H, W).astype(np.float32)
        hdr = (imgf / 255.0) ** 2.2 * 8.0  # same flavor as quality anchor HDR
        hbits = np.asarray(f32_to_half_bits(jnp.asarray(hdr)))
        hb = np.asarray(image_to_blocks(jnp.asarray(hbits)))
        ref = np.asarray(half_bits_to_f32(jnp.asarray(hb))).astype(np.float64)
        scale = max(np.abs(ref).max(), 1e-9)

        wds = bc6h_encode_blocks_adaptive(jnp.asarray(hb), signed=False)
        dec = np.asarray(half_bits_to_f32(
            bc6h_decode_blocks(wds))).astype(np.float64)
        rel_ship = np.sqrt(((dec - ref) ** 2).mean()) / scale
        sse_ship = ((dec - ref) ** 2).sum(axis=(1, 2))

        # "shipped" = current bc6h_encode_blocks_adaptive — since round 4
        # that INCLUDES delta modes 0x07/0x0B. Residual gap vs the bounds
        # is bound looseness: the bound fits each channel independently,
        # the real modes share ONE index per texel across channels (loose
        # exactly on channel-decorrelated content like natural HDR).
        row = [f"BC6H {cls:9s}: shipped adaptive rel-RMSE {rel_ship:.4f}"]
        best_added = sse_ship.copy()
        for name, epb, db in (("11.9", 11, 9), ("12.8", 12, 8),
                              ("16.4", 16, 4)):
            rec, feas = bc6h_delta_bound(hb.astype(np.uint16), epb, db)
            recf = np.asarray(half_bits_to_f32(
                jnp.asarray(rec.astype(np.uint16)))).astype(np.float64)
            sse_m = ((recf - ref) ** 2).sum(axis=(1, 2))
            sse_m = np.where(feas, sse_m, np.inf)
            best_added = np.minimum(best_added, sse_m)
            rel_m = np.sqrt(np.where(np.isfinite(sse_m), sse_m,
                                     sse_ship).mean() / (16 * 3)) / scale
            row.append(f"{name} bound {rel_m:.4f} ({feas.mean()*100:.0f}% feas)")
        rel_added = np.sqrt(best_added.mean() / (16 * 3)) / scale
        row.append(f"adaptive+deltas bound {rel_added:.4f} "
                   f"({(1 - rel_added / max(rel_ship, 1e-12)) * 100:+.1f}%)")
        print("; ".join(row), flush=True)


if __name__ == "__main__":
    main()
