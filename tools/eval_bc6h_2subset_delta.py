"""Adjudicate the nine BC6H TWO-SUBSET delta modes (VERDICT r4 missing #4),
with the same bound-first protocol as eval_bc7m7_bc6hdelta.py: build an
IDEALIZED upper bound per mode (per-channel independent min/max endpoint
fits at the mode's base precision, per-channel independent 3-bit indices —
real blocks share ONE index plane and one partition across channels, so a
real encoder can only do worse) and compare against the shipped adaptive
encoder (11 / 0x07 / 0x0B / 0x1E since round 4). Implement only where the
bound beats shipping on an anchor class; otherwise these numbers are the
measured-exclusion record for BASELINE.md.

Modes under adjudication (hap.h:46-47 formats decode ALL of these; the
question is only whether ENCODING them pays):
  0x00 10.5.5.5   0x01 7.6.6.6    0x02 11.5.4.4
  0x06 11.4.5.4   0x0A 11.4.4.5   0x0E 9.5.5.5
  0x12 8.6.5.5    0x16 8.5.6.5    0x1A 8.5.5.6
Delta feasibility is exact: e1A, e0B, e1B must all be expressible as
signed per-channel deltas from e0A at the mode's widths (wrap semantics
ignored — idealized in the encoder's favor).

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

W3 = np.array([0, 9, 18, 27, 37, 46, 55, 64], np.int64)

TWO_SUBSET_DELTA = (0x00, 0x01, 0x02, 0x06, 0x0A, 0x0E, 0x12, 0x16, 0x1A)


def _unquantize_np(x, bits):
    if bits >= 15:
        return x
    full = (1 << bits) - 1
    unq = ((x << 16) + 0x8000) >> bits
    return np.where(x == 0, 0, np.where(x == full, 0xFFFF, unq))


def _finish_np(x):
    return (x * 31) >> 6


def _quant(x, epb):
    """Best-of floor/ceil code for target value-int x (N, 3) — same
    idealization as the single-region bound (eval_bc7m7_bc6hdelta.py)."""
    full = (1 << epb) - 1
    t = x.astype(np.float64) * (64.0 / 31.0) * full / 65536.0
    cands = np.stack([np.floor(t), np.ceil(t)]).astype(np.int64)
    cands = np.clip(cands, 0, full)
    err = np.abs(_finish_np(_unquantize_np(cands, epb)) - x[None])
    pick = np.argmin(err, axis=0)
    return np.take_along_axis(cands, pick[None], 0)[0]


def _fit_subset(v, mask, epb):
    """v (N, 16, 3) value-ints, mask (N, 16) -> (q0, q1, rec) with
    min/max endpoints at epb bits + per-channel nearest 3-bit index."""
    big = np.where(mask[..., None], v, np.iinfo(np.int64).max)
    sml = np.where(mask[..., None], v, np.iinfo(np.int64).min)
    lo = big.min(axis=1)
    hi = sml.max(axis=1)
    lo = np.where(mask.any(axis=1)[:, None], lo, 0)
    hi = np.where(mask.any(axis=1)[:, None], hi, 0)
    q0 = _quant(lo, epb)
    q1 = _quant(hi, epb)
    u0 = _unquantize_np(q0, epb)[:, None, :]  # (N, 1, 3)
    u1 = _unquantize_np(q1, epb)[:, None, :]
    pal = _finish_np(
        (u0[..., None] * (64 - W3[None, None, None, :])
         + u1[..., None] * W3[None, None, None, :] + 32) >> 6
    )  # (N, 1, 3, 8)
    d = np.abs(v[:, :, :, None] - pal)
    rec = np.take_along_axis(
        pal.repeat(16, axis=1), np.argmin(d, axis=3)[..., None], axis=3
    )[..., 0]
    return q0, q1, rec


def bc6h_2subset_delta_bound(hb, epb, deltas):
    """hb (N, 16, 3) uint16 UF16 halves -> per-block best feasible SSE
    over 32 partitions (np.inf where no partition is delta-feasible)."""
    from hap_tpu.kernels.bc7_tables import PARTITIONS2

    v = hb.astype(np.int64)
    n = v.shape[0]
    dlim = np.asarray(deltas, np.int64)
    half = 1 << (dlim - 1)
    best = np.full(n, np.inf)
    for part in range(32):
        subset = np.asarray(PARTITIONS2[part])  # (16,)
        mA = (subset == 0)[None, :].repeat(n, axis=0)
        mB = ~mA
        q0A, q1A, recA = _fit_subset(v, mA, epb)
        q0B, q1B, recB = _fit_subset(v, mB, epb)
        feas = np.ones(n, bool)
        for q in (q1A, q0B, q1B):
            dq = q - q0A  # (N, 3)
            feas &= ((dq >= -half[None]) & (dq < half[None])).all(axis=1)
        rec = np.where(mA[..., None], recA, recB)
        sse = ((rec.astype(np.float64) - v) ** 2).sum(axis=(1, 2))
        # SSE in the half-bits domain is only a selector here; quality is
        # re-measured in f32 below on the winning partition's rec
        best_new = np.where(feas & (sse < best), sse, best)
        if part == 0:
            recs = np.where(feas[:, None, None], rec, 0)
        else:
            upd = feas & (sse < best)
            recs = np.where(upd[:, None, None], rec, recs)
        best = best_new
    return best, recs


def main():
    from tools.bench_content import make_frame
    from hap_tpu.kernels.bc6h_tables import MODES6
    from hap_tpu.kernels.bc6h import (
        bc6h_decode_blocks,
        bc6h_encode_blocks_adaptive,
        f32_to_half_bits,
        half_bits_to_f32,
    )
    from hap_tpu.kernels.layout import image_to_blocks

    for cls in ("natural", "graphics", "noise"):
        imgf = make_frame(cls, 0, H, W).astype(np.float32)
        hdr = (imgf / 255.0) ** 2.2 * 8.0  # quality-anchor HDR flavor
        hbits = np.asarray(f32_to_half_bits(jnp.asarray(hdr)))
        hb = np.asarray(image_to_blocks(jnp.asarray(hbits))).astype(np.uint16)
        ref = np.asarray(half_bits_to_f32(jnp.asarray(hb))).astype(np.float64)
        scale = max(np.abs(ref).max(), 1e-9)

        wds = bc6h_encode_blocks_adaptive(jnp.asarray(hb), signed=False)
        dec = np.asarray(half_bits_to_f32(
            bc6h_decode_blocks(wds))).astype(np.float64)
        rel_ship = np.sqrt(((dec - ref) ** 2).mean()) / scale
        sse_ship = ((dec - ref) ** 2).sum(axis=(1, 2))

        rows = [f"BC6H {cls:9s}: shipped adaptive rel-RMSE {rel_ship:.4f}"]
        best_added = sse_ship.copy()
        for m in TWO_SUBSET_DELTA:
            cfg = MODES6[m]
            sse_sel, recs = bc6h_2subset_delta_bound(
                hb, cfg["epb"], cfg["delta"])
            feas = np.isfinite(sse_sel)
            recf = np.asarray(half_bits_to_f32(
                jnp.asarray(recs.astype(np.uint16)))).astype(np.float64)
            sse_m = ((recf - ref) ** 2).sum(axis=(1, 2))
            sse_m = np.where(feas, sse_m, np.inf)
            best_added = np.minimum(best_added, sse_m)
            rel_m = np.sqrt(np.where(feas, sse_m, sse_ship).mean()
                            / (16 * 3)) / scale
            d = cfg["delta"]
            rows.append(
                f"0x{m:02X} ({cfg['epb']}.{d[0]}{d[1]}{d[2]}) bound "
                f"{rel_m:.4f} ({feas.mean() * 100:.0f}% feas)")
        rel_added = np.sqrt(best_added.mean() / (16 * 3)) / scale
        rows.append(
            f"adaptive+2subset-deltas bound {rel_added:.4f} "
            f"({(1 - rel_added / max(rel_ship, 1e-12)) * 100:+.1f}%)")
        print("; ".join(rows), flush=True)


if __name__ == "__main__":
    main()
