"""Adjudicate BC7 modes 0/2/3 (the last encoder modes without a measured
include/exclude decision; hap.h:45-47, HapVideoDRAFT.md:61-72).

Same discipline as tools/eval_bc7_mode4.py / eval_bc7m7_bc6hdelta.py:
compute an IDEALIZED upper bound for each mode — per-channel independent
endpoint fits at the mode's effective precision over every partition,
ignoring shared-bit couplings (so no real encoder can beat it) — and
implement only if the bound beats the shipped adaptive set somewhere.

Mode facts (all RGB-only; alpha decodes 255, so like mode 1 they are
candidates only for opaque blocks):
  mode 0: 3 subsets, 16 partitions, 4-bit + per-endpoint P-bit (~5 eff),
          3-bit indices
  mode 2: 3 subsets, 64 partitions, 5-bit endpoints, 2-bit indices
  mode 3: 2 subsets, 64 partitions, 7-bit + per-endpoint P-bit (~8 eff),
          2-bit indices

CPU-only; run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.

OUTCOME (round 4): modes 0/2 EXCLUDED (<= +0.15 dB everywhere — three
subsets cost endpoint precision the partition freedom never repays);
mode 3 IMPLEMENTED (bc7.bc7_encode_blocks_mode3) — opaque-content
shipped adaptive 48.11 -> 48.85 dB natural, 55.16 -> 57.87 graphics.
Caveat on reading the residual "adds" column after inclusion: the bound
fixes endpoints at quantized min/max, which LS-refined endpoints BEAT
per partition (measured: the real mode-3 encoder outscores the 64-
partition bound on graphics, 57.5 vs 55.4 dB alone) — so the per-block
min(shipped, bound) column overstates remaining headroom; partition-
mismatch blocks cost ~2 SSE/block (measured), not worth a top-K search.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 256, 256

W2 = np.array([0, 21, 43, 64], np.int64)
W3 = np.array([0, 9, 18, 27, 37, 46, 55, 64], np.int64)


def _fit_plane_masked(vals, mask, ep_bits, weights):
    """Best reconstruction of vals (N, 16) on masked texels with b-bit
    endpoints at min/max + exhaustive nearest-index assignment (idealized:
    each channel fit independently — unattainable jointly, hence a bound)."""
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


def _quant(e, ep_bits):
    scale = (1 << ep_bits) - 1
    qq = np.clip(np.round(e / 255.0 * scale), 0, scale).astype(np.int64)
    return (qq << (8 - ep_bits)) | (qq >> (2 * ep_bits - 8))


def subset_bound(blocks_rgb, partitions, nsub, ep_bits, weights):
    """(N, 16, 3) float -> (N,) best RGB SSE over the partition set.

    SHARED-INDEX bound: endpoints are the idealized per-channel min/max
    (quantized at the mode's precision) but each texel gets ONE palette
    index applied to all three channels — the constraint every BC7
    subset mode actually has. Looser than a real encoder only in the
    endpoint choice and free partition search, so still an upper bound;
    tight enough to adjudicate inclusion (a per-channel-independent
    index bound is 3x the real index rate and wildly unattainable)."""
    n = blocks_rgb.shape[0]
    best = np.full(n, np.inf)
    nw = weights.shape[0]
    for part in range(partitions.shape[0]):
        subset = np.asarray(partitions[part])  # (16,)
        rec = np.zeros_like(blocks_rgb)
        for s in range(nsub):
            mask = subset == s  # (16,)
            if not mask.any():
                continue
            sub = blocks_rgb[:, mask, :]  # (n, k, 3)
            lo = _quant(sub.min(axis=1), ep_bits)  # (n, 3)
            hi = _quant(sub.max(axis=1), ep_bits)
            pal = ((lo[:, None, :] * (64 - weights[None, :, None])
                    + hi[:, None, :] * weights[None, :, None] + 32)
                   >> 6)  # (n, nw, 3)
            d = ((sub[:, :, None, :] - pal[:, None, :, :]) ** 2
                 ).sum(axis=3)  # (n, k, nw)
            idx = np.argmin(d, axis=2)  # (n, k)
            rsub = np.take_along_axis(
                pal, idx[:, :, None].repeat(3, axis=2), axis=1)
            rec[:, mask, :] = rsub
        sse = ((rec - blocks_rgb) ** 2).sum(axis=(1, 2))
        best = np.minimum(best, sse)
    return best


def main():
    import jax.numpy as jnp

    from hap_tpu.kernels.bc7 import bc7_decode_blocks, bc7_encode_blocks
    from hap_tpu.kernels.bc7_tables import PARTITIONS2, PARTITIONS3
    from hap_tpu.kernels.layout import image_to_blocks
    from tools.bench_content import make_frame

    p = lambda m: 10 * np.log10(255.0 ** 2 / max(m, 1e-9))

    for cls in ("natural", "graphics", "noise"):
        rgb = make_frame(cls, 0, H, W)
        img = np.concatenate(
            [rgb, np.full((H, W, 1), 255, np.uint8)], axis=-1)
        blocks = np.asarray(
            image_to_blocks(jnp.asarray(img))).astype(np.float64)
        rgbb = blocks[:, :, :3]

        wds = bc7_encode_blocks(jnp.asarray(blocks.astype(np.uint8)))
        out = np.asarray(bc7_decode_blocks(wds)).astype(np.float64)
        sse_ship = ((out - blocks) ** 2).sum(axis=(1, 2))
        mse_ship = sse_ship.mean() / (16 * 4)

        rows = [f"BC7 {cls:9s}: shipped adaptive {p(mse_ship):.2f} dB"]
        for name, parts, nsub, epb, wts in (
                ("mode0", PARTITIONS3[:16], 3, 5, W3),
                ("mode2", PARTITIONS3, 3, 5, W2),
                ("mode3", PARTITIONS2, 2, 8, W2)):
            sse_b = subset_bound(rgbb, np.asarray(parts), nsub, epb, wts)
            mse_add = np.minimum(sse_ship, sse_b).mean() / (16 * 4)
            rows.append(f"{name} bound adds {p(mse_add)-p(mse_ship):+.2f} dB"
                        f" (alone {p(sse_b.mean()/(16*4)):.2f})")
        print("; ".join(rows), flush=True)


if __name__ == "__main__":
    main()
