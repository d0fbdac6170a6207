"""Measured justification for excluding BC7 mode 4 from the encoder
subset (VERDICT r2 item 8).

Mode 4 (rotation, 5-bit RGB + 6-bit scalar endpoints, one 2-bit and one
3-bit index plane) targets content where one channel deserves the 3-bit
index plane. Its closest shipped competitor is mode 5 (7-bit RGB + 8-bit
alpha endpoints, two 2-bit index planes). This probe measures, on
alpha-CORRELATED content (alpha = luminance — rotation's best case) and
on decorrelated alpha:

  1. the shipped adaptive mode-1/5/6 encoder's PSNR;
  2. an UPPER BOUND for any mode-4 encoding: each plane is fit
     independently at mode 4's exact precision (5/6-bit endpoints, 2/3-bit
     weight tables, all 4 rotations, both index-swap states) with
     exhaustive index assignment — ignoring mode 4's shared-bit couplings,
     so a real mode-4 encoder can only do worse.

CPU-only; publishes the numbers the BASELINE.md exclusion cites.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp

H = W = 256


def _fit_plane(vals, ep_bits, idx_bits):
    """Per-block scalar-plane fit at given endpoint/index precision.
    vals: (N, 16) float in [0, 255]. Returns reconstructed (N, 16)."""
    n_idx = 1 << idx_bits
    # BC7 interpolation weights
    w2 = np.array([0, 21, 43, 64], np.int64)
    w3 = np.array([0, 9, 18, 27, 37, 46, 55, 64], np.int64)
    w = w2 if idx_bits == 2 else w3
    lo = vals.min(axis=1)
    hi = vals.max(axis=1)
    scale = (1 << ep_bits) - 1

    def q(e):
        # BC7 endpoint dequant: q<<(8-b) | q>>(2b-8)
        qq = np.clip(np.round(e / 255.0 * scale), 0, scale).astype(np.int64)
        return (qq << (8 - ep_bits)) | (qq >> (2 * ep_bits - 8))

    e0, e1 = q(lo), q(hi)
    pal = ((e0[:, None] * (64 - w[None, :]) + e1[:, None] * w[None, :] + 32)
           >> 6)  # (N, n_idx)
    d = np.abs(vals[:, :, None] - pal[:, None, :])
    rec = pal[np.arange(len(vals))[:, None], np.argmin(d, axis=2)]
    return rec


def main():
    from tools.bench_content import make_frame
    from hap_tpu.kernels.bc7 import bc7_decode_blocks, bc7_encode_blocks
    from hap_tpu.kernels.layout import image_to_blocks

    for label, alpha_kind in (("alpha=luma (correlated)", "luma"),
                              ("alpha decorrelated", "noise")):
        rgb = make_frame("graphics", 0, H, W).astype(np.float64)
        if alpha_kind == "luma":
            a = rgb.mean(axis=-1)
        else:
            a = make_frame("noise", 3, H, W)[..., 0].astype(np.float64)
        img = np.concatenate([rgb, a[..., None]], axis=-1).astype(np.uint8)
        blocks = np.asarray(image_to_blocks(jnp.asarray(img))).astype(np.float64)

        # shipped adaptive encoder
        wds = bc7_encode_blocks(jnp.asarray(blocks.astype(np.uint8)))
        out = np.asarray(bc7_decode_blocks(wds)).astype(np.float64)
        mse_ship = np.mean((out - blocks) ** 2)

        # mode-4 upper bound: best over rotations x index-swap
        best = None
        for rot in range(4):
            b = blocks.copy()
            if rot:  # rotation swaps alpha with channel rot-1
                b[..., [rot - 1, 3]] = b[..., [3, rot - 1]]
            for swap in (False, True):
                cb, ab = (3, 2) if swap else (2, 3)
                rec_rgb = np.stack([
                    _fit_plane(b[:, :, c], 5, cb) for c in range(3)], axis=-1)
                rec_a = _fit_plane(b[:, :, 3], 6, ab)
                rec = np.concatenate([rec_rgb, rec_a[..., None]], axis=-1)
                if rot:
                    rec[..., [rot - 1, 3]] = rec[..., [3, rot - 1]]
                mse = np.mean((rec - blocks) ** 2)
                best = mse if best is None else min(best, mse)

        p = lambda m: 10 * np.log10(255.0 ** 2 / max(m, 1e-9))
        print(f"{label}: shipped adaptive 1/5/6 = {p(mse_ship):.2f} dB; "
              f"mode-4 UPPER BOUND = {p(best):.2f} dB "
              f"({'mode 4 cannot help' if p(best) <= p(mse_ship) else 'potential +' + format(p(best)-p(mse_ship), '.2f') + ' dB'})")


if __name__ == "__main__":
    main()
