"""Gap-to-optimal for the workhorse encoders (VERDICT r4 item 6).

The shipped BC1/BC4 encoders are fast heuristics (PCA seed + projection
index select + LS refine). This tool computes slow UPPER-BOUND encoders on
the quality-anchor content and reports shipped-vs-bound PSNR:

* BC1 bound: cluster fit — texels sorted along the principal axis, all
  C(16+3,3) = 969 ordered 4-cluster partitions, closed-form LS endpoints
  per partition, exact-decode 565 palette, exact nearest-entry SSE, min
  over partitions. This is the Squish-style near-optimal search (the
  format's ecosystem quality reference, HapVideoDRAFT.md:24).
* BC4 bound: EXHAUSTIVE over all (a0 > a1) endpoint pairs with exact
  8-interp decode and nearest-entry SSE — the true format optimum —
  on a block subsample (it is O(32640 * blocks)).

CPU-only; run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _expand565_np(c):
    r5 = (c >> 11) & 0x1F
    g6 = (c >> 5) & 0x3F
    b5 = c & 0x1F
    return np.stack([(r5 << 3) | (r5 >> 2), (g6 << 2) | (g6 >> 4),
                     (b5 << 3) | (b5 >> 2)], axis=-1).astype(np.int64)


def _quant565_np(rgb):
    rgb = np.clip(rgb, 0.0, 255.0)
    r = np.round(rgb[..., 0] * (31.0 / 255.0)).astype(np.int64)
    g = np.round(rgb[..., 1] * (63.0 / 255.0)).astype(np.int64)
    b = np.round(rgb[..., 2] * (31.0 / 255.0)).astype(np.int64)
    return (r << 11) | (g << 5) | b


def _palette_np(q0, q1):
    """(..., ) int 565 pairs -> (..., 4, 3) exact 4-color palette."""
    e0 = _expand565_np(q0)[..., None, :]  # (..., 1, 3)
    e1 = _expand565_np(q1)[..., None, :]
    p2 = (2 * e0 + e1 + 1) // 3
    p3 = (e0 + 2 * e1 + 1) // 3
    return np.concatenate([e0, e1, p2, p3], axis=-2)


def _sse_nearest(px, pal):
    """px (N, 16, 3); pal (N, 4, 3) -> (N,) exact nearest-entry SSE."""
    d = px[:, :, None, :].astype(np.float64) - pal[:, None, :, :]
    return np.min(np.sum(d * d, axis=-1), axis=-1).sum(axis=1)


def bc1_cluster_fit_bound(px, batch=4096):
    """px (N, 16, 3) uint8 -> (N,) SSE of the cluster-fit upper bound."""
    n = px.shape[0]
    out = np.empty(n)
    # all ordered split points 0 <= i <= j <= k <= 16
    splits = [(i, j, k) for i in range(17) for j in range(i, 17)
              for k in range(j, 17)]
    w_of_split = np.empty((len(splits), 16))
    for s, (i, j, k) in enumerate(splits):
        w = np.empty(16)
        w[:i] = 0.0
        w[i:j] = 1.0 / 3.0
        w[j:k] = 2.0 / 3.0
        w[k:] = 1.0
        w_of_split[s] = w
    sw = w_of_split.sum(1)                        # (S,)
    sww = (w_of_split ** 2).sum(1)
    alpha = 16.0 - 2.0 * sw + sww
    beta = sw - sww
    gamma = sww
    det = alpha * gamma - beta * beta
    for lo in range(0, n, batch):
        p = px[lo:lo + batch].astype(np.float64)   # (B, 16, 3)
        b = p.shape[0]
        # principal axis (power iteration)
        mean = p.mean(1, keepdims=True)
        d = p - mean
        cov = np.einsum("bti,btj->bij", d, d)
        v = np.abs(cov).sum(-1) + 1e-4
        for _ in range(8):
            v = np.einsum("bij,bj->bi", cov, v)
            v /= np.linalg.norm(v, axis=-1, keepdims=True) + 1e-24
        t = np.einsum("bti,bi->bt", d, v)          # (B, 16)
        order = np.argsort(t, axis=1)
        ps = np.take_along_axis(p, order[:, :, None], axis=1)  # sorted texels
        best = np.full(b, np.inf)
        # evaluate all partitions in chunks (memory)
        for s0 in range(0, len(splits), 64):
            w = w_of_split[s0:s0 + 64]             # (s, 16)
            s = w.shape[0]
            r1 = np.einsum("st,btc->bsc", w, ps)   # (B, s, 3)
            r0 = ps.sum(1)[:, None, :] - r1
            a_ = alpha[s0:s0 + 64][None, :, None]
            b_ = beta[s0:s0 + 64][None, :, None]
            g_ = gamma[s0:s0 + 64][None, :, None]
            dt = det[s0:s0 + 64][None, :, None]
            ok = np.abs(dt) > 1e-6
            inv = np.where(ok, 1.0 / np.where(ok, dt, 1.0), 0.0)
            e0 = (g_ * r0 - b_ * r1) * inv
            e1 = (a_ * r1 - b_ * r0) * inv
            # degenerate systems: endpoints at the mean
            e0 = np.where(ok, e0, mean)
            e1 = np.where(ok, e1, mean)
            q0 = _quant565_np(e0)                  # (B, s)
            q1 = _quant565_np(e1)
            pal = _palette_np(q0, q1)              # (B, s, 4, 3)
            dd = (ps[:, None, :, None, :].astype(np.float64)
                  - pal[:, :, None, :, :])
            sse = np.min((dd * dd).sum(-1), axis=-1).sum(-1)  # (B, s)
            best = np.minimum(best, sse.min(1))
        out[lo:lo + batch] = best
    return out


def bc4_exhaustive_bound(vals, batch=64):
    """vals (N, 16) uint8 -> (N,) SSE of the true 8-interp optimum."""
    a0, a1 = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    keep = a0 > a1
    a0 = a0[keep].astype(np.int64)  # (P,)
    a1 = a1[keep].astype(np.int64)
    ks = np.arange(8)
    pal = np.where(
        ks[None, :] == 0, a0[:, None],
        np.where(ks[None, :] == 1, a1[:, None],
                 ((8 - ks[None, :]) * a0[:, None]
                  + (ks[None, :] - 1) * a1[:, None] + 3) // 7))  # (P, 8)
    # also the degenerate equal-endpoint ladders a0 == a1
    eq = np.arange(256)
    pal_eq = np.repeat(eq[:, None], 8, axis=1)
    pal = np.concatenate([pal, pal_eq])            # (P', 8)
    n = vals.shape[0]
    out = np.empty(n)
    for lo in range(0, n, batch):
        v = vals[lo:lo + batch].astype(np.int64)   # (B, 16)
        d = v[:, :, None, None] - pal[None, None, :, :]
        sse = np.min(d * d, axis=-1).sum(1)        # (B, P')
        out[lo:lo + batch] = sse.min(1)
    return out


def psnr_from_sse(sse_total, count):
    mse = sse_total / count
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def main():
    import jax.numpy as jnp

    from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
    from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks
    from hap_tpu.kernels.layout import image_to_blocks
    from tools.bench_content import make_frame

    H = W = 256
    rng = np.random.default_rng(0)
    for cls in ("natural", "graphics", "noise"):
        img = make_frame(cls, 0, H, W)
        blocks = np.asarray(image_to_blocks(jnp.asarray(img[..., :3])))
        n = blocks.shape[0]

        # ---- BC1 ----
        from hap_tpu.kernels.bc1 import bc1_encode_planes_words

        w = bc1_encode_blocks(jnp.asarray(blocks))
        dec, _ = bc1_decode_blocks(w)
        sse_ship = float(((np.asarray(dec).astype(np.float64)
                           - blocks.astype(np.float64)) ** 2).sum())
        planes = jnp.asarray(blocks.transpose(2, 1, 0))
        wb0, wb1 = bc1_encode_planes_words(planes, refine_iters=2,
                                           candidates=True)
        wb = np.stack([np.asarray(wb0), np.asarray(wb1)], 1)
        decb, _ = bc1_decode_blocks(jnp.asarray(wb))
        sse_best = float(((np.asarray(decb).astype(np.float64)
                           - blocks.astype(np.float64)) ** 2).sum())
        sse_bound = float(bc1_cluster_fit_bound(blocks).sum())
        cnt = n * 16 * 3
        print(f"BC1 {cls:9s}: shipped {psnr_from_sse(sse_ship, cnt):6.2f} dB"
              f"  effort=best {psnr_from_sse(sse_best, cnt):6.2f} dB"
              f"  cluster-fit bound {psnr_from_sse(sse_bound, cnt):6.2f} dB"
              f"  best-gap {psnr_from_sse(sse_bound, cnt) - psnr_from_sse(sse_best, cnt):+5.2f} dB",
              flush=True)

        # ---- BC4 (on the luma-ish first channel; subsample for the
        # exhaustive search) ----
        from hap_tpu.kernels.bc4 import bc4_encode_planes_words

        vals = blocks[:, :, 0]
        sub = rng.choice(n, size=min(512, n), replace=False)
        w4 = bc4_encode_blocks(jnp.asarray(vals[sub]))
        d4 = np.asarray(bc4_decode_blocks(w4)).astype(np.float64)
        sse_ship4 = float(((d4 - vals[sub].astype(np.float64)) ** 2).sum())
        w40, w41 = bc4_encode_planes_words(jnp.asarray(vals[sub].T),
                                           candidates=True)
        w4b = np.stack([np.asarray(w40), np.asarray(w41)], 1)
        d4b = np.asarray(bc4_decode_blocks(jnp.asarray(w4b))).astype(np.float64)
        sse_best4 = float(((d4b - vals[sub].astype(np.float64)) ** 2).sum())
        sse_opt4 = float(bc4_exhaustive_bound(vals[sub]).sum())
        cnt4 = len(sub) * 16
        print(f"BC4 {cls:9s}: shipped {psnr_from_sse(sse_ship4, cnt4):6.2f} dB"
              f"  effort=best {psnr_from_sse(sse_best4, cnt4):6.2f} dB"
              f"  exhaustive optimum {psnr_from_sse(sse_opt4, cnt4):6.2f} dB"
              f"  best-gap {psnr_from_sse(sse_opt4, cnt4) - psnr_from_sse(sse_best4, cnt4):+5.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
