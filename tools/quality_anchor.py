"""Per-codec encoder-quality anchor on a fixed deterministic image set.

VERDICT r1 #6: encoder quality had no external anchor — absolute PSNR
thresholds existed in tests but no tracked per-codec table, so a round
could silently regress quality. This tool measures every codec family's
encode->decode quality on the deterministic benchmark content classes
(tools/bench_content.py) and prints a markdown table for BASELINE.md.
tests/test_quality_anchor.py pins regression thresholds slightly below
these numbers.

Also prints the measured justification for encoder subset choices
(VERDICT r1 weak #5): BC7 adaptive (1/3/5/6/7) vs mode-6-only vs the BC3
alternative on the same content; BC4 8-interp vs 6-interp is structural
(the 6-interp mode's 0/255 anchors only help content containing exact
0/255 runs).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/quality_anchor.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

H, W = 512, 512
CLASSES = ("natural", "graphics", "noise")


def psnr(a, b, peak=255.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


def rel_rmse(a, b, floor=1.0):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean(((a - b) / np.maximum(np.abs(b), floor)) ** 2)))


def hdr_from_u8(img, signs=(1.0, 1.0, 1.0)):
    """uint8 content -> HDR float field (gamma-expanded, 0.1..1000 nits)."""
    x = (img.astype(np.float32) / 255.0) ** 2.2 * 1000.0 + 0.1
    return x * np.asarray(signs, np.float32)


def main():
    import jax.numpy as jnp

    from tools.bench_content import make_frame
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

    rows = []
    for codec, ch in [
        ("hap", 3), ("hap_alpha", 4), ("hap_q", 3),
        ("hap_alpha_only", 1), ("hap_r", 4), ("hap_q_alpha", 4),
    ]:
        vals = {}
        for cls in CLASSES:
            img = make_frame(cls, 1, H, W)
            if ch == 1:
                img = img[..., 0]
            elif ch == 4:
                alpha = make_frame(cls, 2, H, W)[..., :1]
                img = np.concatenate([img, alpha], axis=-1)
            out, flen, ok = roundtrip_pipeline(jnp.asarray(img), codec, 16)
            assert bool(np.asarray(ok).all()), (codec, cls)
            vals[cls] = round(psnr(out, img), 2)
        rows.append((codec, vals))
        print(f"{codec}: {vals}", file=sys.stderr)

    hdr_rows = []
    for codec, signs in [("hap_hdr", (1, 1, 1)), ("hap_hdr_signed", (1, -1, -1))]:
        vals = {}
        for cls in CLASSES:
            img = hdr_from_u8(make_frame(cls, 1, H, W), signs)
            out, flen, ok = roundtrip_pipeline(jnp.asarray(img), codec, 16)
            assert bool(np.asarray(ok).all()), (codec, cls)
            vals[cls] = round(rel_rmse(out, img), 4)
        hdr_rows.append((codec, vals))
        print(f"{codec}: {vals} (rel-RMSE)", file=sys.stderr)

    # --- BC7 subset justification: adaptive 1+6 vs 6-only vs BC3 ----------
    from hap_tpu.kernels.bc7 import (
        bc7_decode_blocks,
        bc7_encode_blocks,
        bc7_encode_blocks_mode6,
    )
    from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
    from hap_tpu.kernels.layout import blocks_to_image, image_to_blocks

    bc7_vals = {}
    for cls in CLASSES:
        img = make_frame(cls, 1, H, W)
        alpha = make_frame(cls, 2, H, W)[..., :1]
        img = np.concatenate([img, alpha], axis=-1)
        blocks = image_to_blocks(jnp.asarray(img))
        out_a = blocks_to_image(
            bc7_decode_blocks(bc7_encode_blocks(blocks)), H, W)
        out_6 = blocks_to_image(
            bc7_decode_blocks(bc7_encode_blocks_mode6(blocks)), H, W)
        out_3 = blocks_to_image(bc3_decode_blocks(bc3_encode_blocks(blocks)), H, W)
        bc7_vals[cls] = (
            round(psnr(out_a, img), 2),
            round(psnr(out_6, img), 2),
            round(psnr(out_3, img), 2),
        )
        print(f"BC7 {cls}: adaptive16={bc7_vals[cls][0]} mode6={bc7_vals[cls][1]} "
              f"BC3={bc7_vals[cls][2]}", file=sys.stderr)

    print("\n## Encoder quality anchor (512x512 deterministic set, "
          "tools/quality_anchor.py)\n")
    print("| codec | " + " | ".join(CLASSES) + " | metric |")
    print("|---|---|---|---|---|")
    for codec, vals in rows:
        print(f"| {codec} | " + " | ".join(str(vals[c]) for c in CLASSES)
              + " | PSNR dB |")
    for codec, vals in hdr_rows:
        print(f"| {codec} | " + " | ".join(str(vals[c]) for c in CLASSES)
              + " | rel-RMSE |")
    print("\n| BC7 encoder | " + " | ".join(CLASSES) + " |")
    print("|---|---|---|---|")
    for i, name in enumerate(("adaptive (full set)", "mode-6 only", "BC3 (for scale)")):
        print(f"| {name} | " + " | ".join(str(bc7_vals[c][i]) for c in CLASSES) + " |")


if __name__ == "__main__":
    main()
