"""Encoder-quality regression anchors (VERDICT r1 #6).

Every codec family's encode->decode quality on the deterministic benchmark
content classes (tools/bench_content.py, stable-hashed seeds) must stay at
or above the pinned floors — measured values minus ~1.5 dB margin (LDR
PSNR) or plus ~30% margin (HDR rel-RMSE). The authoritative measured table
lives in BASELINE.md (regenerate with tools/quality_anchor.py at 512x512;
these tests run the same content at 256x256 for speed — floors below are
pinned against the 256x256 measurement).

A change that trips one of these floors is a real quality regression, not
noise: the content is deterministic and the codecs are pure functions.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_content import make_frame  # noqa: E402
from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline  # noqa: E402
from hap_tpu.utils.quality import psnr, relative_rmse  # noqa: E402

H = W = 256

# codec -> (channels, {class: PSNR floor dB});  measured 2026-08 (see
# BASELINE.md): hap 43.2/43.3/15.9, hap_alpha 44.4/44.5/17.1,
# hap_q 46.7/48.3/18.4, hap_alpha_only 60.8/69.3/32.6,
# hap_r 47.8/52.9/17.0, hap_q_alpha 47.9/49.5/19.7
LDR_FLOORS = {
    "hap": (3, {"natural": 41.7, "graphics": 41.7, "noise": 14.4}),
    "hap_alpha": (4, {"natural": 42.9, "graphics": 43.0, "noise": 15.6}),
    "hap_q": (3, {"natural": 45.1, "graphics": 46.8, "noise": 16.9}),
    "hap_alpha_only": (1, {"natural": 59.2, "graphics": 67.7, "noise": 31.1}),
    "hap_r": (4, {"natural": 46.2, "graphics": 51.4, "noise": 15.5}),
    "hap_q_alpha": (4, {"natural": 46.4, "graphics": 48.0, "noise": 18.1}),
}

# codec -> (signs, {class: rel-RMSE ceiling}); measured: hap_hdr
# .0176/.0171/10.5, signed .019/.0188/11.0. "noise" HDR content is
# per-texel random across ~4 octaves — relative error there is dominated
# by near-zero texels in blocks that also hold 1000-nit texels, a property
# of BC6H's log-domain interpolation, not of the encoder; the ceiling just
# pins it from drifting further.
HDR_CEILINGS = {
    "hap_hdr": ((1, 1, 1), {"natural": 0.024, "graphics": 0.023, "noise": 14.0}),
    "hap_hdr_signed": ((1, -1, -1), {"natural": 0.026, "graphics": 0.025, "noise": 14.5}),
}


def _hdr_from_u8(img, signs):
    x = (img.astype(np.float32) / 255.0) ** 2.2 * 1000.0 + 0.1
    return x * np.asarray(signs, np.float32)


@pytest.mark.parametrize("codec", sorted(LDR_FLOORS))
def test_ldr_quality_floor(codec):
    ch, floors = LDR_FLOORS[codec]
    for cls, floor in floors.items():
        img = make_frame(cls, 1, H, W)
        if ch == 1:
            img = img[..., 0]
        elif ch == 4:
            alpha = make_frame(cls, 2, H, W)[..., :1]
            img = np.concatenate([img, alpha], axis=-1)
        out, flen, ok = roundtrip_pipeline(jnp.asarray(img), codec, 16)
        assert bool(np.asarray(ok).all()), (codec, cls)
        got = psnr(np.asarray(out), img)
        assert got >= floor, f"{codec}/{cls}: PSNR {got:.2f} < floor {floor}"


@pytest.mark.parametrize("codec", sorted(HDR_CEILINGS))
def test_hdr_quality_ceiling(codec):
    signs, ceilings = HDR_CEILINGS[codec]
    for cls, ceil in ceilings.items():
        img = _hdr_from_u8(make_frame(cls, 1, H, W), signs)
        out, flen, ok = roundtrip_pipeline(jnp.asarray(img), codec, 16)
        assert bool(np.asarray(ok).all()), (codec, cls)
        got = relative_rmse(np.asarray(out), img, floor=1.0)
        assert got <= ceil, f"{codec}/{cls}: rel-RMSE {got:.4f} > ceiling {ceil}"


def test_bc7_adaptive_beats_mode6_and_bc3_on_decorrelated_alpha():
    """The measured justification for the BC7 mode subset (VERDICT r1 weak
    #5): with a decorrelated alpha plane, mode 5's separate alpha indices
    must carry the adaptive encoder past both mode-6-only and BC3."""
    from hap_tpu.kernels.bc7 import (
        bc7_decode_blocks,
        bc7_encode_blocks,
        bc7_encode_blocks_mode6,
    )
    from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
    from hap_tpu.kernels.layout import image_to_blocks

    img = make_frame("graphics", 1, H, W)
    alpha = make_frame("graphics", 2, H, W)[..., :1]
    px = np.concatenate([img, alpha], axis=-1)
    blocks = image_to_blocks(jnp.asarray(px))

    def q(dec_blocks):
        return psnr(np.asarray(dec_blocks), np.asarray(blocks))

    adaptive = q(bc7_decode_blocks(bc7_encode_blocks(blocks)))
    mode6 = q(bc7_decode_blocks(bc7_encode_blocks_mode6(blocks)))
    bc3 = q(bc3_decode_blocks(bc3_encode_blocks(blocks)))
    assert adaptive > mode6 + 3.0, (adaptive, mode6)
    assert adaptive > bc3 + 3.0, (adaptive, bc3)
