"""Fully on-device pixel <-> Hap-frame pipelines (the flagship serving path).

One jit-compiled computation takes (H, W, C) uint8 pixels in HBM to complete
Hap frame bytes in HBM (and back) with zero host round-trips: layout ->
(YCoCg) -> BCn encode -> chunked structured Snappy -> container assembly.
This is the path bench.py measures; the host/native path (pipeline/codecs.py)
serves interop with foreign frames.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from hap_tpu.constants import (
    CONSTANT_TO_FORMAT_ID,
    SECTION_MULTIPLE_IMAGES,
    TextureFormat,
    bytes_per_block,
)
from hap_tpu.container.plan import dxt_payload_bytes, legalize_chunk_count
from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks
from hap_tpu.kernels.layout import (
    blocks_to_image,
    image_to_blocks,
    words_to_payload,
)
from hap_tpu.kernels.ycocg import cocgsy_to_rgb, rgb_to_cocgsy
from hap_tpu.pipeline.device_frame import (
    decode_frame_device,
    encode_frame_device,
    frame_layout,
)

_CODEC_TEXTURES = {
    "hap": (TextureFormat.RGB_DXT1,),
    "hap_alpha": (TextureFormat.RGBA_DXT5,),
    "hap_q": (TextureFormat.YCoCg_DXT5,),
    "hap_alpha_only": (TextureFormat.A_RGTC1,),
    "hap_r": (TextureFormat.RGBA_BPTC_UNORM,),
    "hap_hdr": (TextureFormat.RGB_BPTC_UNSIGNED_FLOAT,),
    "hap_hdr_signed": (TextureFormat.RGB_BPTC_SIGNED_FLOAT,),
    "hap_q_alpha": (TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1),
}


def _refine(effort: str) -> int:
    """BC1 (index-select, least-squares-refit) rounds per effort level.

    "high" (default) runs 2 rounds; "fast" runs 1 — measured 0.03 dB PSNR
    apart on 4K bench content for ~5% end-to-end throughput. "best" adds
    exact-SSE-adjudicated endpoint-shrink candidates in the BC1/BC4
    encoders (+1.2 dB BC4-natural, ~2 ms/frame at 4K — offline-encode
    territory; tools/eval_bcn_optimal.py has the gap-to-optimal table)."""
    return {"best": 2, "high": 2, "fast": 1}[effort]


def _cands(effort: str) -> bool:
    return effort == "best"


# Tall frames encode as row-slabs under lax.map: one giant fused encode
# graph measures 33% worse per pixel at 16K than the same work bounded to
# ~1080-row slabs (tools/probe_16k_slab.py: 103 -> 86 ms; decode showed
# the OPPOSITE sign, +10 ms slabbed, so only encode slabs). Threshold is
# module-level so tests can force slabbing at small sizes. Caveat: the
# slab and direct graphs compile differently, so f32 near-ties in the
# PCA/LS endpoint fits may quantize differently — payload words are
# deterministic per (shape, threshold) but not bit-identical across the
# threshold; quality is tied (test_slabbed_encode_quality_parity).
_SLAB_MIN_H = 8192
_SLAB_TARGET_ROWS = 1080


def _slab_count(h: int) -> int:
    """Slab count for an (h, W) encode: ~_SLAB_TARGET_ROWS rows per slab,
    h evenly divisible, slab height a multiple of 4 (block rows). Returns
    1 (the direct path — one fused graph) when h is below threshold or has
    no even split with a slab height in [target/2, h); ties on distance
    keep the earlier (taller) slab. Candidates below target/2 are never
    accepted: a prime-multiple height like 8252 = 4*2063 would otherwise
    "win" with 4-row slabs (2063 lax.map steps — far worse than direct)."""
    if h < _SLAB_MIN_H:
        return 1
    best = 1
    for n in range(2, h // 4 + 1):
        if h % n:
            continue
        hs = h // n
        if hs % 4:
            continue
        if hs < _SLAB_TARGET_ROWS // 2:
            break  # hs decreases with n: no acceptable candidates remain
        if abs(hs - _SLAB_TARGET_ROWS) < abs(h // best - _SLAB_TARGET_ROWS):
            best = n
    return best


def _encode_blocks(codec: str, img: jnp.ndarray, effort: str = "high") -> jnp.ndarray:
    nslab = _slab_count(img.shape[0])
    if nslab > 1:
        hs = img.shape[0] // nslab
        slabs = img.reshape((nslab, hs) + img.shape[1:])
        words = jax.lax.map(
            lambda s: _encode_blocks_direct(codec, s, effort), slabs)
        # slabs are contiguous block-row ranges, so concatenation restores
        # the full frame's row-major payload word order exactly
        return words.reshape((-1,) + words.shape[2:])
    return _encode_blocks_direct(codec, img, effort)


def _encode_blocks_direct(codec: str, img: jnp.ndarray, effort: str = "high") -> jnp.ndarray:
    # hap/hap_alpha/hap_q/hap_alpha_only run the LANE-MAJOR planar chain:
    # one channel transpose at entry (image_to_block_planes), then every
    # texel op tiles (8, 128) vregs with zero padding (the (N, 16, C)
    # forms waste up to ~42x the lanes; measured ~2x on 4K hap_q encode).
    # These families return FLAT (N*wpb,) uint32 payload words: the word
    # interleave rides the MXU as exact one-hot matmuls
    # (layout.interleave_words_mxu, 2.7x the stack/concat relayout);
    # BC7/BC6H return (N, wpb) — both flatten to the same payload stream.
    from hap_tpu.kernels.bc1 import bc1_encode_planes_words
    from hap_tpu.kernels.bc4 import bc4_encode_planes_words
    from hap_tpu.kernels.layout import image_to_block_planes, interleave_words_mxu

    if codec == "hap":
        return interleave_words_mxu(bc1_encode_planes_words(
            image_to_block_planes(img[..., :3]), refine_iters=_refine(effort),
            candidates=_cands(effort),
        ))
    if codec == "hap_alpha":
        planes = image_to_block_planes(img)
        a0, a1 = bc4_encode_planes_words(planes[3],
                                         candidates=_cands(effort))
        c0, c1 = bc1_encode_planes_words(planes[:3],
                                         refine_iters=_refine(effort),
                                         candidates=_cands(effort))
        return interleave_words_mxu((a0, a1, c0, c1))
    if codec == "hap_q":
        from hap_tpu.kernels.ycocg import rgb_to_cocgs_y_planes

        cocgs_p, y_p = rgb_to_cocgs_y_planes(
            image_to_block_planes(img[..., :3]))
        y0, y1 = bc4_encode_planes_words(y_p, candidates=_cands(effort))
        c0, c1 = bc1_encode_planes_words(cocgs_p,
                                         refine_iters=_refine(effort),
                                         candidates=_cands(effort))
        return interleave_words_mxu((y0, y1, c0, c1))
    if codec == "hap_alpha_only":
        chan = img if img.ndim == 2 else img[..., -1]
        return interleave_words_mxu(
            bc4_encode_planes_words(image_to_block_planes(chan)[0],
                                    candidates=_cands(effort)))
    if codec == "hap_r":
        from hap_tpu.kernels.bc7 import bc7_encode_blocks

        return bc7_encode_blocks(image_to_blocks(img))
    if codec == "hap_hdr":
        from hap_tpu.kernels.bc6h import bc6h_encode_blocks_adaptive, f32_to_half_bits

        blocks = image_to_blocks(img.astype(jnp.float32))
        return bc6h_encode_blocks_adaptive(f32_to_half_bits(blocks), signed=False)
    if codec == "hap_hdr_signed":
        from hap_tpu.kernels.bc6h import (
            bc6h_encode_blocks_adaptive,
            f32_to_half_bits,
        )

        blocks = image_to_blocks(img.astype(jnp.float32))
        return bc6h_encode_blocks_adaptive(f32_to_half_bits(blocks), signed=True)
    raise ValueError(codec)


def _decode_blocks(codec: str, words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    # The BC1/BC4 families run the LANE-MAJOR planar decode chain (decode
    # twin of the planar encode path): every texel op tiles (8, 128) vregs
    # with zero padding. The word de-interleave rides the MXU as exact
    # one-hot matmuls (layout.deinterleave_words_mxu — 3.7x the stride-wpb
    # column slices it replaces); the only remaining relayout is the
    # u32-compose image rebuild at exit.
    from hap_tpu.kernels.bc1 import bc1_decode_planes
    from hap_tpu.kernels.bc4 import bc4_decode_planes
    from hap_tpu.kernels.layout import (
        block_planes_to_image,
        deinterleave_words_mxu,
    )

    if codec == "hap":
        w0, w1 = deinterleave_words_mxu(words.reshape(-1), 2)
        rgb, _ = bc1_decode_planes(w0, w1)
        return block_planes_to_image(rgb.astype(jnp.uint8), h, w)
    if codec == "hap_alpha":
        a0, a1, c0, c1 = deinterleave_words_mxu(words.reshape(-1), 4)
        a = bc4_decode_planes(a0, a1)
        rgb, _ = bc1_decode_planes(c0, c1, dxt1_punchthrough=False)
        planes = jnp.concatenate([rgb, a[None]]).astype(jnp.uint8)
        return block_planes_to_image(planes, h, w)
    if codec == "hap_q":
        from hap_tpu.kernels.ycocg import cocgs_y_to_rgb_planes

        y0, y1, c0, c1 = deinterleave_words_mxu(words.reshape(-1), 4)
        cocgs, _ = bc1_decode_planes(c0, c1, dxt1_punchthrough=False)
        y = bc4_decode_planes(y0, y1)
        return block_planes_to_image(cocgs_y_to_rgb_planes(cocgs, y), h, w)
    if codec == "hap_alpha_only":
        w0, w1 = deinterleave_words_mxu(words.reshape(-1), 2)
        a = bc4_decode_planes(w0, w1)
        return block_planes_to_image(a[None].astype(jnp.uint8), h, w)
    if codec == "hap_r":
        from hap_tpu.kernels.bc7 import bc7_decode_blocks

        return blocks_to_image(bc7_decode_blocks(words), h, w)
    if codec == "hap_hdr":
        from hap_tpu.kernels.bc6h import bc6h_decode_blocks, half_bits_to_f32

        return blocks_to_image(half_bits_to_f32(bc6h_decode_blocks(words)), h, w)
    if codec == "hap_hdr_signed":
        from hap_tpu.kernels.bc6h import bc6h_decode_blocks, half_bits_to_f32

        return blocks_to_image(
            half_bits_to_f32(bc6h_decode_blocks(words, signed=True)), h, w
        )
    raise ValueError(codec)


def plan_chunks(height: int, width: int, fmt: TextureFormat, chunk_count: int) -> int:
    nbytes = dxt_payload_bytes(width, height, fmt)
    return legalize_chunk_count(nbytes, fmt, chunk_count)


def _encode_texture_device(img, codec, fmt, chunk_count, effort="high"):
    h, w = img.shape[0], img.shape[1]
    g = bytes_per_block(fmt)
    cc = plan_chunks(h, w, fmt, chunk_count)
    words = _encode_blocks(codec, img, effort)
    payload = words_to_payload(words)
    return encode_frame_device(
        payload, cc, CONSTANT_TO_FORMAT_ID[fmt], g, row_bytes=g * w // 4)


def _encode_texture_device_stats(img, codec, fmt, chunk_count, effort="high"):
    from hap_tpu.pipeline.device_frame import encode_frame_device_stats

    h, w = img.shape[0], img.shape[1]
    g = bytes_per_block(fmt)
    cc = plan_chunks(h, w, fmt, chunk_count)
    words = _encode_blocks(codec, img, effort)
    payload = words_to_payload(words)
    frame, flen, stats = encode_frame_device_stats(
        payload, cc, CONSTANT_TO_FORMAT_ID[fmt], g, row_bytes=g * w // 4
    )
    # Extend to the per-texture stats row: [input_bytes, chunk_count,
    # snappy_chunks, payload_bytes_emitted, whole_frame_raw, frame_len].
    row = jnp.concatenate(
        [
            jnp.asarray([payload.shape[0], cc], jnp.int32),
            stats,
            flen[None].astype(jnp.int32),
        ]
    )
    return frame, flen, row


@partial(jax.jit, static_argnames=("codec", "chunk_count", "effort"))
def encode_pipeline_stats(
    img: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64,
    effort: str = "high",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """encode_pipeline + per-texture observability stats.

    Returns (frame, frame_len, stats) with stats (T, 6) int32 — one row per
    texture section: [dxt_payload_bytes, chunk_count, snappy_chunks,
    payload_bytes_emitted, whole_frame_raw, section_frame_len]. The
    compression ratio and per-chunk raw-fallback count derive from these
    (the reference exposes none of this; the decisions are hap.c:460-466,
    478-482)."""
    fmts = _CODEC_TEXTURES[codec]
    if len(fmts) == 1:
        frame, flen, row = _encode_texture_device_stats(
            img, codec, fmts[0], chunk_count, effort
        )
        return frame, flen, row[None, :]

    h, w = img.shape[0], img.shape[1]
    f1, l1, row1 = _encode_texture_device_stats(
        img, "hap_q", fmts[0], chunk_count, effort
    )
    f2, l2, row2 = _encode_texture_device_stats(
        img[..., 3], "hap_alpha_only", fmts[1], chunk_count, effort
    )
    frame, flen = _wrap_multi_image(h, w, fmts, chunk_count, f1, l1, f2, l2)
    return frame, flen, jnp.stack([row1, row2])


@partial(jax.jit, static_argnames=("codec", "chunk_count", "effort"))
def encode_pipeline(
    img: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64,
    effort: str = "high",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W, C) uint8 -> ((fmax,) uint8 frame buffer, frame_len scalar).

    chunk_count is legalized against the payload size exactly as the
    reference does (hap.c:421). For the multi-image hap_q_alpha codec the
    two texture sections are assembled under a 0x0D wrapper on device
    (mirroring HapEncode's two-texture path, hap.c:560-603).
    """
    h, w = img.shape[0], img.shape[1]
    fmts = _CODEC_TEXTURES[codec]
    if len(fmts) == 1:
        return _encode_texture_device(img, codec, fmts[0], chunk_count, effort)

    # hap_q_alpha: YCoCg BC3 color section + RGTC1 alpha section.
    f1, l1 = _encode_texture_device(img, "hap_q", fmts[0], chunk_count, effort)
    f2, l2 = _encode_texture_device(
        img[..., 3], "hap_alpha_only", fmts[1], chunk_count, effort
    )
    return _wrap_multi_image(h, w, fmts, chunk_count, f1, l1, f2, l2)


def _wrap_multi_image(h, w, fmts, chunk_count, f1, l1, f2, l2):
    """Assemble two texture sections under the 0x0D multi-image wrapper
    (mirrors HapEncode's two-texture path, hap.c:560-603)."""
    from hap_tpu.constants import SECTION_MULTIPLE_IMAGES, UINT24_MAX
    from hap_tpu.container.plan import decode_instructions_length
    from hap_tpu.pipeline.device_frame import _header4, _header8

    # Wrapper header length from the worst case (hap.c:562-576) — static.
    worst = 0
    for fmt in fmts:
        nbytes = dxt_payload_bytes(w, h, fmt)
        cc = plan_chunks(h, w, fmt, chunk_count)
        worst += nbytes + decode_instructions_length(cc) + 4
    top_hdr = 8 if worst > UINT24_MAX else 4

    body_len = l1 + l2
    out = jnp.zeros(top_hdr + f1.shape[0] + f2.shape[0], jnp.uint8)
    hdr = (
        _header8(body_len, SECTION_MULTIPLE_IMAGES)
        if top_hdr == 8
        else _header4(body_len, SECTION_MULTIPLE_IMAGES)
    )
    out = jax.lax.dynamic_update_slice(out, hdr, (0,))
    out = jax.lax.dynamic_update_slice(out, f1, (jnp.int32(top_hdr),))
    out = jax.lax.dynamic_update_slice(out, f2, (top_hdr + l1,))
    return out, (top_hdr + body_len).astype(jnp.int32)


def _decode_texture_pipeline(
    frame, height, width, codec, fmt, chunk_count, with_reasons=False
):
    g = bytes_per_block(fmt)
    nbytes = dxt_payload_bytes(width, height, fmt)
    cc = plan_chunks(height, width, fmt, chunk_count)
    res = decode_frame_device(
        frame, nbytes, cc, CONSTANT_TO_FORMAT_ID[fmt], g, out_words=True,
        with_reasons=with_reasons,
    )
    words_flat, ok = res[0], res[1]
    wpb = bytes_per_block(fmt) // 4
    words = words_flat.reshape(-1, wpb)
    img = _decode_blocks(codec, words, height, width)
    if with_reasons:
        return img, ok, res[2]
    return img, ok


@partial(jax.jit, static_argnames=("codec", "height", "width", "chunk_count"))
def decode_pipeline_reasons(
    frame: jnp.ndarray,
    height: int,
    width: int,
    codec: str = "hap_q",
    chunk_count: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """decode_pipeline + a (T, 5) int32 ok-reason matrix (one row per
    texture section; columns documented at decode_frame_device)."""
    fmts = _CODEC_TEXTURES[codec]
    if len(fmts) == 1:
        img, ok, reasons = _decode_texture_pipeline(
            frame, height, width, codec, fmts[0], chunk_count, with_reasons=True
        )
        return img, ok, reasons[None, :]
    return _decode_multi_image(
        frame, height, width, fmts, chunk_count, with_reasons=True
    )


@partial(jax.jit, static_argnames=("codec", "height", "width", "chunk_count"))
def decode_pipeline(
    frame: jnp.ndarray,
    height: int,
    width: int,
    codec: str = "hap_q",
    chunk_count: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """((fmax,) uint8, dims) -> ((H, W, C) pixels, ok flag)."""
    fmts = _CODEC_TEXTURES[codec]
    if len(fmts) == 1:
        return _decode_texture_pipeline(
            frame, height, width, codec, fmts[0], chunk_count
        )
    return _decode_multi_image(frame, height, width, fmts, chunk_count)


def _decode_multi_image(frame, height, width, fmts, chunk_count, with_reasons=False):
    # hap_q_alpha: 0x0D wrapper with a YCoCg section then an RGTC1 section.
    from hap_tpu.constants import SECTION_MULTIPLE_IMAGES, UINT24_MAX
    from hap_tpu.container.plan import decode_instructions_length
    from hap_tpu.pipeline.device_frame import frame_layout

    worst = 0
    for fmt in fmts:
        nbytes = dxt_payload_bytes(width, height, fmt)
        cc = plan_chunks(height, width, fmt, chunk_count)
        worst += nbytes + decode_instructions_length(cc) + 4
    top_hdr = 8 if worst > UINT24_MAX else 4
    ok = frame[3] == SECTION_MULTIPLE_IMAGES

    # Child 1 (color): static header length from its static payload size.
    nb1 = dxt_payload_bytes(width, height, fmts[0])
    cc1 = plan_chunks(height, width, fmts[0], chunk_count)
    _, _, hdr1, _, _, f1max = frame_layout(nb1, cc1, bytes_per_block(fmts[0]))
    nb2 = dxt_payload_bytes(width, height, fmts[1])
    cc2 = plan_chunks(height, width, fmts[1], chunk_count)
    _, _, _, _, _, f2max = frame_layout(nb2, cc2, bytes_per_block(fmts[1]))

    pad = jnp.pad(frame, (0, top_hdr + f1max + f2max))
    child1 = jax.lax.dynamic_slice(pad, (jnp.int32(top_hdr),), (f1max,))
    # Section length of child 1 from its header (4- or 8-byte form).
    b = child1.astype(jnp.int32)
    if hdr1 == 8:
        len1 = b[4] | (b[5] << 8) | (b[6] << 16) | (b[7] << 24)
    else:
        len1 = b[0] | (b[1] << 8) | (b[2] << 16)
    r1 = _decode_texture_pipeline(
        child1, height, width, "hap_q", fmts[0], chunk_count, with_reasons
    )
    child2 = jax.lax.dynamic_slice(pad, (top_hdr + hdr1 + len1,), (f2max,))
    r2 = _decode_texture_pipeline(
        child2, height, width, "hap_alpha_only", fmts[1], chunk_count, with_reasons
    )
    color, ok1 = r1[0], r1[1]
    alpha, ok2 = r2[0], r2[1]
    if alpha.ndim == 2:
        alpha = alpha[..., None]
    img = jnp.concatenate([color, alpha], axis=-1)
    if with_reasons:
        return img, ok & ok1 & ok2, jnp.stack([r1[2], r2[2]])
    return img, ok & ok1 & ok2


def _encode_blocks_gop(codec: str, imgs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B*N, words_per_block) — batch folded into the block
    axis, so the BCn/YCoCg kernels (all elementwise over their leading axis)
    see one big batch."""
    B = imgs.shape[0]
    to_blocks = jax.vmap(image_to_blocks)
    if codec == "hap":
        blocks = to_blocks(imgs[..., :3])
        return bc1_encode_blocks(blocks.reshape((-1,) + blocks.shape[2:]))
    if codec == "hap_alpha":
        blocks = to_blocks(imgs)
        return bc3_encode_blocks(blocks.reshape((-1,) + blocks.shape[2:]))
    if codec == "hap_q":
        from hap_tpu.kernels.ycocg import rgb_to_cocgs_y

        blocks = to_blocks(imgs[..., :3])
        cocgs, y = rgb_to_cocgs_y(blocks.reshape((-1,) + blocks.shape[2:]))
        return jnp.concatenate(
            [bc4_encode_blocks(y), bc1_encode_blocks(cocgs)], axis=1
        )
    if codec == "hap_alpha_only":
        chan = imgs if imgs.ndim == 3 else imgs[..., -1]
        blocks = to_blocks(chan)
        return bc4_encode_blocks(blocks.reshape((-1,) + blocks.shape[2:]))
    if codec == "hap_r":
        from hap_tpu.kernels.bc7 import bc7_encode_blocks

        blocks = to_blocks(imgs)
        return bc7_encode_blocks(blocks.reshape((-1,) + blocks.shape[2:]))
    if codec == "hap_hdr":
        from hap_tpu.kernels.bc6h import bc6h_encode_blocks_adaptive, f32_to_half_bits

        blocks = to_blocks(imgs.astype(jnp.float32))
        return bc6h_encode_blocks_adaptive(
            f32_to_half_bits(blocks.reshape((-1,) + blocks.shape[2:])),
            signed=False,
        )
    if codec == "hap_hdr_signed":
        from hap_tpu.kernels.bc6h import (
            bc6h_encode_blocks_adaptive,
            f32_to_half_bits,
        )

        blocks = to_blocks(imgs.astype(jnp.float32))
        return bc6h_encode_blocks_adaptive(
            f32_to_half_bits(blocks.reshape((-1,) + blocks.shape[2:])),
            signed=True,
        )
    raise ValueError(codec)


def _decode_blocks_gop(codec: str, words: jnp.ndarray, B: int, h: int, w: int):
    """(B*N, wpb) words -> (B, H, W, C) pixels (batch folded into blocks)."""
    from hap_tpu.kernels.bc1 import bc1_decode_planes
    from hap_tpu.kernels.bc4 import bc4_decode_planes
    from hap_tpu.kernels.layout import (
        block_planes_to_image,
        deinterleave_words_mxu,
    )

    to_image = jax.vmap(partial(blocks_to_image, height=h, width=w))

    def unfold(blocks):
        return to_image(blocks.reshape((B, -1) + blocks.shape[1:]))

    def unfold_planes(planes):
        # (C, 16, B*N) u8 -> per-frame planes -> images (planar decode twin)
        c = planes.shape[0]
        p = planes.reshape(c, 16, B, -1).transpose(2, 0, 1, 3)
        return jax.vmap(
            partial(block_planes_to_image, height=h, width=w)
        )(p)

    if codec == "hap":
        w0, w1 = deinterleave_words_mxu(words.reshape(-1), 2)
        rgb, _ = bc1_decode_planes(w0, w1)
        return unfold_planes(rgb.astype(jnp.uint8))
    if codec == "hap_alpha":
        a0, a1, c0, c1 = deinterleave_words_mxu(words.reshape(-1), 4)
        a = bc4_decode_planes(a0, a1)
        rgb, _ = bc1_decode_planes(c0, c1, dxt1_punchthrough=False)
        return unfold_planes(
            jnp.concatenate([rgb, a[None]]).astype(jnp.uint8))
    if codec == "hap_q":
        from hap_tpu.kernels.ycocg import cocgs_y_to_rgb_planes

        y0, y1, c0, c1 = deinterleave_words_mxu(words.reshape(-1), 4)
        cocgs, _ = bc1_decode_planes(c0, c1, dxt1_punchthrough=False)
        y = bc4_decode_planes(y0, y1)
        return unfold_planes(cocgs_y_to_rgb_planes(cocgs, y))
    if codec == "hap_alpha_only":
        w0, w1 = deinterleave_words_mxu(words.reshape(-1), 2)
        a = bc4_decode_planes(w0, w1)
        return unfold_planes(a[None].astype(jnp.uint8))
    if codec == "hap_r":
        from hap_tpu.kernels.bc7 import bc7_decode_blocks

        return unfold(bc7_decode_blocks(words))
    if codec == "hap_hdr":
        from hap_tpu.kernels.bc6h import bc6h_decode_blocks, half_bits_to_f32

        return unfold(half_bits_to_f32(bc6h_decode_blocks(words)))
    if codec == "hap_hdr_signed":
        from hap_tpu.kernels.bc6h import bc6h_decode_blocks, half_bits_to_f32

        return unfold(half_bits_to_f32(bc6h_decode_blocks(words, signed=True)))
    raise ValueError(codec)


@partial(jax.jit, static_argnames=("codec", "chunk_count"))
def encode_pipeline_gop(
    imgs: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GOP-batched encode: (B, H, W, C) -> ((B, fmax) frames, (B,) lens).

    Per-frame bytes are identical to encode_pipeline; the BCn plane and the
    snappy byte plane each run as ONE batched computation over all frames.
    NOTE: on the current v5e toolchain `jax.lax.map` over the per-frame
    pipeline is ~2x FASTER than this formulation at 4K (13.0 vs 27.0
    ms/frame, tools/profile_roundtrip_ab.py) — XLA pipelines the sequential
    program better than it schedules the frame-batched one. Serving paths
    (DeviceSession, sharded_frame_roundtrip, bench.py) therefore use
    lax.map; these entry points remain the semantic batched API.
    Multi-image codecs fall back to a map over the per-frame pipeline.
    """
    from hap_tpu.pipeline.device_frame import encode_frames_device

    fmts = _CODEC_TEXTURES[codec]
    if len(fmts) > 1:
        return jax.lax.map(
            lambda f: encode_pipeline(f, codec, chunk_count), imgs
        )
    B, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    fmt = fmts[0]
    g = bytes_per_block(fmt)
    cc = plan_chunks(h, w, fmt, chunk_count)
    words = _encode_blocks_gop(codec, imgs)
    payloads = words_to_payload(words).reshape(B, -1)
    return encode_frames_device(
        payloads, cc, CONSTANT_TO_FORMAT_ID[fmt], g, row_bytes=g * w // 4)


@partial(jax.jit, static_argnames=("codec", "height", "width", "chunk_count"))
def decode_pipeline_gop(
    frames: jnp.ndarray,
    height: int,
    width: int,
    codec: str = "hap_q",
    chunk_count: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GOP-batched decode: ((B, fmax) frames, dims) -> ((B, H, W, C), (B,) ok)."""
    from hap_tpu.pipeline.device_frame import decode_frames_device

    fmts = _CODEC_TEXTURES[codec]
    if len(fmts) > 1:
        return jax.lax.map(
            lambda f: decode_pipeline(f, height, width, codec, chunk_count),
            frames,
        )
    B = frames.shape[0]
    fmt = fmts[0]
    g = bytes_per_block(fmt)
    nbytes = dxt_payload_bytes(width, height, fmt)
    cc = plan_chunks(height, width, fmt, chunk_count)
    words_flat, ok = decode_frames_device(
        frames, nbytes, cc, CONSTANT_TO_FORMAT_ID[fmt], g, out_words=True
    )
    wpb = g // 4
    words = words_flat.reshape(-1, wpb)
    imgs = _decode_blocks_gop(codec, words, B, height, width)
    return imgs, ok


@partial(jax.jit, static_argnames=("codec", "chunk_count"))
def roundtrip_pipeline_gop(
    imgs: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GOP-batched encode + decode in one device computation."""
    h, w = imgs.shape[1], imgs.shape[2]
    frames, frame_lens = encode_pipeline_gop(imgs, codec, chunk_count)
    out, ok = decode_pipeline_gop(frames, h, w, codec, chunk_count)
    return out, frame_lens, ok


@partial(jax.jit, static_argnames=("codec", "chunk_count", "effort"))
def roundtrip_pipeline(
    img: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64,
    effort: str = "high",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Encode + decode in one device computation (the bench workload).

    Returns (decoded image, frame_len, ok).
    """
    h, w = img.shape[0], img.shape[1]
    frame, frame_len = encode_pipeline(img, codec, chunk_count, effort)
    out, ok = decode_pipeline(frame, h, w, codec, chunk_count)
    return out, frame_len, ok
