"""Per-family pixel<->frame codecs: Hap, Hap Alpha, Hap Q, Hap Alpha-Only,

Hap Q Alpha (FourCCs Hap1/Hap5/HapY/HapA/HapM, spec HapVideoDRAFT.md:134-142).

Each codec owns two jitted device functions (blocks encode / decode) cached
per frame shape, and delegates the byte plane to the native runtime (with a
pure-Python fallback when the native build is unavailable).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.constants import Compressor, HapError, HapResult, TextureFormat
from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks
from hap_tpu.kernels.bc6h import (
    bc6h_decode_blocks,
    bc6h_encode_blocks_mode11,
    f32_to_half_bits,
    half_bits_to_f32,
)
from hap_tpu.kernels.bc7 import bc7_decode_blocks, bc7_encode_blocks
from hap_tpu.kernels.layout import blocks_to_image, image_to_blocks
from hap_tpu.kernels.ycocg import cocgsy_to_rgb, rgb_to_cocgsy


def _words_to_bytes(words) -> bytes:
    return np.ascontiguousarray(np.asarray(words), dtype="<u4").tobytes()


def _bytes_to_words(data, words_per_block: int) -> jnp.ndarray:
    arr = np.frombuffer(data, dtype="<u4").reshape(-1, words_per_block)
    return jnp.asarray(arr)


# ---------------------------------------------------------------------------
# Device-side block functions (jitted once per frame shape)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _enc_hap(img: jnp.ndarray) -> jnp.ndarray:
    return bc1_encode_blocks(image_to_blocks(img[..., :3]))


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    rgb, _ = bc1_decode_blocks(words)
    return blocks_to_image(rgb, h, w)


@jax.jit
def _enc_hap_alpha(img: jnp.ndarray) -> jnp.ndarray:
    return bc3_encode_blocks(image_to_blocks(img))


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap_alpha(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks_to_image(bc3_decode_blocks(words), h, w)


@jax.jit
def _enc_hap_q(img: jnp.ndarray) -> jnp.ndarray:
    blocks = image_to_blocks(img[..., :3])
    return bc3_encode_blocks(rgb_to_cocgsy(blocks))


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap_q(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks_to_image(cocgsy_to_rgb(bc3_decode_blocks(words)), h, w)


@jax.jit
def _enc_hap_a(img: jnp.ndarray) -> jnp.ndarray:
    chan = img if img.ndim == 2 else img[..., -1]
    return bc4_encode_blocks(image_to_blocks(chan))


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap_a(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks_to_image(bc4_decode_blocks(words), h, w)


@jax.jit
def _enc_hap_r(img: jnp.ndarray) -> jnp.ndarray:
    """Hap R: BC7 (adaptive mode-1/3/5/6/7 encoder)."""
    return bc7_encode_blocks(image_to_blocks(img))


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap_r(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks_to_image(bc7_decode_blocks(words), h, w)


@jax.jit
def _enc_hap_hdr(img: jnp.ndarray) -> jnp.ndarray:
    """Hap HDR: BC6H unsigned (adaptive mode-11 / two-subset 0x1E
    encoder); img float32 RGB."""
    from hap_tpu.kernels.bc6h import bc6h_encode_blocks_adaptive

    blocks = image_to_blocks(img.astype(jnp.float32))
    return bc6h_encode_blocks_adaptive(f32_to_half_bits(blocks), signed=False)


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap_hdr(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks_to_image(half_bits_to_f32(bc6h_decode_blocks(words)), h, w)


@jax.jit
def _enc_hap_hdr_signed(img: jnp.ndarray) -> jnp.ndarray:
    """Hap HDR signed: BC6H SF16 (mode-11 signed encoder); img float32 RGB
    of either sign. The reference carries this format as nibble 0x3
    (hap.h:HapTextureFormat_RGB_BPTC_SF, hap.c:51) but ships no encoder for
    any texture format; this closes the SF16 half of the HapH family."""
    from hap_tpu.kernels.bc6h import bc6h_encode_blocks_adaptive

    blocks = image_to_blocks(img.astype(jnp.float32))
    return bc6h_encode_blocks_adaptive(f32_to_half_bits(blocks), signed=True)


@partial(jax.jit, static_argnames=("h", "w"))
def _dec_hap_hdr_signed(words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks_to_image(
        half_bits_to_f32(bc6h_decode_blocks(words, signed=True)), h, w
    )


# ---------------------------------------------------------------------------
# Codec table
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HapCodec:
    name: str
    fourcc: str
    texture_formats: Tuple[TextureFormat, ...]
    channels: int  # pixel channels consumed/produced

    @property
    def multi_texture(self) -> bool:
        return len(self.texture_formats) > 1


CODECS: Dict[str, HapCodec] = {
    "hap": HapCodec("hap", "Hap1", (TextureFormat.RGB_DXT1,), 3),
    "hap_alpha": HapCodec("hap_alpha", "Hap5", (TextureFormat.RGBA_DXT5,), 4),
    "hap_q": HapCodec("hap_q", "HapY", (TextureFormat.YCoCg_DXT5,), 3),
    "hap_alpha_only": HapCodec("hap_alpha_only", "HapA", (TextureFormat.A_RGTC1,), 1),
    "hap_q_alpha": HapCodec(
        "hap_q_alpha", "HapM", (TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1), 4
    ),
    "hap_r": HapCodec("hap_r", "Hap7", (TextureFormat.RGBA_BPTC_UNORM,), 4),
    "hap_hdr": HapCodec("hap_hdr", "HapH", (TextureFormat.RGB_BPTC_UNSIGNED_FLOAT,), 3),
    "hap_hdr_signed": HapCodec(
        "hap_hdr_signed", "HapH", (TextureFormat.RGB_BPTC_SIGNED_FLOAT,), 3
    ),
}

_ENCODERS = {
    TextureFormat.RGB_DXT1: (_enc_hap, 2),
    TextureFormat.RGBA_DXT5: (_enc_hap_alpha, 4),
    TextureFormat.YCoCg_DXT5: (_enc_hap_q, 4),
    TextureFormat.A_RGTC1: (_enc_hap_a, 2),
    TextureFormat.RGBA_BPTC_UNORM: (_enc_hap_r, 4),
    TextureFormat.RGB_BPTC_UNSIGNED_FLOAT: (_enc_hap_hdr, 4),
    TextureFormat.RGB_BPTC_SIGNED_FLOAT: (_enc_hap_hdr_signed, 4),
}

_DECODERS = {
    TextureFormat.RGB_DXT1: (_dec_hap, 2),
    TextureFormat.RGBA_DXT5: (_dec_hap_alpha, 4),
    TextureFormat.YCoCg_DXT5: (_dec_hap_q, 4),
    TextureFormat.A_RGTC1: (_dec_hap_a, 2),
    TextureFormat.RGBA_BPTC_UNORM: (_dec_hap_r, 4),
    TextureFormat.RGB_BPTC_UNSIGNED_FLOAT: (_dec_hap_hdr, 4),
    TextureFormat.RGB_BPTC_SIGNED_FLOAT: (_dec_hap_hdr_signed, 4),
}


def _byte_plane():
    """Native runtime if buildable, else pure-Python container+snappy."""
    try:
        from hap_tpu import native

        native.load()
        return native
    except Exception:
        return None


# TextureFormat -> (single-texture sub-codec name, channel selector into the
# multi-texture pixel stack, or None for the full image). Multi-texture specs
# derive their per-texture encode parts from this map instead of hardcoding
# the hap_q_alpha pair, so a future multi-texture codec can't silently pick
# the wrong sub-encoders (the combination rule is hap.c:551-559).
_FMT_EFFORT_SUBCODEC = {
    TextureFormat.RGB_DXT1: ("hap", None),
    TextureFormat.RGBA_DXT5: ("hap_alpha", None),
    TextureFormat.YCoCg_DXT5: ("hap_q", None),
    TextureFormat.A_RGTC1: ("hap_alpha_only", 3),
    TextureFormat.RGBA_BPTC_UNORM: ("hap_r", None),
    TextureFormat.RGB_BPTC_UNSIGNED_FLOAT: ("hap_hdr", None),
    TextureFormat.RGB_BPTC_SIGNED_FLOAT: ("hap_hdr_signed", None),
}


def _subcodec_parts(spec, codec: str):
    """[(sub_codec_name, channel_selector_or_None)] for an encode."""
    if not spec.multi_texture:
        return [(codec, None)]
    return [_FMT_EFFORT_SUBCODEC[fmt] for fmt in spec.texture_formats]


@partial(jax.jit, static_argnames=("sub", "effort"))
def _encode_blocks_jit(sub: str, effort: str, img: jnp.ndarray) -> jnp.ndarray:
    """Jitted wrapper for the effort-path planar encoders: one compiled
    program per (sub-codec, effort, shape) instead of an eager op-by-op
    dispatch stream (each eager jnp op is a separate enqueue through the
    axon tunnel, ~5 ms — eager 'fast' was slower end-to-end than jitted
    'high', the opposite of the knob's promise)."""
    from hap_tpu.pipeline.device_pipeline import _encode_blocks

    return _encode_blocks(sub, img, effort)


def encode_frame(
    image,
    codec: str = "hap_q",
    chunk_count: int = 8,
    compressor: Compressor = Compressor.SNAPPY,
    n_threads: int = 0,
    effort: str = "high",
) -> bytes:
    """Encode one (H, W, C) image into a Hap frame (uint8 pixels; float32
    RGB for the hap_hdr codec).

    Device: layout -> (YCoCg) -> BCn encode. Host: chunked Snappy + container
    stitch, mirroring HapEncode exactly (hap.c:506-604).

    effort: "fast" | "high" (default) | "best". "best" adds exact-decode-
    adjudicated candidate sets to the BC1/BC4 encoders (endpoint shrink +
    cluster-fit / local-exhaustive window — tools/eval_bcn_optimal.py
    measured them at the format's practical optimum) at several times the
    texture-encode cost: offline/archival territory. The knob affects ONLY
    the BC1/BC4 families (hap, hap_alpha, hap_q, hap_alpha_only,
    hap_q_alpha); for hap_r / hap_hdr / hap_hdr_signed the BC7/BC6H
    encoders have their own adaptive mode search and effort is a no-op
    (identical words at every level).
    """
    spec = CODECS[codec]
    img = jnp.asarray(image)
    if img.ndim == 2:
        img = img[..., None]

    payloads = []
    if effort != "high":
        # Route through the planar device-pipeline encoders, the only
        # path with the effort knob (the jitted host wrappers above pin
        # the default recipe). The whole sub-codec encode runs under one
        # jit entry per (codec, effort, shape) — eager _encode_blocks
        # would pay one tunnel enqueue (~5 ms here) per jnp op.
        for sub, sel in _subcodec_parts(spec, codec):
            payloads.append(_words_to_bytes(
                _encode_blocks_jit(sub, effort, img[..., sel] if sel is not None else img)))
    else:
        for fmt in spec.texture_formats:
            enc, _ = _ENCODERS[fmt]
            if fmt == TextureFormat.A_RGTC1 and spec.multi_texture:
                words = enc(img[..., 3])
            else:
                words = enc(img)
            payloads.append(_words_to_bytes(words))

    native = _byte_plane()
    formats = [int(f) for f in spec.texture_formats]
    ccs = [chunk_count] * len(payloads)
    comps = [int(compressor == Compressor.SNAPPY)] * len(payloads)
    if native is not None:
        return native.encode(payloads, formats, comps, ccs, n_threads=n_threads)
    from hap_tpu.container.serialize import serialize_frame

    return serialize_frame(
        payloads, spec.texture_formats,
        [compressor] * len(payloads), ccs,
    )


def _decode_texture_python(frame, index: int) -> bytes:
    """Pure-Python texture decode (plan + pyref snappy) — fallback path and

    differential-test oracle for the native runtime."""
    from hap_tpu.container.parse import plan_texture_at
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY
    from hap_tpu.snappy import pyref

    view = memoryview(frame)
    tex = plan_texture_at(frame, index)
    out = bytearray(tex.decoded_bytes)
    for i in range(tex.chunk_count):
        off = int(tex.chunk_compressed_offsets[i])
        csize = int(tex.chunk_compressed_sizes[i])
        uoff = int(tex.chunk_uncompressed_offsets[i])
        usize = int(tex.chunk_uncompressed_sizes[i])
        blob = view[off : off + csize]
        if tex.chunk_compressors[i] == CHUNK_COMPRESSOR_SNAPPY:
            out[uoff : uoff + usize] = pyref.decompress(blob, expected_length=usize)
        else:
            out[uoff : uoff + usize] = blob
    return bytes(out)


def codec_for_frame(frame) -> HapCodec:
    """Identify the codec family of an encoded frame from its texture formats."""
    from hap_tpu.container.parse import parse_frame

    plan = parse_frame(frame)
    fmts = tuple(t.texture_format for t in plan.textures)
    for spec in CODECS.values():
        if spec.texture_formats == fmts:
            return spec
    raise HapError(HapResult.BAD_FRAME, f"no codec for texture formats {fmts}")


def decode_frame(
    frame,
    height: int,
    width: int,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode a Hap frame to (H, W, C) uint8 pixels (C per codec family)."""
    spec = codec_for_frame(frame)
    native = _byte_plane()

    images = []
    for index, fmt in enumerate(spec.texture_formats):
        if native is not None:
            payload, got_fmt = native.decode(frame, index, n_threads=n_threads)
            if got_fmt != fmt:
                raise HapError(HapResult.BAD_FRAME, "format mismatch")
        else:
            payload = _decode_texture_python(frame, index)

        dec, wpb = _DECODERS[fmt]
        words = _bytes_to_words(payload, wpb)
        images.append(np.asarray(dec(words, height, width)))

    if not spec.multi_texture:
        out = images[0]
        return out
    # Hap Q Alpha: color from the YCoCg texture + alpha plane from RGTC1.
    color, alpha = images
    return np.concatenate([color, alpha[..., None]], axis=-1)
