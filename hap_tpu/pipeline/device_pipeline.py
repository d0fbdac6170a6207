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
    pack_u8_to_u32,
    unpack_u32_to_u8,
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
}


def _encode_blocks(codec: str, img: jnp.ndarray) -> jnp.ndarray:
    if codec == "hap":
        return bc1_encode_blocks(image_to_blocks(img[..., :3]))
    if codec == "hap_alpha":
        return bc3_encode_blocks(image_to_blocks(img))
    if codec == "hap_q":
        return bc3_encode_blocks(rgb_to_cocgsy(image_to_blocks(img[..., :3])))
    if codec == "hap_alpha_only":
        chan = img if img.ndim == 2 else img[..., -1]
        return bc4_encode_blocks(image_to_blocks(chan))
    raise ValueError(codec)


def _decode_blocks(codec: str, words: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    if codec == "hap":
        return blocks_to_image(bc1_decode_blocks(words)[0], h, w)
    if codec == "hap_alpha":
        return blocks_to_image(bc3_decode_blocks(words), h, w)
    if codec == "hap_q":
        return blocks_to_image(cocgsy_to_rgb(bc3_decode_blocks(words)), h, w)
    if codec == "hap_alpha_only":
        return blocks_to_image(bc4_decode_blocks(words), h, w)
    raise ValueError(codec)


def plan_chunks(height: int, width: int, fmt: TextureFormat, chunk_count: int) -> int:
    nbytes = dxt_payload_bytes(width, height, fmt)
    return legalize_chunk_count(nbytes, fmt, chunk_count)


@partial(jax.jit, static_argnames=("codec", "chunk_count"))
def encode_pipeline(
    img: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W, C) uint8 -> ((fmax,) uint8 frame buffer, frame_len scalar).

    chunk_count is legalized against the payload size exactly as the
    reference does (hap.c:421).
    """
    h, w = img.shape[0], img.shape[1]
    fmt = _CODEC_TEXTURES[codec][0]
    g = bytes_per_block(fmt)
    cc = plan_chunks(h, w, fmt, chunk_count)
    words = _encode_blocks(codec, img)
    payload = unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
    return encode_frame_device(payload, cc, CONSTANT_TO_FORMAT_ID[fmt], g)


@partial(jax.jit, static_argnames=("codec", "height", "width", "chunk_count"))
def decode_pipeline(
    frame: jnp.ndarray,
    height: int,
    width: int,
    codec: str = "hap_q",
    chunk_count: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """((fmax,) uint8, dims) -> ((H, W, C) uint8 pixels, ok flag)."""
    fmt = _CODEC_TEXTURES[codec][0]
    g = bytes_per_block(fmt)
    nbytes = dxt_payload_bytes(width, height, fmt)
    cc = plan_chunks(height, width, fmt, chunk_count)
    payload, ok = decode_frame_device(frame, nbytes, cc, CONSTANT_TO_FORMAT_ID[fmt], g)
    wpb = bytes_per_block(fmt) // 4
    words = pack_u8_to_u32(payload.reshape(-1, 4 * wpb))
    img = _decode_blocks(codec, words, height, width)
    return img, ok


@partial(jax.jit, static_argnames=("codec", "chunk_count"))
def roundtrip_pipeline(
    img: jnp.ndarray, codec: str = "hap_q", chunk_count: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Encode + decode in one device computation (the bench workload).

    Returns (decoded image, frame_len, ok).
    """
    h, w = img.shape[0], img.shape[1]
    frame, frame_len = encode_pipeline(img, codec, chunk_count)
    out, ok = decode_pipeline(frame, h, w, codec, chunk_count)
    return out, frame_len, ok
