"""Public API. Two layers:

1. Reference-shaped surface — the 6 functions of hap.h:76-152, operating on
   DXT/BC texture bytes exactly like the reference (`hap_encode` takes
   already-block-compressed data, `hap_decode` returns block data):
   hap_max_encoded_length, hap_encode, hap_decode, hap_get_frame_texture_count,
   hap_get_frame_texture_format, hap_get_frame_texture_chunk_count.

2. Pixel-level surface (the capability the reference delegates out-of-repo,
   HapVideoDRAFT.md:20-27): encode_frame / decode_frame over (H, W, C) uint8
   images, with the block plane on TPU.

Errors raise HapError carrying the matching HapResult code instead of
returning status ints — the Pythonic rendering of hap.h:55-61.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from hap_tpu.constants import Compressor, HapError, HapResult, TextureFormat
from hap_tpu.pipeline.codecs import decode_frame, encode_frame  # noqa: F401


def _native_or_none():
    try:
        from hap_tpu import native

        native.load()
        return native
    except Exception:
        return None


def hap_max_encoded_length(
    lengths: Sequence[int],
    texture_formats: Sequence[int],
    chunk_counts: Sequence[int],
) -> int:
    """HapMaxEncodedLength (hap.c:324-353). Returns 0 on bad arguments."""
    from hap_tpu.container.plan import max_encoded_length

    return max_encoded_length(lengths, texture_formats, chunk_counts)


def hap_encode(
    textures: Sequence,
    texture_formats: Sequence[int],
    compressors: Optional[Sequence[Compressor]] = None,
    chunk_counts: Optional[Sequence[int]] = None,
) -> bytes:
    """HapEncode (hap.c:506-604): block-compressed texture data -> frame."""
    count = len(textures)
    compressors = list(compressors or [Compressor.SNAPPY] * count)
    chunk_counts = list(chunk_counts or [1] * count)
    native = _native_or_none()
    if native is not None:
        return native.encode(
            textures, [int(f) for f in texture_formats],
            [int(c == Compressor.SNAPPY) for c in compressors], chunk_counts,
        )
    from hap_tpu.container.serialize import serialize_frame

    return serialize_frame(textures, texture_formats, compressors, chunk_counts)


def hap_decode(frame, index: int = 0) -> Tuple[bytes, TextureFormat]:
    """HapDecode (hap.c:993-1040): frame -> (block data, texture format)."""
    native = _native_or_none()
    if native is not None:
        return native.decode(frame, index)
    from hap_tpu.container.parse import frame_texture_format
    from hap_tpu.pipeline.codecs import _decode_texture_python

    if index > 1:
        raise HapError(HapResult.BAD_ARGUMENTS, "texture index > 1")
    fmt = frame_texture_format(frame, index)
    return _decode_texture_python(frame, index), fmt


def hap_get_frame_texture_count(frame) -> int:
    """HapGetFrameTextureCount (hap.c:1042-1087)."""
    from hap_tpu.container.parse import frame_texture_count

    return frame_texture_count(frame)


def hap_get_frame_texture_format(frame, index: int = 0) -> TextureFormat:
    """HapGetFrameTextureFormat (hap.c:1089-1126)."""
    from hap_tpu.container.parse import frame_texture_format

    return frame_texture_format(frame, index)


def hap_get_frame_texture_chunk_count(frame, index: int = 0) -> int:
    """HapGetFrameTextureChunkCount (hap.c:1128-1188)."""
    from hap_tpu.container.parse import frame_texture_chunk_count

    return frame_texture_chunk_count(frame, index)
