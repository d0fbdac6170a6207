"""Encode-side container stitching: codec output bytes → Hap frame bytes.

Reproduces the reference encoder's byte-level behaviour exactly
(hap_encode_texture hap.c:355-504, HapEncode hap.c:506-604), including:

* header-length selection from the uncompressed worst case (hap.c:391-405)
  and its re-check with decode-instructions overhead (hap.c:425-428);
* per-chunk raw fallback when Snappy does not shrink a chunk (hap.c:460-466);
* whole-frame fallback to uncompressed storage when chunked+compressed is not
  smaller than raw (hap.c:478-495) — note the reference compares against
  input_bytes + top_section_header_length, reproduced verbatim;
* no Chunk Offset Table is ever written (decoders must accept one).

The per-chunk compressor is injected (``compress_fn``) so the same stitching
serves the pure-Python oracle, the native C++ codec, and device output.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from hap_tpu.constants import (
    CHUNK_COMPRESSOR_NONE,
    CHUNK_COMPRESSOR_SNAPPY,
    COMPRESSOR_COMPLEX,
    COMPRESSOR_NONE,
    CONSTANT_TO_FORMAT_ID,
    SECTION_CHUNK_COMPRESSOR_TABLE,
    SECTION_CHUNK_SIZE_TABLE,
    SECTION_DECODE_INSTRUCTIONS,
    SECTION_MULTIPLE_IMAGES,
    UINT24_MAX,
    Compressor,
    HapError,
    HapResult,
    TextureFormat,
)
from hap_tpu.container.plan import decode_instructions_length, legalize_chunk_count

CompressFn = Callable[[memoryview], bytes]


def _default_compress(chunk: memoryview) -> bytes:
    from hap_tpu.snappy import pyref

    return pyref.compress(chunk)


def serialize_texture(
    data,
    texture_format: TextureFormat,
    compressor: Compressor = Compressor.SNAPPY,
    chunk_count: int = 1,
    compress_fn: Optional[CompressFn] = None,
    precompressed: Optional[Sequence[bytes]] = None,
) -> bytes:
    """Encode one texture's block data into a (nested) top-level section.

    ``data`` is the DXT/BC payload (what the reference calls texture data,
    hap.h:89-90). If ``precompressed`` is given it must be the per-chunk
    Snappy streams for the legalized chunk count (e.g. produced by the native
    codec or device); otherwise ``compress_fn`` (default: pure-Python Snappy)
    is invoked per chunk.
    """
    view = memoryview(data)
    input_bytes = len(view)
    if input_bytes == 0:
        raise HapError(HapResult.BAD_ARGUMENTS, "empty texture data")
    fmt_id = CONSTANT_TO_FORMAT_ID.get(TextureFormat(texture_format))
    if fmt_id is None:
        raise HapError(HapResult.BAD_ARGUMENTS, "unknown texture format")
    if chunk_count == 0:
        raise HapError(HapResult.BAD_ARGUMENTS, "chunk count must be >= 1")

    top_header_length = 8 if input_bytes > UINT24_MAX else 4

    if compressor == Compressor.SNAPPY:
        chunk_count = legalize_chunk_count(input_bytes, texture_format, chunk_count)
        dil = decode_instructions_length(chunk_count)
        if input_bytes + dil + 4 > UINT24_MAX:
            top_header_length = 8
        chunk_size = input_bytes // chunk_count

        if precompressed is not None:
            if len(precompressed) != chunk_count:
                raise HapError(
                    HapResult.BAD_ARGUMENTS,
                    f"precompressed chunk count {len(precompressed)} != legalized {chunk_count}",
                )
            packed = list(precompressed)
        else:
            fn = compress_fn or _default_compress
            packed = [
                fn(view[i * chunk_size : (i + 1) * chunk_size]) for i in range(chunk_count)
            ]

        chunk_comp = bytearray(chunk_count)
        chunk_sizes = bytearray(4 * chunk_count)
        payload = bytearray()
        for i in range(chunk_count):
            blob = packed[i]
            if len(blob) >= chunk_size:
                # Raw fallback: compression did not shrink this chunk.
                blob = bytes(view[i * chunk_size : (i + 1) * chunk_size])
                chunk_comp[i] = CHUNK_COMPRESSOR_NONE
            else:
                chunk_comp[i] = CHUNK_COMPRESSOR_SNAPPY
            chunk_sizes[4 * i : 4 * i + 4] = len(blob).to_bytes(4, "little")
            payload += blob

        top_section_length = 4 + dil + len(payload)
        if top_section_length < input_bytes + top_header_length:
            # Complex storage: snappy saved space.
            from hap_tpu.container.sections import write_section_header

            out = bytearray()
            out += write_section_header(
                top_header_length,
                top_section_length,
                (COMPRESSOR_COMPLEX << 4) | fmt_id,
            )
            out += write_section_header(4, dil, SECTION_DECODE_INSTRUCTIONS)
            out += write_section_header(4, chunk_count, SECTION_CHUNK_COMPRESSOR_TABLE)
            out += chunk_comp
            out += write_section_header(4, 4 * chunk_count, SECTION_CHUNK_SIZE_TABLE)
            out += chunk_sizes
            out += payload
            return bytes(out)
        # else fall through to uncompressed storage (hap.c:483-487)

    from hap_tpu.container.sections import write_section_header

    out = bytearray()
    out += write_section_header(
        top_header_length, input_bytes, (COMPRESSOR_NONE << 4) | fmt_id
    )
    out += view
    return bytes(out)


def serialize_frame(
    textures: Sequence,
    texture_formats: Sequence[TextureFormat],
    compressors: Optional[Sequence[Compressor]] = None,
    chunk_counts: Optional[Sequence[int]] = None,
    compress_fn: Optional[CompressFn] = None,
    precompressed: Optional[Sequence[Optional[Sequence[bytes]]]] = None,
) -> bytes:
    """HapEncode equivalent (hap.c:506-604): one texture → bare section,

    two textures → nested sections wrapped in a 0x0D multiple-images section.
    """
    count = len(textures)
    if count == 0 or count > 2:
        raise HapError(HapResult.BAD_ARGUMENTS, "frame must contain 1 or 2 textures")
    compressors = list(compressors or [Compressor.SNAPPY] * count)
    chunk_counts = list(chunk_counts or [1] * count)
    precompressed = list(precompressed or [None] * count)
    for cc in chunk_counts:
        if cc == 0:
            raise HapError(HapResult.BAD_ARGUMENTS, "chunk count must be >= 1")

    if count == 1:
        return serialize_texture(
            textures[0], texture_formats[0], compressors[0], chunk_counts[0],
            compress_fn, precompressed[0],
        )

    # Two textures: the reference only rejects the pair when *neither* is
    # YCoCg_DXT5 *and neither* is A_RGTC1 (hap.c:551-559) — looser than the
    # spec's single permitted combination; reproduced for parity.
    f0, f1 = TextureFormat(texture_formats[0]), TextureFormat(texture_formats[1])
    if (
        f0 != TextureFormat.YCoCg_DXT5 and f1 != TextureFormat.YCoCg_DXT5
        and f0 != TextureFormat.A_RGTC1 and f1 != TextureFormat.A_RGTC1
    ):
        raise HapError(HapResult.BAD_ARGUMENTS, "unsupported multi-texture combination")

    # Worst-case wrapper size → wrapper header length (hap.c:562-576).
    worst = sum(
        len(memoryview(t)) + decode_instructions_length(cc) + 4
        for t, cc in zip(textures, chunk_counts)
    )
    top_header_length = 8 if worst > UINT24_MAX else 4

    body = bytearray()
    for i in range(count):
        body += serialize_texture(
            textures[i], texture_formats[i], compressors[i], chunk_counts[i],
            compress_fn, precompressed[i],
        )

    from hap_tpu.container.sections import write_section_header

    return bytes(
        write_section_header(top_header_length, len(body), SECTION_MULTIPLE_IMAGES) + body
    )
