"""Frame parsing: Hap bytes → FramePlan (fixed-shape index tables).

This is the TPU-native replacement for the reference's decode-side container
walk (hap_get_section_at_index hap.c:932-991, hap_decode_single_texture
hap.c:732-930, hap_decode_header_complex_instructions hap.c:644-730): one
host-side pass produces, per texture, flat numpy tables (chunk compressors,
compressed offsets/sizes, uncompressed offsets/sizes) that the chunk-parallel
decode engines (native thread pool or device kernels) consume without any
further byte walking.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from hap_tpu.constants import (
    CHUNK_COMPRESSOR_SNAPPY,
    COMPRESSOR_COMPLEX,
    COMPRESSOR_NONE,
    COMPRESSOR_SNAPPY,
    FORMAT_ID_TO_CONSTANT,
    SECTION_CHUNK_COMPRESSOR_TABLE,
    SECTION_CHUNK_OFFSET_TABLE,
    SECTION_CHUNK_SIZE_TABLE,
    SECTION_DECODE_INSTRUCTIONS,
    SECTION_MULTIPLE_IMAGES,
    HapError,
    HapResult,
    TextureFormat,
)
from hap_tpu.container.sections import read_section_header
from hap_tpu.snappy.format import read_varint


@dataclasses.dataclass
class TexturePlan:
    """Decode plan for one texture section of a frame.

    All offsets are absolute into the frame byte buffer. For the Snappy and
    None top-level compressors the plan is a single chunk covering the whole
    section (hap.c:885-916); for Complex it is the chunk tables
    (hap.c:794-838).
    """

    texture_format: TextureFormat
    stored_compressor: int  # nibble 0xA / 0xB / 0xC
    section_offset: int  # absolute offset of section body
    section_length: int
    chunk_count: int
    chunk_compressors: np.ndarray  # uint8 (N,): 0x0A or 0x0B
    chunk_compressed_offsets: np.ndarray  # int64 (N,) absolute
    chunk_compressed_sizes: np.ndarray  # int64 (N,)
    chunk_uncompressed_offsets: np.ndarray  # int64 (N,) into decoded texture
    chunk_uncompressed_sizes: np.ndarray  # int64 (N,)
    decoded_bytes: int  # total decoded texture size


@dataclasses.dataclass
class FramePlan:
    textures: List[TexturePlan]
    is_multi_image: bool
    frame_length: int

    @property
    def texture_count(self) -> int:
        return len(self.textures)


def _locate_sections(data) -> tuple:
    """Top-level walk. Returns (is_multi, [(body_offset, length, type), ...]).

    Mirrors hap_get_section_at_index / HapGetFrameTextureCount: a 0x0D
    multiple-images section contains nested top-level sections; otherwise the
    single top section is the texture (hap.c:946-983, 1056-1086).
    """
    hdr_len, sec_len, sec_type = read_section_header(data, 0)
    if sec_type != SECTION_MULTIPLE_IMAGES:
        return False, [(hdr_len, sec_len, sec_type)]
    sections = []
    offset = hdr_len
    end = hdr_len + sec_len
    while offset < end:
        child_hdr, child_len, child_type = read_section_header(data, offset)
        sections.append((offset + child_hdr, child_len, child_type))
        offset += child_hdr + child_len
    return True, sections


def _walk_child_at_index(data, index: int):
    """Decode-side child walk, EXACTLY hap_get_section_at_index
    (hap.c:932-991): children are read with the PARENT section length as
    the bound, and the walk stops at the requested index — later siblings
    are never validated (a frame whose second child is garbage still
    decodes texture 0, matching the real decoder; found by
    tests/test_oracle_fuzz.py). Contrast HapGetFrameTextureCount
    (hap.c:1061-1076), which walks ALL children bounded by the INPUT
    BUFFER — see _locate_sections.

    Returns (body_offset_absolute, child_len, child_type).
    """
    hdr_len, sec_len, sec_type = read_section_header(data, 0)
    if sec_type != SECTION_MULTIPLE_IMAGES:
        if index != 0:
            raise HapError(HapResult.BAD_ARGUMENTS,
                           "single-texture frame, index != 0")
        return hdr_len, sec_len, sec_type
    view = memoryview(data)
    base = hdr_len
    top_len = sec_len
    offset = 0
    child_hdr = child_len = 0
    child_type = 0
    for _ in range(index + 1):
        offset += child_hdr + child_len
        if offset >= top_len:
            raise HapError(HapResult.BAD_ARGUMENTS, "texture index out of range")
        child_hdr, child_len, child_type = read_section_header(
            view[base + offset: base + top_len], 0)
    return base + offset + child_hdr, child_len, child_type


def _parse_decode_instructions(data, body_offset: int, body_length: int):
    """Walk a Complex section: Decode Instructions Container + frame data.

    Returns (chunk_count, compressors, sizes, offsets_or_None, frame_data_off)
    with the same validation as hap_decode_header_complex_instructions
    (hap.c:644-730): DIC must come first, unknown sections inside the DIC are
    skipped, all tables must agree on the chunk count, and the compressor and
    size tables are required.
    """
    # The DIC header read is bounded by the TEXTURE SECTION length, not the
    # buffer (hap.c:657 passes texture_section_length) — parity pinned by
    # tests/test_oracle_fuzz.py.
    view0 = memoryview(data)[body_offset: body_offset + body_length]
    dic_hdr, dic_len, dic_type = read_section_header(view0, 0)
    if dic_type != SECTION_DECODE_INSTRUCTIONS:
        raise HapError(HapResult.BAD_FRAME, "expected Decode Instructions Container")
    frame_data_offset = body_offset + dic_hdr + dic_len

    chunk_count = 0
    compressors: Optional[np.ndarray] = None
    sizes: Optional[np.ndarray] = None
    offsets: Optional[np.ndarray] = None

    pos = body_offset + dic_hdr
    remaining = dic_len
    view = memoryview(data)
    while remaining > 0:
        hdr, length, stype = read_section_header(view[pos : pos + remaining], 0)
        body = np.frombuffer(view[pos + hdr : pos + hdr + length], dtype=np.uint8)
        section_chunk_count = 0
        if stype == SECTION_CHUNK_COMPRESSOR_TABLE:
            compressors = body
            section_chunk_count = length
        elif stype == SECTION_CHUNK_SIZE_TABLE:
            sizes = body[: (length // 4) * 4].view("<u4").astype(np.int64)
            section_chunk_count = length // 4
        elif stype == SECTION_CHUNK_OFFSET_TABLE:
            offsets = body[: (length // 4) * 4].view("<u4").astype(np.int64)
            section_chunk_count = length // 4
        # else: ignore unrecognized sections (spec HapVideoDRAFT.md:34)
        if section_chunk_count != 0:
            if chunk_count != 0 and section_chunk_count != chunk_count:
                raise HapError(HapResult.BAD_FRAME, "chunk tables disagree on count")
            chunk_count = section_chunk_count
        pos += hdr + length
        remaining -= hdr + length
    if compressors is None or sizes is None:
        raise HapError(HapResult.BAD_FRAME, "missing chunk compressor/size table")
    return chunk_count, compressors, sizes, offsets, frame_data_offset


def _plan_texture(data, body_offset: int, body_length: int, section_type: int) -> TexturePlan:
    compressor = (section_type & 0xF0) >> 4
    format_id = section_type & 0x0F
    fmt = FORMAT_ID_TO_CONSTANT.get(format_id)
    if fmt is None:
        raise HapError(HapResult.BAD_FRAME, f"unknown texture format id {format_id:#x}")

    view = memoryview(data)
    if compressor == COMPRESSOR_COMPLEX:
        chunk_count, comps, sizes, offs, frame_data_offset = _parse_decode_instructions(
            data, body_offset, body_length
        )
        if chunk_count == 0:
            z = np.zeros(0, dtype=np.int64)
            return TexturePlan(fmt, compressor, body_offset, body_length, 0,
                               np.zeros(0, np.uint8), z, z, z, z, 0)
        comps = np.ascontiguousarray(comps[:chunk_count])
        sizes = np.ascontiguousarray(sizes[:chunk_count])
        # Unknown chunk compressor byte -> Bad_Frame (hap_decode_chunk's
        # default branch, hap.c:637-640; first failing chunk fails the
        # decode). Parity found by tests/test_oracle_fuzz.py: treating it
        # as raw silently accepted frames hap.c rejects.
        bad = (comps != CHUNK_COMPRESSOR_SNAPPY) & (comps != 0x0A)
        if bad.any():
            raise HapError(HapResult.BAD_FRAME,
                           f"unknown chunk compressor {comps[bad][0]:#x}")
        if offs is not None:
            comp_offsets = frame_data_offset + np.ascontiguousarray(offs[:chunk_count])
        else:
            # Offsets are the exclusive prefix sum of sizes (hap.c:800-807).
            comp_offsets = frame_data_offset + np.concatenate(
                ([0], np.cumsum(sizes[:-1]))
            ).astype(np.int64)
        # Per-chunk decoded size: snappy preamble varint, or the stored size
        # for raw chunks (hap.c:811-834).
        # Chunk data is bounded by the INPUT BUFFER, not the section
        # length: the reference reads chunk bytes past the section end
        # unchecked (it has NO input-extent validation at all and
        # SEGFAULTS when the size table points past the buffer,
        # hap.c:800-838 — tests/test_oracle_fuzz.py). We accept everything
        # it successfully decodes and reject with Bad_Frame exactly where
        # it would read out of bounds.
        un_sizes = np.empty(chunk_count, dtype=np.int64)
        for i in range(chunk_count):
            start = int(comp_offsets[i])
            end = start + int(sizes[i])
            if end > len(view) or start < 0:
                raise HapError(HapResult.BAD_FRAME, "chunk extends beyond buffer")
            if comps[i] == CHUNK_COMPRESSOR_SNAPPY:
                un_sizes[i], _ = read_varint(view[start:end], 0)
            else:
                un_sizes[i] = sizes[i]
        un_offsets = np.concatenate(([0], np.cumsum(un_sizes[:-1]))).astype(np.int64)
        decoded = int(un_sizes.sum())
        return TexturePlan(fmt, compressor, body_offset, body_length, chunk_count,
                           comps, comp_offsets.astype(np.int64), sizes,
                           un_offsets, un_sizes, decoded)

    if compressor == COMPRESSOR_SNAPPY:
        decoded, _ = read_varint(view[body_offset : body_offset + body_length], 0)
        return TexturePlan(
            fmt, compressor, body_offset, body_length, 1,
            np.array([CHUNK_COMPRESSOR_SNAPPY], np.uint8),
            np.array([body_offset], np.int64),
            np.array([body_length], np.int64),
            np.array([0], np.int64),
            np.array([decoded], np.int64),
            decoded,
        )
    if compressor == COMPRESSOR_NONE:
        return TexturePlan(
            fmt, compressor, body_offset, body_length, 1,
            np.array([0x0A], np.uint8),
            np.array([body_offset], np.int64),
            np.array([body_length], np.int64),
            np.array([0], np.int64),
            np.array([body_length], np.int64),
            body_length,
        )
    raise HapError(HapResult.BAD_FRAME, f"unknown compressor nibble {compressor:#x}")


def parse_frame(data) -> FramePlan:
    """Parse a whole Hap frame into a FramePlan (all textures)."""
    is_multi, sections = _locate_sections(data)
    textures = [_plan_texture(data, off, length, stype) for off, length, stype in sections]
    return FramePlan(textures=textures, is_multi_image=is_multi, frame_length=len(data))


# ---------------------------------------------------------------------------
# Introspection API mirroring hap.c:1042-1188.
# ---------------------------------------------------------------------------

def frame_texture_count(data) -> int:
    """HapGetFrameTextureCount (hap.c:1042-1087)."""
    is_multi, sections = _locate_sections(data)
    return len(sections)


def _section_at_index(data, index: int):
    if index > 1:
        raise HapError(HapResult.BAD_ARGUMENTS, "texture index > 1")
    return _walk_child_at_index(data, index)


def plan_texture_at(data, index: int) -> TexturePlan:
    """Index-targeted decode plan with EXACT reference acceptance
    semantics (the lazy child walk + buffer-bounded chunk data). This is
    the surface hap_decode parity is measured on; parse_frame (below)
    plans every texture and is deliberately stricter for multi-texture
    frames (all textures must be decodable)."""
    if index > 1:
        raise HapError(HapResult.BAD_ARGUMENTS, "texture index > 1")
    off, length, stype = _walk_child_at_index(data, index)
    return _plan_texture(data, off, length, stype)


def frame_texture_format(data, index: int = 0) -> TextureFormat:
    """HapGetFrameTextureFormat (hap.c:1089-1126)."""
    _, _, stype = _section_at_index(data, index)
    fmt = FORMAT_ID_TO_CONSTANT.get(stype & 0x0F)
    if fmt is None:
        raise HapError(HapResult.BAD_FRAME, "unknown texture format")
    return fmt


def frame_texture_chunk_count(data, index: int = 0) -> int:
    """HapGetFrameTextureChunkCount (hap.c:1128-1188)."""
    off, length, stype = _section_at_index(data, index)
    compressor = (stype & 0xF0) >> 4
    if compressor == COMPRESSOR_COMPLEX:
        chunk_count, *_ = _parse_decode_instructions(data, off, length)
        return chunk_count
    if compressor in (COMPRESSOR_SNAPPY, COMPRESSOR_NONE):
        return 1
    raise HapError(HapResult.BAD_FRAME, "unknown compressor")
