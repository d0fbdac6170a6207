"""Hap wire-format and API constants.

TPU-native reimplementation of the constants defined by the Hap specification
(/root/reference/documentation/HapVideoDRAFT.md:50-103) and the reference API
(/root/reference/source/hap.h:40-61, /root/reference/source/hap.c:41-88).

The stored top-level section type byte packs (compressor nibble << 4) | format
nibble (reference: hap.c:131-135, spec table HapVideoDRAFT.md:50-73).
"""

from __future__ import annotations

import enum

# ---------------------------------------------------------------------------
# Stored (wire) nibbles — spec HapVideoDRAFT.md:50-73; reference hap.c:41-51.
# ---------------------------------------------------------------------------

# Compressor nibble (top 4 bits of the top-level section type byte).
COMPRESSOR_NONE = 0xA
COMPRESSOR_SNAPPY = 0xB
COMPRESSOR_COMPLEX = 0xC  # "consult decode instructions"

# Format nibble (bottom 4 bits of the top-level section type byte).
FORMAT_RGB_DXT1 = 0xB
FORMAT_RGBA_DXT5 = 0xE
FORMAT_YCOCG_DXT5 = 0xF
FORMAT_A_RGTC1 = 0x1
FORMAT_RGBA_BPTC = 0xC  # BC7
FORMAT_RGB_BPTC_UF = 0x2  # BC6H unsigned
FORMAT_RGB_BPTC_SF = 0x3  # BC6H signed

# Section types — spec HapVideoDRAFT.md:91-103; reference hap.c:84-88.
SECTION_MULTIPLE_IMAGES = 0x0D
SECTION_DECODE_INSTRUCTIONS = 0x01
SECTION_CHUNK_COMPRESSOR_TABLE = 0x02
SECTION_CHUNK_SIZE_TABLE = 0x03
SECTION_CHUNK_OFFSET_TABLE = 0x04

# Per-chunk second-stage compressor byte values used inside the Chunk
# Second-Stage Compressor Table (spec HapVideoDRAFT.md:115-121). These are the
# same values as the compressor nibbles.
CHUNK_COMPRESSOR_NONE = 0x0A
CHUNK_COMPRESSOR_SNAPPY = 0x0B

# 24-bit limit for 4-byte section headers (reference hap.c:34).
UINT24_MAX = 0x00FFFFFF

# Hard chunk-count cap derived from the 4-byte decode-instructions header
# (0xFFFFFF == count + 4*count + 20; reference hap.c:279-284).
MAX_CHUNK_COUNT = 3355431


# ---------------------------------------------------------------------------
# Public API constants — match GL texture-compression enums (hap.h:40-48).
# ---------------------------------------------------------------------------

class TextureFormat(enum.IntEnum):
    RGB_DXT1 = 0x83F0
    RGBA_DXT5 = 0x83F3
    YCoCg_DXT5 = 0x01
    A_RGTC1 = 0x8DBB
    RGBA_BPTC_UNORM = 0x8E8C
    RGB_BPTC_UNSIGNED_FLOAT = 0x8E8F
    RGB_BPTC_SIGNED_FLOAT = 0x8E8E


class Compressor(enum.IntEnum):
    """API-level second-stage compressor choice (hap.h:50-53)."""

    NONE = 0
    SNAPPY = 1


class HapResult(enum.IntEnum):
    """Result codes (hap.h:55-61). Raised as HapError in this package."""

    NO_ERROR = 0
    BAD_ARGUMENTS = 1
    BUFFER_TOO_SMALL = 2
    BAD_FRAME = 3
    INTERNAL_ERROR = 4


class HapError(Exception):
    """Error carrying a HapResult code; total-function error discipline

    mirrors the reference's bounds-checked degradation to Bad_Frame
    (hap.c:142-145,178-184,840-843) rather than crashing on malformed input.
    """

    def __init__(self, result: HapResult, message: str = ""):
        self.result = HapResult(result)
        super().__init__(f"{self.result.name}: {message}" if message else self.result.name)


# Stored format nibble <-> public constant, both directions
# (reference hap.c:214-261; unknown values map to None, caller raises Bad_Frame).
FORMAT_ID_TO_CONSTANT = {
    FORMAT_RGB_DXT1: TextureFormat.RGB_DXT1,
    FORMAT_RGBA_DXT5: TextureFormat.RGBA_DXT5,
    FORMAT_YCOCG_DXT5: TextureFormat.YCoCg_DXT5,
    FORMAT_A_RGTC1: TextureFormat.A_RGTC1,
    FORMAT_RGBA_BPTC: TextureFormat.RGBA_BPTC_UNORM,
    FORMAT_RGB_BPTC_UF: TextureFormat.RGB_BPTC_UNSIGNED_FLOAT,
    FORMAT_RGB_BPTC_SF: TextureFormat.RGB_BPTC_SIGNED_FLOAT,
}

CONSTANT_TO_FORMAT_ID = {v: k for k, v in FORMAT_ID_TO_CONSTANT.items()}


def bytes_per_block(texture_format: int) -> int:
    """DXT/BC block size in bytes: 8 for BC1/BC4, 16 otherwise.

    Mirrors the block-size switch used for chunk legalization
    (reference hap.c:287-294).
    """
    if texture_format in (TextureFormat.RGB_DXT1, TextureFormat.A_RGTC1):
        return 8
    return 16


# FourCC names (spec HapVideoDRAFT.md:134-142) — informational.
FOURCC = {
    "Hap1": (TextureFormat.RGB_DXT1,),
    "Hap5": (TextureFormat.RGBA_DXT5,),
    "HapY": (TextureFormat.YCoCg_DXT5,),
    "HapM": (TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1),
    "HapA": (TextureFormat.A_RGTC1,),
    "Hap7": (TextureFormat.RGBA_BPTC_UNORM,),
    "HapH": (TextureFormat.RGB_BPTC_UNSIGNED_FLOAT, TextureFormat.RGB_BPTC_SIGNED_FLOAT),
}
