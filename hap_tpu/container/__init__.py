"""Host-side Hap container codec: pure byte functions, no device code.

Parse side produces a FramePlan of fixed-shape numpy index tables that the
jitted device pipeline consumes; serialize side stitches device/native codec
output back into spec-conformant frames. Semantics mirror the reference
container library (/root/reference/source/hap.c) exactly, re-derived from the
spec and the survey — not translated.
"""

from hap_tpu.container.sections import read_section_header, write_section_header
from hap_tpu.container.plan import (
    legalize_chunk_count,
    decode_instructions_length,
    max_encoded_length_single,
    max_encoded_length,
)
from hap_tpu.container.parse import (
    TexturePlan,
    FramePlan,
    parse_frame,
    frame_texture_count,
    frame_texture_format,
    frame_texture_chunk_count,
)
from hap_tpu.container.serialize import serialize_texture, serialize_frame

__all__ = [
    "read_section_header",
    "write_section_header",
    "legalize_chunk_count",
    "decode_instructions_length",
    "max_encoded_length_single",
    "max_encoded_length",
    "TexturePlan",
    "FramePlan",
    "parse_frame",
    "frame_texture_count",
    "frame_texture_format",
    "frame_texture_chunk_count",
    "serialize_texture",
    "serialize_frame",
]
