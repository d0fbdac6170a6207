"""End-to-end encode/decode pipelines: pixels <-> Hap frames.

The reference library stops at DXT bytes (hap.h:89-90: callers supply
already-compressed texture data); this framework owns the whole path. The
block plane (layout, BCn, YCoCg) runs jitted on device; the byte plane
(Snappy, container stitching) runs in the native C++ runtime, chunk-parallel.
"""

from hap_tpu.pipeline.codecs import (
    CODECS,
    HapCodec,
    encode_frame,
    decode_frame,
    codec_for_frame,
)
from hap_tpu.pipeline.session import DeviceSession

__all__ = [
    "CODECS",
    "HapCodec",
    "encode_frame",
    "decode_frame",
    "codec_for_frame",
    "DeviceSession",
]
