"""Snappy second-stage codec implementations.

Three interoperating implementations of the Snappy format (normative for Hap
per HapVideoDRAFT.md:23-24; format spec = google/snappy format_description):

* ``hap_tpu.snappy.pyref``  — pure-Python reference codec (test oracle).
* ``hap_tpu.native``        — C++ codec behind ctypes (production byte plane).
* ``hap_tpu.snappy.device`` — on-device decode via op-table + gathers.

Decode is deterministic so all implementations are bit-exact on decode;
encoders emit conforming (not necessarily identical) streams.
"""

from hap_tpu.snappy.format import (
    read_varint,
    write_varint,
    uncompressed_length,
    max_compressed_length,
)
from hap_tpu.snappy.pyref import compress, decompress

__all__ = [
    "read_varint",
    "write_varint",
    "uncompressed_length",
    "max_compressed_length",
    "compress",
    "decompress",
]
