"""Encode configuration with the reference's silent-legalization semantics.

The reference's only "config" is per-call arguments, and the chunk count is
a caller-supplied performance knob the library silently adjusts to a legal
value (hap.c:277-300) — the stored frame records the outcome. EncodeConfig
reproduces that rule exactly (it affects the bytes of encoded output) and
adds the TPU-side knobs (mesh axes, device/host byte plane).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from hap_tpu.constants import Compressor, TextureFormat
from hap_tpu.container.plan import dxt_payload_bytes, legalize_chunk_count
from hap_tpu.pipeline.codecs import CODECS


@dataclasses.dataclass(frozen=True)
class EncodeConfig:
    codec: str = "hap_q"
    chunk_count: int = 64  # requested; legalized per frame size (hap.c:277-300)
    compressor: Compressor = Compressor.SNAPPY
    byte_plane: str = "device"  # "device" | "native" | "python"
    effort: str = "high"  # BCn encoder effort: "fast" | "high" | "best" (see encode_frame)
    mesh_axes: Tuple[str, str] = ("data", "space")
    n_threads: int = 0  # native byte plane thread count (0 = all cores)

    def __post_init__(self):
        if self.codec not in CODECS:
            raise ValueError(f"unknown codec {self.codec!r}")
        if self.chunk_count < 1:
            raise ValueError("chunk_count must be >= 1")
        if self.byte_plane not in ("device", "native", "python"):
            raise ValueError(f"unknown byte plane {self.byte_plane!r}")
        if self.effort not in ("high", "fast", "best"):
            raise ValueError(f"unknown effort {self.effort!r}")

    @property
    def texture_formats(self) -> Tuple[TextureFormat, ...]:
        return CODECS[self.codec].texture_formats

    def legalized_chunk_count(self, height: int, width: int, texture_index: int = 0) -> int:
        """The chunk count that will actually be stored for a HxW frame —

        the silent adjustment the reference applies (hap.c:421)."""
        fmt = self.texture_formats[texture_index]
        nbytes = dxt_payload_bytes(width, height, fmt)
        return legalize_chunk_count(nbytes, fmt, self.chunk_count)
