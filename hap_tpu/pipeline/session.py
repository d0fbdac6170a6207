"""Serving sessions: shape-specialized, GOP-batched encode/decode loops.

A session caches the jitted pipeline for one (H, W, codec, chunk_count)
configuration and drives it a GOP at a time with one host sync per batch —
the dispatch pattern bench.py measures (the per-sync cost through this
environment's device tunnel is ~30 ms, so per-frame dispatch would dominate
at 4K rates).

The reference leaves sequencing entirely to host applications (SURVEY.md
§3.5 — no train()/serve() exists); this is the framework's equivalent of
that caller-side lifecycle, TPU-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.pipeline.device_pipeline import (
    decode_pipeline,
    decode_pipeline_reasons,
    encode_pipeline,
    encode_pipeline_stats,
    roundtrip_pipeline,
)

# decode ok-reason columns (decode_frame_device with_reasons)
DECODE_REASONS = (
    "format_nibble", "compressor_known", "top_length", "tables", "chunks",
)


@dataclass(frozen=True)
class EncodeStats:
    """Per-frame encode observability (summed over texture sections).

    The reference exposes none of this; the underlying decisions are the
    per-chunk raw fallback (hap.c:460-466) and the whole-frame raw fallback
    (hap.c:478-482)."""

    frame_bytes: int  # emitted Hap frame length
    input_bytes: int  # DXT payload bytes across sections
    chunk_count: int  # chunks across sections
    snappy_chunks: int  # chunks that stayed snappy-compressed
    raw_chunk_fallbacks: int  # chunks stored raw (incompressible)
    whole_frame_raw_sections: int  # sections stored raw wholesale
    compression_ratio: float  # input_bytes / frame_bytes

    @staticmethod
    def from_rows(rows: np.ndarray, frame_len: int) -> "EncodeStats":
        """rows: (T, 6) int32 from encode_pipeline_stats."""
        rows = np.asarray(rows)
        input_bytes = int(rows[:, 0].sum())
        ccs = int(rows[:, 1].sum())
        snappy = int(rows[:, 2].sum())
        whole_raw = int(rows[:, 4].sum())
        # a wholly-raw section contributes no per-chunk fallbacks
        complex_ccs = int((rows[:, 1] * (1 - rows[:, 4])).sum())
        return EncodeStats(
            frame_bytes=int(frame_len),
            input_bytes=input_bytes,
            chunk_count=ccs,
            snappy_chunks=snappy,
            raw_chunk_fallbacks=complex_ccs - snappy,
            whole_frame_raw_sections=whole_raw,
            compression_ratio=input_bytes / max(int(frame_len), 1),
        )


class DeviceSession:
    """On-device codec session for a fixed frame shape."""

    def __init__(
        self,
        height: int,
        width: int,
        codec: str = "hap_q",
        chunk_count: int = 64,
        batch: int = 4,
        effort: str = "high",
    ):
        self.height, self.width = height, width
        self.codec = codec
        self.chunk_count = chunk_count
        self.batch = batch
        self.effort = effort

        @jax.jit
        def _encode_gop(frames):
            buf, flen = jax.lax.map(
                lambda f: encode_pipeline(f, codec, chunk_count, effort), frames
            )
            return buf, flen, jnp.sum(flen)

        @jax.jit
        def _decode_gop(frame_bufs):
            img, ok = jax.lax.map(
                lambda fb: decode_pipeline(fb, height, width, codec, chunk_count),
                frame_bufs,
            )
            return img, ok, jnp.sum(ok)

        @jax.jit
        def _roundtrip_gop(frames):
            out, flen, ok = jax.lax.map(
                lambda f: roundtrip_pipeline(f, codec, chunk_count, effort), frames
            )
            return out, flen, ok, jnp.sum(flen) + jnp.sum(ok)

        @jax.jit
        def _encode_gop_stats(frames):
            buf, flen, stats = jax.lax.map(
                lambda f: encode_pipeline_stats(f, codec, chunk_count, effort),
                frames,
            )
            return buf, flen, stats, jnp.sum(flen)

        @jax.jit
        def _decode_gop_reasons(frame_bufs):
            img, ok, reasons = jax.lax.map(
                lambda fb: decode_pipeline_reasons(
                    fb, height, width, codec, chunk_count
                ),
                frame_bufs,
            )
            return img, ok, reasons, jnp.sum(ok)

        self._encode_gop = _encode_gop
        self._decode_gop = _decode_gop
        self._roundtrip_gop = _roundtrip_gop
        self._encode_gop_stats = _encode_gop_stats
        self._decode_gop_reasons = _decode_gop_reasons

    def encode(self, frames) -> List[bytes]:
        """(B, H, W, C) pixels -> list of B Hap frame byte strings."""
        bufs, flens, checksum = self._encode_gop(jnp.asarray(frames))
        float(checksum)  # force execution (lazy-dispatch runtimes)
        bufs_np, flens_np = np.asarray(bufs), np.asarray(flens)
        return [bufs_np[i, : int(flens_np[i])].tobytes() for i in range(len(flens_np))]

    def decode(self, frame_buffers) -> Tuple[np.ndarray, np.ndarray]:
        """(B, fmax) uint8 device-padded frames -> ((B, H, W, C) pixels, ok)."""
        img, ok, checksum = self._decode_gop(jnp.asarray(frame_buffers))
        float(checksum)
        return np.asarray(img), np.asarray(ok)

    def decode_bytes(self, frames: List[bytes]) -> Tuple[np.ndarray, np.ndarray]:
        """List of Hap frame byte strings -> ((B, H, W, C) pixels, ok)."""
        fmax = max(len(f) for f in frames)
        padded = np.zeros((len(frames), fmax), np.uint8)
        for i, f in enumerate(frames):
            padded[i, : len(f)] = np.frombuffer(f, np.uint8)
        return self.decode(padded)

    def roundtrip(self, frames):
        out, flen, ok, checksum = self._roundtrip_gop(jnp.asarray(frames))
        float(checksum)
        return np.asarray(out), np.asarray(flen), np.asarray(ok)

    def encode_with_stats(
        self, frames
    ) -> Tuple[List[bytes], List[EncodeStats]]:
        """encode() + per-frame EncodeStats (compression ratio, per-chunk
        raw-fallback counts, whole-frame fallbacks)."""
        bufs, flens, stats, checksum = self._encode_gop_stats(jnp.asarray(frames))
        float(checksum)
        bufs_np, flens_np = np.asarray(bufs), np.asarray(flens)
        stats_np = np.asarray(stats)  # (B, T, 6)
        out = [
            bufs_np[i, : int(flens_np[i])].tobytes()
            for i in range(len(flens_np))
        ]
        return out, [
            EncodeStats.from_rows(stats_np[i], int(flens_np[i]))
            for i in range(len(flens_np))
        ]

    def decode_with_reasons(
        self, frame_buffers
    ) -> Tuple[np.ndarray, np.ndarray, List[dict]]:
        """decode() + per-frame dicts mapping DECODE_REASONS names to bools
        (per texture section: (T,) lists when multi-image)."""
        img, ok, reasons, checksum = self._decode_gop_reasons(
            jnp.asarray(frame_buffers)
        )
        float(checksum)
        reasons_np = np.asarray(reasons)  # (B, T, 5)
        dicts = [
            {
                name: [bool(x) for x in reasons_np[i, :, j]]
                for j, name in enumerate(DECODE_REASONS)
            }
            for i in range(reasons_np.shape[0])
        ]
        return np.asarray(img), np.asarray(ok), dicts
