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

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.pipeline.device_pipeline import (
    decode_pipeline,
    encode_pipeline,
    roundtrip_pipeline,
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

        self._encode_gop = _encode_gop
        self._decode_gop = _decode_gop
        self._roundtrip_gop = _roundtrip_gop

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
