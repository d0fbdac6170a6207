"""On-device decode of ARBITRARY legal Hap frames.

The zero-roundtrip pipeline (device_pipeline.py) parses/validates frames on
device but only accepts the fixed layout this framework and the reference
encoder emit, with structured-profile Snappy streams. This module covers
everything else — frames from the five ecosystem encoder applications
(reference README.md:24-30): offset tables present (hap.c:800-807), either
header form, any section order, per-chunk compressor mixes, and arbitrary
google/snappy output.

Division of labor: the host parses the container headers (a few hundred
bytes — container/parse.py, the total-function planner) and extracts the
per-chunk stream windows; all byte decompression (general Snappy kernel,
snappy/pallas_general.py) and all texture decoding run on device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY
from hap_tpu.snappy.pallas_general import decode_any_streams

_I32 = jnp.int32


@partial(jax.jit, static_argnames=("S_max", "total_bytes"))
def _decode_chunks_to_payload(
    comp: jnp.ndarray,  # (C, B >= S_max) uint8 chunk stream windows
    comp_len: jnp.ndarray,  # (C,) int32
    out_len: jnp.ndarray,  # (C,) int32 uncompressed sizes
    out_off: jnp.ndarray,  # (C,) int32 uncompressed offsets
    is_comp: jnp.ndarray,  # (C,) bool — Snappy chunk vs raw chunk
    S_max: int,
    total_bytes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk windows -> ((total_bytes,) uint8 payload, ok scalar)."""
    dec, ok = decode_any_streams(comp, comp_len, out_len, S_max)
    rows = jnp.where(is_comp[:, None], dec, comp[:, :S_max])
    ok_all = jnp.all(ok | ~is_comp)

    # Stitch rows at their uncompressed offsets. Chunks are written in
    # increasing-offset order, so each S_max-wide padded write is healed by
    # the next chunk's write (same idiom as encode_frame_device).
    order = jnp.argsort(out_off)
    buf = jnp.zeros(total_bytes + S_max, jnp.uint8)

    def body(buf, c):
        return jax.lax.dynamic_update_slice(buf, rows[c], (out_off[c],)), None

    buf, _ = jax.lax.scan(body, buf, order)
    return buf[:total_bytes], ok_all


def _texture_payload_device(frame_np: np.ndarray, tex) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract chunk windows on host, decompress on device.

    Returns ((decoded_bytes,) uint8 device payload, ok scalar).
    """
    C = tex.chunk_count
    csizes = np.asarray(tex.chunk_compressed_sizes, np.int64)
    usizes = np.asarray(tex.chunk_uncompressed_sizes, np.int64)
    S_max = int(usizes.max())
    B = max(int(csizes.max()), S_max)
    B = -(-B // 128) * 128
    comp = np.zeros((C, B), np.uint8)
    for i in range(C):
        off, n = int(tex.chunk_compressed_offsets[i]), int(csizes[i])
        comp[i, :n] = frame_np[off : off + n]
    is_comp = np.asarray(tex.chunk_compressors) == CHUNK_COMPRESSOR_SNAPPY
    return _decode_chunks_to_payload(
        jnp.asarray(comp),
        jnp.asarray(csizes, _I32),
        jnp.asarray(usizes, _I32),
        jnp.asarray(np.asarray(tex.chunk_uncompressed_offsets), _I32),
        jnp.asarray(is_comp),
        S_max,
        int(tex.decoded_bytes),
    )


def decode_frame_any(frame, height: int, width: int) -> Tuple[np.ndarray, bool]:
    """Decode any legal Hap frame to (H, W, C) pixels, textures on device.

    Returns (pixels, device_ok). device_ok is False only for streams the
    general kernel flagged malformed — the caller should then raise via the
    host path (pipeline/codecs.decode_frame), which reports the precise
    HapResult.
    """
    from hap_tpu.container.parse import parse_frame
    from hap_tpu.kernels.layout import pack_u8_to_u32
    from hap_tpu.pipeline.codecs import CODECS, _DECODERS, codec_for_frame

    frame = bytes(frame)
    spec = codec_for_frame(frame)
    plan = parse_frame(frame)
    frame_np = np.frombuffer(frame, np.uint8)

    images = []
    ok_all = True
    for index, fmt in enumerate(spec.texture_formats):
        payload, ok = _texture_payload_device(frame_np, plan.textures[index])
        ok_all = ok_all and bool(ok)
        dec, wpb = _DECODERS[fmt]
        words = pack_u8_to_u32(payload.reshape(-1, 4)).reshape(-1, wpb)
        images.append(np.asarray(dec(words, height, width)))

    if not spec.multi_texture:
        return images[0], ok_all
    color, alpha = images
    return np.concatenate([color, alpha[..., None]], axis=-1), ok_all
