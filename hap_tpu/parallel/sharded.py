"""Sharded codec pipelines over a device Mesh.

Three entry points:

* ``sharded_gop_encode``   — pure data parallelism: a GOP batch of frames,
  one-or-more frames per chip, zero communication (legal because every Hap
  frame is independently decodable, HapVideoDRAFT.md:29-32).
* ``sharded_spatial_encode`` — one (large) frame, its block stream striped
  across all chips (the 16K-frame story, README.md:25).
* ``make_train_step``       — the full dp x sp pipeline step used by
  __graft_entry__.dryrun_multichip: encode + decode with explicit
  shard_map collectives (all_gather of encoded words over the space axis,
  psum of distortion stats over the whole mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks
from hap_tpu.kernels.ycocg import cocgsy_to_rgb, rgb_to_cocgsy


def _block_fns(codec: str) -> Tuple[Callable, Callable, int, int]:
    """(encode_blocks, decode_blocks, channels, words_per_block) for a codec."""
    if codec == "hap":
        return (
            lambda b: bc1_encode_blocks(b),
            lambda w: bc1_decode_blocks(w)[0],
            3,
            2,
        )
    if codec == "hap_alpha":
        return bc3_encode_blocks, bc3_decode_blocks, 4, 4
    if codec == "hap_q":
        return (
            lambda b: bc3_encode_blocks(rgb_to_cocgsy(b)),
            lambda w: cocgsy_to_rgb(bc3_decode_blocks(w)),
            3,
            4,
        )
    if codec == "hap_alpha_only":
        return (
            lambda b: bc4_encode_blocks(b[..., 0]),
            lambda w: bc4_decode_blocks(w)[..., None],
            1,
            2,
        )
    raise ValueError(f"unknown codec {codec!r}")


def sharded_gop_encode(mesh: Mesh, codec: str = "hap_q") -> Callable:
    """Jitted (B, N, 16, C) uint8 -> (B, N, wpb) uint32, batch axis sharded

    over every mesh axis (pure DP over frames)."""
    enc, _, _, _ = _block_fns(codec)
    all_axes = tuple(mesh.axis_names)
    in_sharding = NamedSharding(mesh, P(all_axes))
    out_sharding = NamedSharding(mesh, P(all_axes))

    @partial(jax.jit, in_shardings=in_sharding, out_shardings=out_sharding)
    def fn(blocks):
        b, n = blocks.shape[0], blocks.shape[1]
        flat = blocks.reshape((b * n,) + blocks.shape[2:])
        return enc(flat).reshape(b, n, -1)

    return fn


def sharded_spatial_encode(mesh: Mesh, codec: str = "hap_q") -> Callable:
    """Jitted (N, 16, C) uint8 -> (N, wpb) uint32 for one frame, block axis

    striped across all chips (stripes == runs of chunks, hap.c:285-298)."""
    enc, _, _, _ = _block_fns(codec)
    all_axes = tuple(mesh.axis_names)
    sharding = NamedSharding(mesh, P(all_axes))

    @partial(jax.jit, in_shardings=sharding, out_shardings=sharding)
    def fn(blocks):
        return enc(blocks)

    return fn


def sharded_frame_roundtrip(
    mesh: Mesh, codec: str = "hap_q", chunk_count: int = 64
) -> Callable:
    """Full-pipeline GOP data parallelism: jitted (B, H, W, C) uint8 ->
    ((B, H, W, C) decoded, (B,) frame_len, (B,) ok), the batch axis sharded
    over every mesh axis. Each chip runs the complete on-device pipeline
    (pixels -> BCn -> snappy -> container -> back) on its local frames —
    zero communication, legal because every Hap frame is independently
    decodable (HapVideoDRAFT.md:29-32). This is the serving configuration
    BASELINE.md's scaling metric measures.
    """
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

    all_axes = tuple(mesh.axis_names)
    spec = P(all_axes)

    def local(frames):
        # lax.map per frame, not the batched GOP formulation: measured 13.0
        # vs 27.0 ms/frame at 4K on v5e (tools/profile_roundtrip_ab.py) —
        # XLA pipelines the sequential per-frame program better than it
        # schedules the frame-batched one on this toolchain.
        return jax.lax.map(
            lambda f: roundtrip_pipeline(f, codec, chunk_count), frames
        )

    sharded = shard_map(
        local, mesh=mesh, in_specs=spec, out_specs=(spec,) * 3, check_vma=False
    )
    return jax.jit(sharded)


def sharded_spatial_roundtrip(
    mesh: Mesh, height: int, width: int, codec: str = "hap_q",
    chunk_count: int = 64,
) -> Callable:
    """ONE frame spatially sharded across all mesh devices, full pipeline.

    The 4x4-block stream is striped over the flattened mesh; chunk
    boundaries align to stripes (each device owns a run of chunks,
    hap.c:285-298 guarantees chunks divide the block stream). Each device
    BCn-encodes and snappy-compresses its own chunks, the per-chunk streams
    ride an ICI all_gather, and every device assembles the identical
    container (bit-identical to the single-device encode_pipeline frame).
    Decode mirrors it: each device decodes its chunk range straight out of
    the replicated frame buffer and the decoded stripes form the image.
    This is the 16K-frame configuration of BASELINE.md (config 5).

    Returns jitted ``rt(blocks) -> (decoded_blocks, frame, frame_len, ok)``
    with ``blocks`` (N, 16, C) uint8 striped over the mesh; use
    kernels.layout.image_to_blocks / blocks_to_image around it.
    """
    from hap_tpu.constants import (
        CHUNK_COMPRESSOR_SNAPPY,
        COMPRESSOR_COMPLEX,
        COMPRESSOR_NONE,
        CONSTANT_TO_FORMAT_ID,
        TextureFormat,
        bytes_per_block,
    )
    from hap_tpu.container.plan import dxt_payload_bytes, legalize_chunk_count
    from hap_tpu.kernels.layout import words_to_payload
    from hap_tpu.pipeline.device_frame import _assemble_frame, frame_layout
    from hap_tpu.snappy.device import snappy_encode_chunks
    from hap_tpu.snappy.pallas_kernels import decode_streams_from_frame

    fmt = {
        "hap": TextureFormat.RGB_DXT1,
        "hap_alpha": TextureFormat.RGBA_DXT5,
        "hap_q": TextureFormat.YCoCg_DXT5,
        "hap_alpha_only": TextureFormat.A_RGTC1,
    }[codec]
    enc, dec, channels, wpb = _block_fns(codec)
    g = bytes_per_block(fmt)
    fmt_id = CONSTANT_TO_FORMAT_ID[fmt]
    nbytes = dxt_payload_bytes(width, height, fmt)
    cc = legalize_chunk_count(nbytes, fmt, chunk_count)
    D = mesh.size
    assert cc % D == 0, f"chunk count {cc} must divide over {D} devices"
    S, dil, top_hdr, bound, payload_off, fmax = frame_layout(nbytes, cc, g)
    axes = tuple(mesh.axis_names)

    def local(blocks_stripe):
        # Encode my stripe: blocks -> words -> payload -> my chunk streams.
        words = enc(blocks_stripe)  # (N/D, wpb)
        payload = words_to_payload(words)
        comp, comp_len = snappy_encode_chunks(payload.reshape(cc // D, S), S, g)

        # Assemble the container from the gathered streams (every device
        # holds the identical frame; the gathers ride ICI).
        payload_all = jax.lax.all_gather(payload, axes, axis=0, tiled=True)
        comp_all = jax.lax.all_gather(comp, axes, axis=0, tiled=True)
        len_all = jax.lax.all_gather(comp_len, axes, axis=0, tiled=True)
        frame, flen, _ = _assemble_frame(payload_all, comp_all, len_all, cc, fmt_id, g)

        # Decode my chunk range straight from the frame bytes.
        msizes = mesh.devices.shape
        d = sum(
            jax.lax.axis_index(a) * int(np.prod(msizes[i + 1 :], dtype=int))
            for i, a in enumerate(axes)
        )
        compressor = (frame[3].astype(jnp.int32) >> 4) & 0xF
        is_raw_frame = compressor == COMPRESSOR_NONE
        ok = ((frame[3].astype(jnp.int32) & 0xF) == fmt_id) & (
            is_raw_frame | (compressor == COMPRESSOR_COMPLEX)
        )
        comp_table = jax.lax.dynamic_slice(frame, (top_hdr + 8,), (cc,))
        size_bytes = jax.lax.dynamic_slice(
            frame, (top_hdr + 12 + cc,), (4 * cc,)
        ).reshape(cc, 4).astype(jnp.int32)
        sizes = (
            size_bytes[:, 0] | (size_bytes[:, 1] << 8)
            | (size_bytes[:, 2] << 16) | (size_bytes[:, 3] << 24)
        )
        sizes = jnp.minimum(sizes, bound)
        positions = payload_off + jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(sizes[:-1])]
        )
        from hap_tpu.pipeline.device_frame import _top_length_ok

        ok &= _top_length_ok(frame, top_hdr, is_raw_frame, nbytes, dil, jnp.sum(sizes))
        raw_positions = top_hdr + jnp.arange(cc, dtype=jnp.int32) * S
        pos = jnp.where(is_raw_frame, raw_positions, positions)
        csizes = jnp.where(is_raw_frame, S, sizes)
        cis = jnp.where(
            is_raw_frame, False, comp_table == CHUNK_COMPRESSOR_SNAPPY
        )
        lo = d * (cc // D)
        my_pos = jax.lax.dynamic_slice(pos, (lo,), (cc // D,))
        my_sizes = jax.lax.dynamic_slice(csizes, (lo,), (cc // D,))
        my_is = jax.lax.dynamic_slice(cis, (lo,), (cc // D,))
        dec_words, chunk_ok = decode_streams_from_frame(
            frame, my_pos, my_sizes, my_is, S, g, out_words=True
        )
        ok &= jnp.all(chunk_ok)
        # ok differs per device (each validated its own chunks): reduce to a
        # genuinely replicated scalar before the P() out_spec.
        ok = jax.lax.psum(jnp.logical_not(ok).astype(jnp.int32), axes) == 0
        out_blocks = dec(dec_words.reshape(-1, wpb))
        return out_blocks, frame, flen, ok

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axes),
        out_specs=(P(axes), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_train_step(mesh: Mesh, codec: str = "hap_q") -> Callable:
    """Full pipeline step over a ("data", "space") mesh with explicit

    collectives. Input blocks (B, N, 16, C) uint8; B % data == 0,
    N % space == 0.

    Returns jitted ``step(blocks) -> (words, sse)`` where words (B, N, wpb)
    is the encoded stream (all_gather'ed over "space" so every data-row chip
    holds its frames' full streams, ready for host stitching) and sse is the
    mesh-wide psum of squared reconstruction error (the quality metric the
    serving path monitors).
    """
    enc, dec, channels, wpb = _block_fns(codec)

    def local_step(local_blocks):
        # local_blocks: (b, n, 16, C) — this chip's frame rows x block stripe
        b, n = local_blocks.shape[0], local_blocks.shape[1]
        flat = local_blocks.reshape((b * n,) + local_blocks.shape[2:])
        words = enc(flat)  # (b*n, wpb)
        decoded = dec(words)
        err = decoded.astype(jnp.float32) - flat.astype(jnp.float32)
        sse = jax.lax.psum(jnp.sum(err * err), ("data", "space"))
        words = words.reshape(b, n, wpb)
        # Assemble each frame's full encoded stream across the space axis
        # (ICI all_gather; the host stitches chunks from this).
        gathered = jax.lax.all_gather(words, "space", axis=1, tiled=True)
        return gathered, sse

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=P("data", "space"),
        out_specs=(P("data", None), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
