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


def _hap_q_encode_blocks(b):
    """(N, 16, 3) RGB blocks -> hap_q words via the SAME lane-major planar
    chain as device_pipeline._encode_blocks — the spatial-sharding
    bit-identity guarantee requires identical jaxpr ops, and the blocks
    transpose produces exactly image_to_block_planes' array."""
    from hap_tpu.kernels.bc1 import bc1_encode_planes
    from hap_tpu.kernels.bc4 import bc4_encode_planes
    from hap_tpu.kernels.ycocg import rgb_to_cocgs_y_planes

    cocgs_p, y_p = rgb_to_cocgs_y_planes(b.transpose(2, 1, 0))
    return jnp.concatenate(
        [bc4_encode_planes(y_p), bc1_encode_planes(cocgs_p)], axis=1)


def _hap_alpha_encode_blocks(b):
    from hap_tpu.kernels.bc1 import bc1_encode_planes
    from hap_tpu.kernels.bc4 import bc4_encode_planes

    p = b.transpose(2, 1, 0)
    return jnp.concatenate(
        [bc4_encode_planes(p[3]), bc1_encode_planes(p[:3])], axis=1)


def _block_fns(codec: str) -> Tuple[Callable, Callable, int, int]:
    """(encode_blocks, decode_blocks, channels, words_per_block) for a codec.

    Encoders mirror device_pipeline._encode_blocks' planar formulations
    exactly (bit-identity across sharded and single-device pipelines)."""
    if codec == "hap":
        from hap_tpu.kernels.bc1 import bc1_encode_planes

        return (
            lambda b: bc1_encode_planes(b.transpose(2, 1, 0)),
            lambda w: bc1_decode_blocks(w)[0],
            3,
            2,
        )
    if codec == "hap_alpha":
        return _hap_alpha_encode_blocks, bc3_decode_blocks, 4, 4
    if codec == "hap_q":
        return (
            _hap_q_encode_blocks,
            lambda w: cocgsy_to_rgb(bc3_decode_blocks(w)),
            3,
            4,
        )
    if codec == "hap_alpha_only":
        from hap_tpu.kernels.bc4 import bc4_encode_planes

        return (
            lambda b: bc4_encode_planes(b[..., 0].T),
            lambda w: bc4_decode_blocks(w)[..., None],
            1,
            2,
        )
    if codec == "hap_r":
        from hap_tpu.kernels.bc7 import bc7_decode_blocks, bc7_encode_blocks

        return bc7_encode_blocks, bc7_decode_blocks, 4, 4
    if codec in ("hap_hdr", "hap_hdr_signed"):
        from hap_tpu.kernels.bc6h import (
            bc6h_decode_blocks,
            bc6h_encode_blocks_adaptive,
            f32_to_half_bits,
            half_bits_to_f32,
        )

        signed = codec == "hap_hdr_signed"
        return (
            lambda b: bc6h_encode_blocks_adaptive(
                f32_to_half_bits(b.astype(jnp.float32)), signed=signed),
            lambda w: half_bits_to_f32(bc6h_decode_blocks(w, signed=signed)),
            3,
            4,
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


_SPATIAL_FMT = {
    "hap": "RGB_DXT1",
    "hap_alpha": "RGBA_DXT5",
    "hap_q": "YCoCg_DXT5",
    "hap_alpha_only": "A_RGTC1",
    "hap_r": "RGBA_BPTC_UNORM",
    "hap_hdr": "RGB_BPTC_UNSIGNED_FLOAT",
    "hap_hdr_signed": "RGB_BPTC_SIGNED_FLOAT",
}


def _device_index(mesh: Mesh, axes) -> jnp.ndarray:
    msizes = mesh.devices.shape
    return sum(
        jax.lax.axis_index(a) * int(np.prod(msizes[i + 1:], dtype=int))
        for i, a in enumerate(axes)
    )


def _spatial_texture_encode(mesh, axes, blocks_stripe, enc, cc, cpd, S, g,
                            fmt_id, row_bytes=0):
    """Encode my stripe of one texture and assemble the replicated section.

    blocks_stripe covers cpd chunks' blocks (tail slots past cc, present
    when cc % D != 0, hold padding blocks whose streams are discarded).
    Returns (frame, flen) — the full single-texture section, identical on
    every device (the per-chunk stream gathers ride ICI).
    """
    from hap_tpu.kernels.layout import words_to_payload
    from hap_tpu.pipeline.device_frame import (
        _assemble_frame,
        _encode_chunks,
        frame_layout,
    )

    D = mesh.size
    words = enc(blocks_stripe)
    payload = words_to_payload(words)
    # profile-aware (LZ / RLE) emission, padded to the layout bound —
    # _assemble_frame's stitch expects stream rows at exactly that width.
    # row_bytes must match the single-device pipeline's (g*W/4) so the LZ
    # candidate set — and therefore the container bytes — stay identical.
    bound = frame_layout(S * cc, cc, g)[3]
    comp, comp_len = _encode_chunks(
        payload.reshape(cpd, S), S, g, row_bytes, bound)
    payload_all = jax.lax.all_gather(payload, axes, axis=0, tiled=True)
    comp_all = jax.lax.all_gather(comp, axes, axis=0, tiled=True)
    len_all = jax.lax.all_gather(comp_len, axes, axis=0, tiled=True)
    if cpd * D != cc:  # drop padding chunk slots (gather order == global id)
        payload_all = payload_all[: cc * S]
        comp_all = comp_all[:cc]
        len_all = len_all[:cc]
    return _assemble_frame(payload_all, comp_all, len_all, cc, fmt_id, g)


def _spatial_texture_decode(mesh, axes, frame, dec, cc, cpd, S, g, wpb,
                            nbytes, fmt_id, top_hdr, dil, bound, payload_off):
    """Decode my chunk range of one texture section from the replicated
    frame. Tail slots past cc decode a harmless raw span and are cropped by
    the caller. Returns (my decoded blocks, my ok)."""
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY, COMPRESSOR_COMPLEX, COMPRESSOR_NONE
    from hap_tpu.pipeline.device_frame import _top_length_ok
    from hap_tpu.snappy.pallas_kernels import decode_streams_from_frame

    d = _device_index(mesh, axes)
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
    ok &= _top_length_ok(frame, top_hdr, is_raw_frame, nbytes, dil,
                         jnp.sum(sizes))
    raw_positions = top_hdr + jnp.arange(cc, dtype=jnp.int32) * S
    pos = jnp.where(is_raw_frame, raw_positions, positions)
    csizes = jnp.where(is_raw_frame, S, sizes)
    cis = jnp.where(is_raw_frame, False, comp_table == CHUNK_COMPRESSOR_SNAPPY)
    D = mesh.size
    if cpd * D != cc:
        # pad chunk tables so every device slices cpd slots; tail slots
        # decode a raw span at the payload start (garbage, cropped later)
        padn = cpd * D - cc
        pos = jnp.concatenate([pos, jnp.full(padn, top_hdr, jnp.int32)])
        csizes = jnp.concatenate([csizes, jnp.full(padn, S, jnp.int32)])
        cis = jnp.concatenate([cis, jnp.zeros(padn, bool)])
    lo = d * cpd
    my_pos = jax.lax.dynamic_slice(pos, (lo,), (cpd,))
    my_sizes = jax.lax.dynamic_slice(csizes, (lo,), (cpd,))
    my_is = jax.lax.dynamic_slice(cis, (lo,), (cpd,))
    dec_words, chunk_ok = decode_streams_from_frame(
        frame, my_pos, my_sizes, my_is, S, g, out_words=True
    )
    ok &= jnp.all(chunk_ok)
    return dec(dec_words.reshape(-1, wpb)), ok


def _spatial_layout(codec_fmt, height, width, chunk_count, D):
    from hap_tpu.constants import CONSTANT_TO_FORMAT_ID, bytes_per_block
    from hap_tpu.container.plan import dxt_payload_bytes, legalize_chunk_count
    from hap_tpu.pipeline.device_frame import frame_layout

    g = bytes_per_block(codec_fmt)
    nbytes = dxt_payload_bytes(width, height, codec_fmt)
    cc = legalize_chunk_count(nbytes, codec_fmt, chunk_count)
    cpd = -(-cc // D)  # ceil: cc % D lifted via padding chunk slots
    S, dil, top_hdr, bound, payload_off, fmax = frame_layout(nbytes, cc, g)
    return dict(g=g, nbytes=nbytes, cc=cc, cpd=cpd, S=S, dil=dil,
                top_hdr=top_hdr, bound=bound, payload_off=payload_off,
                fmax=fmax, fmt_id=CONSTANT_TO_FORMAT_ID[codec_fmt])


def sharded_spatial_roundtrip(
    mesh: Mesh, height: int, width: int, codec: str = "hap_q",
    chunk_count: int = 64,
) -> Callable:
    """ONE frame spatially sharded across all mesh devices, full pipeline,
    for EVERY codec family (incl. the multi-texture hap_q_alpha and the
    BC7/BC6H families — the reference's chunk fan-out is format-agnostic,
    hap.c:852-862).

    The 4x4-block stream is striped over the flattened mesh; chunk
    boundaries align to stripes (chunks divide the block stream,
    hap.c:285-298). When the legalized chunk count does not divide the
    device count, devices own ceil(cc/D) chunk slots and the tail slots
    carry padding blocks (their streams are dropped before assembly; their
    decodes are cropped) — the emitted container stays BIT-IDENTICAL to
    the single-device encode_pipeline frame. Each device BCn-encodes and
    snappy-compresses its own chunks, the per-chunk streams ride an ICI
    all_gather, every device assembles the identical container, then
    decodes its own chunk range back out of it. This is the 16K-frame
    configuration of BASELINE.md (config 5).

    Returns jitted ``rt(blocks) -> (decoded_blocks, frame, frame_len, ok)``
    with ``blocks`` (N_pad, 16, C) striped over the mesh, where
    N_pad = rt.blocks_padded (pad with zeros; decoded blocks crop to the
    real N). Use kernels.layout.image_to_blocks / blocks_to_image around
    it. For hap_q_alpha, blocks are the RGBA 4x4 blocks; the color and
    alpha sections share chunk geometry (same block count -> identical
    legalized cc).
    """
    from hap_tpu.constants import TextureFormat

    D = mesh.size
    axes = tuple(mesh.axis_names)

    if codec == "hap_q_alpha":
        return _sharded_spatial_multi(mesh, height, width, chunk_count)

    fmt = getattr(TextureFormat, _SPATIAL_FMT[codec])
    enc, dec, channels, wpb = _block_fns(codec)
    L = _spatial_layout(fmt, height, width, chunk_count, D)
    q = L["S"] // L["g"]  # blocks per chunk

    def local(blocks_stripe):
        frame, flen, _ = _spatial_texture_encode(
            mesh, axes, blocks_stripe, enc, L["cc"], L["cpd"], L["S"],
            L["g"], L["fmt_id"], row_bytes=L["g"] * width // 4)
        out_blocks, ok = _spatial_texture_decode(
            mesh, axes, frame, dec, L["cc"], L["cpd"], L["S"], L["g"], wpb,
            L["nbytes"], L["fmt_id"], L["top_hdr"], L["dil"], L["bound"],
            L["payload_off"])
        # ok differs per device (each validated its own chunks): reduce to
        # a genuinely replicated scalar before the P() out_spec.
        ok = jax.lax.psum(jnp.logical_not(ok).astype(jnp.int32), axes) == 0
        return out_blocks, frame, flen, ok

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axes),
        out_specs=(P(axes), P(), P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def fn(blocks):
        return jitted(blocks)

    fn.blocks_padded = L["cpd"] * D * q
    return fn


def _sharded_spatial_multi(mesh: Mesh, height: int, width: int,
                           chunk_count: int) -> Callable:
    """hap_q_alpha spatially sharded: both texture sections are striped
    over the same RGBA block stream (identical chunk geometry — the
    legalization rule depends only on the block count), gathered, and
    wrapped in the 0x0D container on every device (bit-identical to
    encode_pipeline); decode mirrors per-texture."""
    from hap_tpu.constants import TextureFormat, UINT24_MAX
    from hap_tpu.container.plan import decode_instructions_length, dxt_payload_bytes
    from hap_tpu.pipeline.device_pipeline import _wrap_multi_image, plan_chunks

    D = mesh.size
    axes = tuple(mesh.axis_names)
    fmts = (TextureFormat.YCoCg_DXT5, TextureFormat.A_RGTC1)
    enc1, dec1, _, wpb1 = _block_fns("hap_q")
    enc2, dec2, _, wpb2 = _block_fns("hap_alpha_only")
    L1 = _spatial_layout(fmts[0], height, width, chunk_count, D)
    L2 = _spatial_layout(fmts[1], height, width, chunk_count, D)
    assert L1["cc"] == L2["cc"] and L1["cpd"] == L2["cpd"]
    q = L1["S"] // L1["g"]

    # child-section offsets inside the 0x0D wrapper (static worst case,
    # hap.c:562-576; mirrors _decode_multi_image)
    worst = sum(
        dxt_payload_bytes(width, height, f)
        + decode_instructions_length(plan_chunks(height, width, f, chunk_count))
        + 4
        for f in fmts
    )
    top_hdr = 8 if worst > UINT24_MAX else 4

    def local(blocks_stripe):
        f1, l1, _ = _spatial_texture_encode(
            mesh, axes, blocks_stripe[..., :3], enc1, L1["cc"], L1["cpd"],
            L1["S"], L1["g"], L1["fmt_id"], row_bytes=L1["g"] * width // 4)
        f2, l2, _ = _spatial_texture_encode(
            mesh, axes, blocks_stripe[..., 3:4], enc2, L2["cc"], L2["cpd"],
            L2["S"], L2["g"], L2["fmt_id"], row_bytes=L2["g"] * width // 4)
        frame, flen = _wrap_multi_image(
            height, width, fmts, chunk_count, f1, l1, f2, l2)

        ok = frame[3] == 0x0D
        child1 = jax.lax.dynamic_slice(
            jnp.pad(frame, (0, L1["fmax"])), (jnp.int32(top_hdr),),
            (L1["fmax"],))
        b1, ok1 = _spatial_texture_decode(
            mesh, axes, child1, dec1, L1["cc"], L1["cpd"], L1["S"], L1["g"],
            wpb1, L1["nbytes"], L1["fmt_id"], L1["top_hdr"], L1["dil"],
            L1["bound"], L1["payload_off"])
        child2 = jax.lax.dynamic_slice(
            jnp.pad(frame, (0, L2["fmax"])), (top_hdr + l1,), (L2["fmax"],))
        b2, ok2 = _spatial_texture_decode(
            mesh, axes, child2, dec2, L2["cc"], L2["cpd"], L2["S"], L2["g"],
            wpb2, L2["nbytes"], L2["fmt_id"], L2["top_hdr"], L2["dil"],
            L2["bound"], L2["payload_off"])
        out_blocks = jnp.concatenate([b1, b2], axis=-1)
        ok = ok & ok1 & ok2
        ok = jax.lax.psum(jnp.logical_not(ok).astype(jnp.int32), axes) == 0
        return out_blocks, frame, flen, ok

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axes),
        out_specs=(P(axes), P(), P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def fn(blocks):
        return jitted(blocks)

    fn.blocks_padded = L1["cpd"] * D * q
    return fn


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
