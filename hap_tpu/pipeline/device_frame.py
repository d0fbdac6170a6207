"""On-device Hap container assembly/parse: the zero-host-roundtrip path.

Encodes a whole Hap frame (headers, decode-instructions tables, chunked
Snappy payload) as device arrays, so pixels -> frame bytes -> pixels never
leaves HBM. Byte semantics are identical to the host serializer
(container/serialize.py) and therefore to the reference encoder
(hap.c:355-504): same header-length rules, same per-chunk raw fallback, same
whole-frame fallback comparison, same fixed section order — a frame built
here is bit-identical to one built by the host stitcher around the same
per-chunk streams.

Parse side accepts this framework's layout (which is also precisely the
layout the reference encoder emits: DIC + compressor table + size table at
fixed offsets, no offset table) and validates as it goes; foreign-layout
frames flag not-ok and route to the host path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.constants import (
    CHUNK_COMPRESSOR_NONE,
    CHUNK_COMPRESSOR_SNAPPY,
    COMPRESSOR_COMPLEX,
    COMPRESSOR_NONE,
    SECTION_CHUNK_COMPRESSOR_TABLE,
    SECTION_CHUNK_SIZE_TABLE,
    SECTION_DECODE_INSTRUCTIONS,
    UINT24_MAX,
)
from hap_tpu.snappy.device import (
    _unit_layout,
    snappy_decode_chunks,
    snappy_encode_chunks,
)

_I32 = jnp.int32
_U8 = jnp.uint8


def _lz_enabled() -> bool:
    """Device snappy profile switch: the LZ encoder/decoder (round 5,
    real second-stage compression — snappy/device_lz.py) is the default;
    HAP_TPU_DEVICE_LZ=0 reverts to the r4 G-periodic RLE profile. Read at
    trace time — flip it before the first jit of a shape (same caveat as
    HAP_TPU_FRAME_DIRECT_DECODE)."""
    import os

    return os.environ.get("HAP_TPU_DEVICE_LZ", "1") == "1"


def _decode_chunk_streams(frame, pos, csizes, cis, S: int, G: int,
                          out_words: bool):
    """Frame-direct per-chunk stream decode under the active profile.

    LZ profile: raw chunks go through the structured kernel's tuned
    strided-copy path (the LZ walker's 1 KB literal steps are ~10x slower
    for bulk raw data — measured 9 ms on a natural 4K frame's 48 raw
    chunks) while compressed chunks go through the LZ element-run walker
    with raw chains dead; outputs merge per chunk."""
    from hap_tpu.snappy.pallas_kernels import decode_streams_from_frame

    if not _lz_enabled():
        return decode_streams_from_frame(
            frame, pos, csizes, cis, S, G, out_words=out_words)
    from hap_tpu.snappy.pallas_lz import decode_lz_streams_from_frame

    out_lz, ok_lz = decode_lz_streams_from_frame(
        frame, pos, csizes, cis, S, out_words=out_words, skip_raw=True)
    # the raw pass keeps the TRUE table sizes: its cursor advances S per
    # chunk and the final cursor==size check then rejects any chunk whose
    # size-table entry is not exactly S — e.g. a compressor byte flipped
    # from snappy to raw by corruption (a legitimate raw chunk always
    # stores exactly S bytes, hap.c:460-466). Feeding it S erased that
    # validation (caught by test_device_decode_fuzz).
    out_raw, ok_raw = decode_streams_from_frame(
        frame, pos, csizes,
        jnp.zeros_like(cis, jnp.bool_), S, G, out_words=out_words)
    out = jnp.where(cis[:, None], out_lz, out_raw)
    return out, jnp.where(cis, ok_lz, ok_raw)


def _encode_chunks(payload_2d, S: int, G: int, row_bytes: int, bound: int):
    """Per-chunk snappy streams under the active profile, padded to the
    layout bound: ((C, bound) u8, (C,) i32 comp_len)."""
    if _lz_enabled():
        from hap_tpu.snappy.device_lz import plan_lz
        from hap_tpu.snappy.pallas_lz import emit_lz_streams

        plan = plan_lz(payload_2d, S, G, row_bytes)
        comp = emit_lz_streams(
            payload_2d, plan.tables_lit, plan.tables_copy, plan.counts, S)
        comp_len = plan.comp_len
    else:
        comp, comp_len = snappy_encode_chunks(payload_2d, S, G)
    if comp.shape[1] < bound:
        comp = jnp.pad(comp, ((0, 0), (0, bound - comp.shape[1])))
    return comp[:, :bound], comp_len


def _u32le(x):
    """int32 scalar/array -> 4 little-endian uint8 lanes (last axis)."""
    x = x.astype(jnp.uint32)
    return jnp.stack(
        [x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF, (x >> 24) & 0xFF], axis=-1
    ).astype(_U8)


def _header4(section_length, section_type: int):
    b = _u32le(section_length.astype(jnp.int32) if hasattr(section_length, "astype") else jnp.asarray(section_length, _I32))
    return jnp.concatenate([b[..., :3], jnp.full(b.shape[:-1] + (1,), section_type, _U8)], axis=-1)


def _header8(section_length, section_type: int):
    zeros3 = jnp.zeros(3, _U8)
    t = jnp.full((1,), section_type, _U8)
    return jnp.concatenate([zeros3, t, _u32le(jnp.asarray(section_length, _I32))])


def frame_layout(input_bytes: int, chunk_count: int, G: int):
    """Static layout facts for a (input_bytes, chunk_count) frame.

    ``bound`` covers BOTH device snappy profiles (RLE and LZ) so the frame
    shape is independent of the HAP_TPU_DEVICE_LZ switch (a few hundred
    bytes per chunk of slack on the smaller profile)."""
    from hap_tpu.snappy.device_lz import lz_bound

    S = input_bytes // chunk_count
    dil = 5 * chunk_count + 8
    top_hdr = 8 if input_bytes > UINT24_MAX else 4
    if input_bytes + dil + 4 > UINT24_MAX:
        top_hdr = 8  # hap.c:425-428
    _, _, _, _, _, _, bound = _unit_layout(S, G)
    bound = max(bound, lz_bound(S))
    payload_off = top_hdr + 4 + dil
    fmax = payload_off + chunk_count * bound
    fmax = max(fmax, top_hdr + input_bytes)  # raw-fallback shape
    # +bound guard tail: decode's chunk-window reads never run past the
    # buffer, so device-encoded frames decode with zero re-pad copies.
    return S, dil, top_hdr, bound, payload_off, fmax + bound


def _le3_eq(frames, off: int, value: int):
    """frames (..., F) u8: 3-byte little-endian field at ``off`` == value."""
    b = frames[..., off : off + 3].astype(_I32)
    return (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)) == value


def _inner_headers_ok(frames, top_hdr: int, C: int, dil: int):
    """Validate the Decode Instructions / Compressor Table / Size Table
    section headers' declared LENGTHS (their type bytes are checked by the
    callers) — the reference cross-checks all three against the chunk count
    (hap.c:688-716)."""
    return (
        _le3_eq(frames, top_hdr, dil)
        & _le3_eq(frames, top_hdr + 4, C)
        & _le3_eq(frames, top_hdr + 8 + C, 4 * C)
    )


def _top_length_ok(frames, top_hdr, is_raw, input_bytes, dil, payload_total):
    """Validate the top section header's declared length against the actual
    content — the reference rejects sections extending past the buffer
    (hap.c:178-184). frames (..., F) u8; is_raw/payload_total broadcastable.

    Complex frames must declare 4 + dil + sum(chunk sizes); raw frames must
    declare input_bytes; the 8-byte form's leading 3 bytes must be zero.
    """
    b = frames[..., :8].astype(_I32)
    if top_hdr == 8:
        declared = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
        hdr_ok = (b[..., 0] == 0) & (b[..., 1] == 0) & (b[..., 2] == 0)
    else:
        declared = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
        hdr_ok = jnp.ones(frames.shape[:-1], jnp.bool_)
    expected = jnp.where(is_raw, input_bytes, 4 + dil + payload_total)
    return hdr_ok & (declared == expected)


def _assemble_frame(payload, comp, comp_len, chunk_count, fmt_id, G):
    """Container assembly around precomputed per-chunk snappy streams.

    payload (input_bytes,) u8, comp (C, >=bound) u8, comp_len (C,) i32 ->
    ((fmax,) u8 frame, frame_len). Shared by the single-frame and GOP
    encoders; byte semantics = hap.c:355-504 (see encode_frame_device).
    """
    input_bytes = payload.shape[0]
    C = chunk_count
    S, dil, top_hdr, bound, payload_off, fmax = frame_layout(input_bytes, C, G)
    chunks = payload.reshape(C, S)
    is_comp = comp_len < S  # per-chunk raw fallback (hap.c:460-466)
    emit_len = jnp.where(is_comp, comp_len, S)
    comp_byte = jnp.where(is_comp, CHUNK_COMPRESSOR_SNAPPY, CHUNK_COMPRESSOR_NONE).astype(_U8)
    positions = jnp.concatenate([jnp.zeros(1, _I32), jnp.cumsum(emit_len[:-1])])
    total_payload = positions[-1] + emit_len[-1]
    top_section_length = 4 + dil + total_payload
    use_complex = top_section_length < input_bytes + top_hdr  # hap.c:478-482

    # Observability (cheap scalars already live in this computation):
    # [snappy chunks emitted, payload bytes emitted, whole-frame raw fallback]
    stats = jnp.stack(
        [
            jnp.where(use_complex, jnp.sum(is_comp.astype(_I32)), 0),
            jnp.where(use_complex, total_payload, jnp.asarray(input_bytes, _I32)),
            (~use_complex).astype(_I32),
        ]
    )

    def _write_headers(frame):
        type_byte = (COMPRESSOR_COMPLEX << 4) | fmt_id
        hdr = (
            _header8(top_section_length, type_byte)
            if top_hdr == 8
            else _header4(top_section_length, type_byte)
        )
        frame = jax.lax.dynamic_update_slice(frame, hdr, (0,))
        frame = jax.lax.dynamic_update_slice(
            frame, _header4(jnp.asarray(dil, _I32), SECTION_DECODE_INSTRUCTIONS), (top_hdr,)
        )
        frame = jax.lax.dynamic_update_slice(
            frame, _header4(jnp.asarray(C, _I32), SECTION_CHUNK_COMPRESSOR_TABLE), (top_hdr + 4,)
        )
        frame = jax.lax.dynamic_update_slice(frame, comp_byte, (top_hdr + 8,))
        frame = jax.lax.dynamic_update_slice(
            frame, _header4(jnp.asarray(4 * C, _I32), SECTION_CHUNK_SIZE_TABLE), (top_hdr + 8 + C,)
        )
        return jax.lax.dynamic_update_slice(
            frame, _u32le(emit_len).reshape(-1), (top_hdr + 12 + C,)
        )

    Brows = (-(-bound // 128) + 7) // 8 * 8
    tcs = 8
    stitch_vmem = (2 * tcs * Brows + 2 * Brows + 16 + 8) * 128 * 4

    def build_complex_stitch(_):
        """Payload stitched by the streaming Pallas kernel (the lax.scan of
        C dynamic_update_slice steps costs ~30 us of latency per step)."""
        from hap_tpu.snappy.pallas_kernels import stitch_streams

        prow0 = (payload_off // 1024) * 8  # 8-row-aligned payload start
        hdr_len = prow0 * 128 + 1024
        hdr_buf = _write_headers(jnp.zeros(hdr_len, _U8))
        prefix = hdr_buf[prow0 * 128 :]

        raw_rows = jnp.pad(chunks, ((0, 0), (0, Brows * 128 - S)))
        comp_rows = jnp.pad(comp[:, :bound], ((0, 0), (0, Brows * 128 - bound)))
        streams = jnp.where(is_comp[:, None], comp_rows, raw_rows)
        qs = (payload_off - prow0 * 128) + positions
        out_rows = (
            -(-(fmax - prow0 * 128) // 128) + 7
        ) // 8 * 8 + 2 * Brows + 24  # final flush writes the whole stage
        out = stitch_streams(streams, qs, emit_len, prefix, out_rows)
        payload_bytes = out.astype(_U8).reshape(-1)
        frame = jnp.concatenate([hdr_buf[: prow0 * 128], payload_bytes])[:fmax]
        return frame, top_hdr + top_section_length

    def build_complex_scan(_):
        frame = _write_headers(jnp.zeros(fmax, _U8))

        # Payload: write each chunk's (bound-padded) stream at its position;
        # in-order writes let the next chunk overwrite the previous pad tail.
        def raw_chunk(c):
            if bound >= S:
                return jnp.pad(chunks[c], (0, bound - S))
            return chunks[c, :bound]

        def body(frame, c):
            stream_c = jnp.where(is_comp[c], comp[c, :bound], raw_chunk(c))
            frame = jax.lax.dynamic_update_slice(
                frame, stream_c, (payload_off + positions[c],)
            )
            return frame, None

        frame, _ = jax.lax.scan(body, frame, jnp.arange(C, dtype=_I32))
        return frame, top_hdr + top_section_length

    build_complex = (
        build_complex_stitch if stitch_vmem <= 15 << 20 else build_complex_scan
    )

    def build_raw(_):
        frame = jnp.zeros(fmax, _U8)
        type_byte = (COMPRESSOR_NONE << 4) | fmt_id
        hdr = (
            _header8(jnp.asarray(input_bytes, _I32), type_byte)
            if top_hdr == 8
            else _header4(jnp.asarray(input_bytes, _I32), type_byte)
        )
        frame = jax.lax.dynamic_update_slice(frame, hdr, (0,))
        frame = jax.lax.dynamic_update_slice(frame, payload, (top_hdr,))
        return frame, jnp.asarray(top_hdr + input_bytes, _I32)

    frame, frame_len = jax.lax.cond(use_complex, build_complex, build_raw, None)
    return frame, frame_len.astype(_I32), stats


@partial(jax.jit, static_argnames=("chunk_count", "fmt_id", "G", "row_bytes"))
def encode_frame_device(
    payload: jnp.ndarray, chunk_count: int, fmt_id: int, G: int,
    row_bytes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(input_bytes,) uint8 DXT payload -> ((fmax,) uint8 frame, frame_len).

    chunk_count must already be legal (container.plan.legalize_chunk_count).
    row_bytes (bytes per 4-pixel block row, G*W/4) seeds the LZ profile's
    vertical-match candidates; 0 keeps the block-multiple ladder only.
    """
    C = chunk_count
    S = payload.shape[0] // C
    bound = frame_layout(payload.shape[0], C, G)[3]
    comp, comp_len = _encode_chunks(payload.reshape(C, S), S, G, row_bytes, bound)
    frame, flen, _ = _assemble_frame(payload, comp, comp_len, C, fmt_id, G)
    return frame, flen


@partial(jax.jit, static_argnames=("chunk_count", "fmt_id", "G", "row_bytes"))
def encode_frame_device_stats(
    payload: jnp.ndarray, chunk_count: int, fmt_id: int, G: int,
    row_bytes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """encode_frame_device + a (3,) int32 stats vector:

    [snappy chunks emitted, payload bytes emitted (== input_bytes when the
    whole-frame raw fallback fired), whole-frame raw fallback (0/1)].
    Raw-fallback chunk count per frame = chunk_count - stats[0] for complex
    frames. These scalars already live in the assembly computation
    (hap.c:460-466 per-chunk and hap.c:478-482 whole-frame decisions).
    """
    C = chunk_count
    S = payload.shape[0] // C
    bound = frame_layout(payload.shape[0], C, G)[3]
    comp, comp_len = _encode_chunks(payload.reshape(C, S), S, G, row_bytes, bound)
    return _assemble_frame(payload, comp, comp_len, C, fmt_id, G)


@partial(jax.jit, static_argnames=("chunk_count", "fmt_id", "G", "row_bytes"))
def encode_frames_device(
    payloads: jnp.ndarray, chunk_count: int, fmt_id: int, G: int,
    row_bytes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GOP-batched encode: (B, input_bytes) -> ((B, fmax) frames, (B,) lens).

    All B*C chunks run through the snappy emission builder and the Pallas
    compaction kernel as ONE batch (one kernel grid instead of B sequential
    dispatches); only the cheap per-frame container assembly is mapped.
    Bytes are identical to encode_frame_device per frame.
    """
    B, input_bytes = payloads.shape
    C = chunk_count
    S = input_bytes // C
    bound = frame_layout(input_bytes, C, G)[3]
    comp, comp_len = _encode_chunks(
        payloads.reshape(B * C, S), S, G, row_bytes, bound)
    comp = comp.reshape(B, C, -1)
    comp_len = comp_len.reshape(B, C)

    def assemble(args):
        payload, comp_b, comp_len_b = args
        frame, flen, _ = _assemble_frame(payload, comp_b, comp_len_b, C, fmt_id, G)
        return frame, flen

    return jax.lax.map(assemble, (payloads, comp, comp_len))


@partial(
    jax.jit,
    static_argnames=(
        "input_bytes", "chunk_count", "fmt_id", "G", "out_words", "with_reasons",
    ),
)
def decode_frame_device(
    frame: jnp.ndarray,
    input_bytes: int,
    chunk_count: int,
    fmt_id: int,
    G: int,
    out_words: bool = False,
    with_reasons: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """((fmax,) uint8, static expectations) -> ((input_bytes,) uint8, ok).

    Accepts frames in the fixed layout both this framework and the reference
    encoder emit. ok=False (with best-effort output) for foreign layouts or
    non-structured snappy chunk streams — callers then use the host path.

    ``with_reasons`` appends a (5,) int32 vector decomposing ok (1 = passed):
    [format nibble matches, compressor nibble known, top section length
    valid, decode-instruction tables valid, all chunk streams decoded] —
    the same checks the reference performs at hap.c:993-1036 plus per-chunk
    stream validation, exposed per-frame for observability.

    ``out_words`` returns the payload as (input_bytes//4,) uint32 LE words
    instead of bytes: the frame-direct kernel packs them from its int32
    byte-lanes with shifts (~free), skipping the expensive uint8 bitcast
    relayout that the BCn decoders would otherwise pay to re-assemble words.
    """
    C = chunk_count
    S, dil, top_hdr, bound, payload_off, fmax = frame_layout(input_bytes, C, G)
    if frame.shape[0] < fmax:
        # fmax includes a +bound guard tail (frame_layout), so chunk-window
        # extraction can't run off the end; device frames skip this copy.
        frame = jnp.pad(frame, (0, fmax - frame.shape[0]))

    type_byte = frame[3]
    compressor = (type_byte >> 4) & 0xF
    fmt_ok = (type_byte & 0xF) == fmt_id
    ok = fmt_ok
    is_raw = compressor == COMPRESSOR_NONE
    is_complex = compressor == COMPRESSOR_COMPLEX

    def _to_words(payload_u8):
        from hap_tpu.kernels.layout import payload_to_words

        return payload_to_words(payload_u8)

    # Table parse (garbage for raw frames; overridden below).
    okc = frame[top_hdr + 3] == SECTION_DECODE_INSTRUCTIONS
    okc &= frame[top_hdr + 4 + 3] == SECTION_CHUNK_COMPRESSOR_TABLE
    okc &= frame[top_hdr + 8 + C + 3] == SECTION_CHUNK_SIZE_TABLE
    okc &= _inner_headers_ok(frame, top_hdr, C, dil)
    comp_table = jax.lax.dynamic_slice(frame, (top_hdr + 8,), (C,))
    size_bytes = jax.lax.dynamic_slice(frame, (top_hdr + 12 + C,), (4 * C,)).reshape(C, 4).astype(_I32)
    sizes = size_bytes[:, 0] | (size_bytes[:, 1] << 8) | (size_bytes[:, 2] << 16) | (size_bytes[:, 3] << 24)
    is_comp = comp_table == CHUNK_COMPRESSOR_SNAPPY
    okc &= jnp.all(is_comp | (comp_table == CHUNK_COMPRESSOR_NONE))
    okc &= jnp.all(sizes <= bound)
    sizes = jnp.minimum(sizes, bound)
    positions = payload_off + jnp.concatenate(
        [jnp.zeros(1, _I32), jnp.cumsum(sizes[:-1])]
    )
    top_len_ok = _top_length_ok(frame, top_hdr, is_raw, input_bytes, dil, jnp.sum(sizes))
    ok &= top_len_ok
    import os

    if os.environ.get("HAP_TPU_FRAME_DIRECT_DECODE", "1") == "1":
        # One unified kernel route: raw-stored frames (compressor None,
        # hap.c:478-495) become C raw chunks of size S at stride S — the
        # kernel's raw-unit path is exactly a strided copy, and it packs
        # out_words in-register (a host-side byte->word repack of a raw
        # payload costs a 32x-padded relayout at 16K sizes).
        raw_positions = top_hdr + jnp.arange(C, dtype=_I32) * S
        pos = jnp.where(is_raw, raw_positions, positions)
        csizes = jnp.where(is_raw, S, sizes)
        cis = jnp.where(is_raw, False, is_comp)
        out, chunk_ok = _decode_chunk_streams(
            frame, pos, csizes, cis, S, G, out_words)
        table_ok = jnp.where(is_raw, True, okc)
        chunks_ok = jnp.all(chunk_ok)
        okr = table_ok & chunks_ok
        ok_all = okr & ok & (is_raw | is_complex)
        if with_reasons:
            reasons = jnp.stack(
                [fmt_ok, is_raw | is_complex, top_len_ok, table_ok, chunks_ok]
            ).astype(_I32)
            return out.reshape(-1), ok_all, reasons
        return out.reshape(-1), ok_all

    if with_reasons:
        raise NotImplementedError(
            "with_reasons requires the frame-direct decode path "
            "(HAP_TPU_FRAME_DIRECT_DECODE=1, the default)"
        )

    def dec_raw(_):
        payload = jax.lax.dynamic_slice(frame, (top_hdr,), (input_bytes,))
        return (_to_words(payload) if out_words else payload), ok

    def dec_complex(_):
        def body(_, c):
            win = jax.lax.dynamic_slice(frame, (positions[c],), (bound,))
            return None, win

        _, windows = jax.lax.scan(body, None, jnp.arange(C, dtype=_I32))
        if _lz_enabled():
            from hap_tpu.snappy.pallas_lz import decode_lz_streams

            dec, chunk_ok = decode_lz_streams(windows, sizes, S)
        else:
            dec, chunk_ok = snappy_decode_chunks(windows, sizes, S, G)
        raw = windows[:, :S]
        out = jnp.where(is_comp[:, None], dec, raw)
        okd = ok & okc & jnp.all(chunk_ok | ~is_comp)
        out = out.reshape(-1)
        return (_to_words(out) if out_words else out), okd

    out, okr = jax.lax.cond(is_raw, dec_raw, dec_complex, None)
    return out, okr & (is_raw | is_complex)


@partial(
    jax.jit,
    static_argnames=("input_bytes", "chunk_count", "fmt_id", "G", "out_words"),
)
def decode_frames_device(
    frames: jnp.ndarray,
    input_bytes: int,
    chunk_count: int,
    fmt_id: int,
    G: int,
    out_words: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GOP-batched decode: (B, >=fmax) frames -> ((B, input_bytes[//4]), (B,) ok).

    All B*C chunks decode in ONE frame-direct Pallas grid over the flattened
    GOP buffer. Raw-stored frames (compressor None, hap.c:478-495) route
    through the same kernel as C raw chunks of size S at stride S — the
    kernel's raw-unit path is exactly a strided copy — so no per-frame cond
    is needed. Per-frame chunk tables are padded to the kernel's tile size so
    DMA tiles never span a frame boundary.
    """
    from hap_tpu.snappy.pallas_kernels import _TC, decode_streams_from_frame

    B = frames.shape[0]
    C = chunk_count
    S, dil, top_hdr, bound, payload_off, fmax = frame_layout(input_bytes, C, G)
    if frames.shape[1] < fmax:
        frames = jnp.pad(frames, ((0, 0), (0, fmax - frames.shape[1])))
    fstride = frames.shape[1]

    type_byte = frames[:, 3]
    compressor = (type_byte >> 4) & 0xF
    fmt_ok = (type_byte & 0xF) == fmt_id
    is_raw = compressor == COMPRESSOR_NONE
    is_complex = compressor == COMPRESSOR_COMPLEX

    # Batched table parse (static offsets; garbage for raw frames, unused).
    okc = frames[:, top_hdr + 3] == SECTION_DECODE_INSTRUCTIONS
    okc &= frames[:, top_hdr + 4 + 3] == SECTION_CHUNK_COMPRESSOR_TABLE
    okc &= frames[:, top_hdr + 8 + C + 3] == SECTION_CHUNK_SIZE_TABLE
    okc &= _inner_headers_ok(frames, top_hdr, C, dil)
    comp_table = frames[:, top_hdr + 8 : top_hdr + 8 + C]
    size_bytes = (
        frames[:, top_hdr + 12 + C : top_hdr + 12 + 5 * C]
        .reshape(B, C, 4)
        .astype(_I32)
    )
    sizes = (
        size_bytes[:, :, 0]
        | (size_bytes[:, :, 1] << 8)
        | (size_bytes[:, :, 2] << 16)
        | (size_bytes[:, :, 3] << 24)
    )
    is_comp = comp_table == CHUNK_COMPRESSOR_SNAPPY
    okc &= jnp.all(is_comp | (comp_table == CHUNK_COMPRESSOR_NONE), axis=1)
    okc &= jnp.all(sizes <= bound, axis=1)
    sizes = jnp.minimum(sizes, bound)
    positions = payload_off + jnp.concatenate(
        [jnp.zeros((B, 1), _I32), jnp.cumsum(sizes[:, :-1], axis=1)], axis=1
    )
    len_ok = _top_length_ok(
        frames, top_hdr, is_raw, input_bytes, dil, jnp.sum(sizes, axis=1)
    )

    raw_sel = is_raw[:, None]
    raw_positions = top_hdr + jnp.arange(C, dtype=_I32) * S
    pos = jnp.where(raw_sel, raw_positions[None, :], positions)
    csizes = jnp.where(raw_sel, S, sizes)
    cis_comp = jnp.where(raw_sel, False, is_comp)

    # Pad each frame's chunk list to a tile multiple (aliases of its last
    # chunk) so kernel tiles never span frames; padded rows are dropped.
    Cp = -(-C // _TC) * _TC
    if Cp != C:
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[:, -1:], (B, Cp - C))], axis=1
        )
        csizes = jnp.concatenate(
            [csizes, jnp.broadcast_to(csizes[:, -1:], (B, Cp - C))], axis=1
        )
        cis_comp = jnp.concatenate(
            [cis_comp, jnp.broadcast_to(cis_comp[:, -1:], (B, Cp - C))], axis=1
        )
    pos = pos + (jnp.arange(B, dtype=_I32) * fstride)[:, None]

    out, chunk_ok = _decode_chunk_streams(
        frames.reshape(-1),
        pos.reshape(-1),
        csizes.reshape(-1),
        cis_comp.reshape(-1),
        S,
        G,
        out_words,
    )
    w = out.shape[-1]
    out = out.reshape(B, Cp, w)[:, :C].reshape(B, C * w)
    ok = jnp.all(chunk_ok.reshape(B, Cp)[:, :C], axis=1)
    ok = fmt_ok & (is_raw | is_complex) & jnp.where(is_raw, True, okc) & len_ok & ok
    return out, ok
