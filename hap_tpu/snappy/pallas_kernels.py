"""Pallas TPU kernels for the structured-Snappy byte plane (wide units).

XLA's gather/scatter lowering costs ~8 ns per element on TPU, which caps
byte-shuffling at ~0.1 GB/s — hopeless for the compaction and cursor-walk at
the heart of a byte codec. These kernels move one full (8, 128) VPU tile
(4096 bytes = 4 tiles) per sequential step: unaligned dynamic multi-row VMEM loads and
stores plus dynamic lane rotates, all probed supported on this toolchain
(tools/probe_wideunit.py).

Mosaic constraints shape the design (probed on v5e):
* vector lane offsets must be static — byte-granular positioning is
  (dynamic multi-row slice) + (dynamic lane rotate) + (row-pair select);
* dynamic rotates work on int32 lanes (uint8 rotates crash the compiler) ->
  one byte per int32 lane inside the kernels, uint8<->int32 at the XLA
  boundary;
* no vector reductions inside kernels: validation mismatches accumulate
  into a per-chunk (1, 128) vector written to the ok output; the lane
  reduce happens in XLA after the kernel;
* scalars (positions, lengths, flags) live in SMEM; the combination of
  several SMEM operands + an SMEM output + a large DMA scratch miscompiles
  on this toolchain (worker crash; tools/bisect2.py) — so decode packs its
  metadata into ONE SMEM operand and returns ok via VMEM.

Kernels:
* compact_streams_from_data — encode-side: compose each unit's emission
  in-register from the raw payload and place it at its byte position in
  the chunk stream (read-modify-write row-window merges).
* decode_streams_from_frame — decode-side: DMA a tile's contiguous chunk
  range from the HBM frame into VMEM scratch, then walk the structured
  stream per chunk, one 4096-byte unit per step (profile: snappy/device.py).
* decode_streams — wrapper over decode_streams_from_frame for (C, B)
  per-chunk stream arrays.

Both fall back to interpret mode off-TPU (tests run them on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32

_TC = 8  # chunks per grid step (decode)
_UJ = 4  # interleaved chunk chains per decode loop iteration (divides _TC)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _lane128():
    return jax.lax.broadcasted_iota(_I32, (1, 128), 1)


def _read_at(ref, cursor, nrows):
    """Bytes [cursor, cursor + nrows*128) of a (rows, 128) byte-lane ref.

    One unaligned dynamic (nrows+1)-row load + one dynamic lane rotate +
    one row-pair select.
    """
    blk = cursor // 128
    r = cursor - blk * 128
    a = ref[pl.ds(blk, nrows + 1), :]
    rolled = pltpu.roll(a, jnp.where(r == 0, 0, 128 - r), 1)
    return jnp.where(_lane128() < 128 - r, rolled[:-1], rolled[1:])


def _shift_static(w, k, nrows):
    """(m,128) window at byte p -> (nrows,128) window at byte p+k, static k."""
    if k == 0:
        return w[:nrows]
    rolled = pltpu.roll(w, 128 - k, 1)
    return jnp.where(_lane128() < 128 - k, rolled[:nrows], rolled[1 : nrows + 1])


def _pat_rows(entries, pr: int = 1) -> np.ndarray:
    """Static validation patterns as a (2*n*pr, 128) int32 matrix.

    Each entry is a list of (offset, bytes) pieces spanning up to ``pr``
    128-byte rows; rows [i*pr, (i+1)*pr) hold entry i's expected values,
    rows n*pr+[i*pr, ...) its coverage mask. (Pallas kernels cannot capture
    vector constants — these are an input.)
    """
    n = len(entries)
    vals = np.zeros((n, pr * 128), np.int32)
    masks = np.zeros((n, pr * 128), np.int32)
    for i, pieces in enumerate(entries):
        for off, pat in pieces:
            assert off + len(pat) <= pr * 128, "pattern exceeds pr rows"
            vals[i, off : off + len(pat)] = pat
            masks[i, off : off + len(pat)] = 1
    return np.concatenate([vals, masks], axis=0).reshape(2 * n * pr, 128)


def _mismatch(w, pat_ref, n_pat: int, row: int, applicable, pr: int = 1) -> jnp.ndarray:
    """(1,128) int32: nonzero lanes where rows [0, pr) of ``w`` deviate from
    pattern ``row`` of the (pr-row) pattern matrix — only counted when
    ``applicable``."""
    vals = pat_ref[row * pr : (row + 1) * pr, :]
    mask = pat_ref[(n_pat + row) * pr : (n_pat + row + 1) * pr, :]
    bad = mask * (w[0:pr, :] != vals).astype(_I32)
    if pr > 1:
        bad = sum(bad[k : k + 1, :] for k in range(1, pr)) + bad[0:1, :]
    return jnp.where(applicable, bad, 0)


def _tile_g(row_g, g, nrows=8):
    """(1, G) int32 -> (nrows, 128) G-periodic tile."""
    row = jnp.concatenate([row_g] * (128 // g), axis=1)
    return jnp.broadcast_to(row, (nrows, 128))


def compact_fits_vmem(out_width: int, emit_max: int) -> bool:
    """True when the compaction kernel's output block fits scoped VMEM at
    tile width 8, assuming Mosaic double-buffers it (it does at long
    grids); callers fall back to the XLA scatter path otherwise (huge
    chunks, e.g. a 16K frame at tiny chunk counts)."""
    erows = -(-emit_max // 128)
    nblk_bytes = ((-(-out_width // 128) + erows + 9) // 8 * 8) * 128 * 4
    return 2 * 8 * nblk_bytes <= 15 << 20


def _shift_right(w, k: int):
    """(R, 128) window -> (R+1, 128) of the same bytes placed at byte +k
    (static k, 0 <= k < 128); leading k bytes and the final-row remainder
    are zero."""
    zrow = jnp.zeros((1, 128), _I32)
    if k == 0:
        return jnp.concatenate([w, zrow], axis=0)
    rolled = pltpu.roll(w, k, 1)
    a = jnp.concatenate([zrow, rolled], axis=0)
    b = jnp.concatenate([rolled, zrow], axis=0)
    return jnp.where(_lane128() >= k, b, a)


@functools.partial(jax.jit, static_argnames=("S", "G", "out_width"))
def compact_streams_from_data(
    data: jnp.ndarray,       # (C, S) uint8 chunk payloads
    positions: jnp.ndarray,  # (C, n_units) int32 byte offsets in the stream
    sizes: jnp.ndarray,      # (C, n_units) int32 emission sizes
    S: int,
    G: int,
    out_width: int,
) -> jnp.ndarray:
    """Encode-side stream compaction straight from the chunk payload.

    Grid = (chunk tiles, units). Each step composes unit u's emission
    in-register from the raw payload window — literal = [tag][4096 data
    bytes], run = the static copy/seed pattern (+ the G seed bytes for
    unit 0) — and merges it into the revisited per-tile output block at its
    byte position. The unit flavor is recovered from its emission size
    (sizes are distinct per flavor by construction, snappy/device.py).

    Replaces a pre-materialized (C, n_units, emit_max) emissions array:
    that form moved every payload byte through HBM twice more AND its
    in+out VMEM blocks overflowed the 16 MB scoped-VMEM limit at GOP batch
    sizes. Here the output block is revisited across the unit grid axis
    (one resident copy) and the input block is one unit window.
    """
    from hap_tpu.snappy.device import profile

    p = profile(S, G)
    U, n_full, tail = p.U, p.n_full, p.tail
    n_units = n_full + (1 if tail else 0)
    R = U // 128
    erows = -(-p.emit_max // 128)  # R + 1 (emit_max = U + 3-byte tag)
    assert erows == R + 1
    # 8 chunks per grid step. The output block (tc x nblk x 128 int32) is
    # the big VMEM tenant and Mosaic MAY double-buffer it depending on grid
    # length (observed: single-buffered at short grids, double at 16K-scale
    # grids), so the budget assumes 2 copies — tc=16 fits only
    # single-buffered and OOMs on large frames. compact_fits_vmem() gates
    # the caller onto the XLA path for chunk shapes too big even at tc=8.
    nblk_bytes = ((-(-out_width // 128) + erows + 9) // 8 * 8) * 128 * 4
    tc = 8
    assert compact_fits_vmem(out_width, p.emit_max), (
        f"chunk stream bound {out_width} too large for the compaction "
        "kernel's VMEM output block; use more chunks or impl='xla'"
    )
    C0 = data.shape[0]
    if C0 % tc:
        padc = tc - C0 % tc
        data = jnp.pad(data, ((0, padc), (0, 0)))
        positions = jnp.pad(positions, ((0, padc), (0, 0)))
        sizes = jnp.pad(sizes, ((0, padc), (0, 0)))
    C = data.shape[0]
    drows = n_units * R
    data_blocks = (
        jnp.pad(data, ((0, 0), (0, drows * 128 - S))).astype(_I32).reshape(C, drows, 128)
    )
    nblk = (-(-out_width // 128) + erows + 9) // 8 * 8
    meta = jnp.concatenate([positions, sizes], axis=1).astype(_I32)  # (C, 2n)

    # Pattern rows (values at their in-emission offsets): LIT/THDR tag bytes,
    # COPY / TRUN run patterns, SEED with a gap for the inserted seed bytes.
    k_full = p.lit_hdr
    k_tail = len(p.tail_hdr) if tail else k_full
    if tail and n_full:
        trun = [(0, p.tail_copy_pat)]
    elif tail and tail > G:
        trun = [(0, p.tail_seed_pat[:1]), (1 + G, p.tail_seed_pat[1:])]
    else:
        trun = []
    seed = [(0, p.seed_pat[:1]), (1 + G, p.seed_pat[1:])] if n_full else trun
    LIT, COPY, SEED, THDR, TRUN = range(5)
    entries = [
        [(0, np.asarray([61 << 2, (U - 1) & 0xFF, (U - 1) >> 8], np.uint8))],
        [(0, p.copy_pat)],
        seed,
        [(0, p.tail_hdr)] if tail else [],
        trun,
    ]
    PR = max(
        1,
        max(
            -(-int(off + len(pat)) // 128)
            for pieces in entries
            if pieces
            for off, pat in pieces
        ),
    )
    pats = _pat_rows(entries, PR)[: 5 * PR]  # values only, masks unused

    def kernel(meta_ref, data_ref, pat_ref, out_ref):
        u = pl.program_id(1)

        @pl.when(u == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane = _lane128()
        widx = (
            jax.lax.broadcasted_iota(_I32, (erows + 1, 128), 0) * 128
            + jax.lax.broadcasted_iota(_I32, (erows + 1, 128), 1)
        )
        is_tail = (u == n_units - 1) & bool(tail)
        is_first = u == 0
        zrows = jnp.zeros((erows - PR, 128), _I32)

        def place_unit(c):
            pos = meta_ref[c, u]
            size = meta_ref[c, n_units + u]
            d = data_ref[c]  # (R, 128) — unit u's payload window

            # Literal emission: data at byte +k with the tag bytes leading.
            lit = _shift_right(d, k_full)
            tag = pat_ref[LIT * PR, :]
            if tail and k_tail != k_full:
                lit_t = _shift_right(d, k_tail)
                lit = jnp.where(is_tail, lit_t, lit)
            if tail:
                tag = jnp.where(is_tail, pat_ref[THDR * PR, :], tag)
            k_sel = jnp.where(is_tail, k_tail, k_full)
            lit = jnp.concatenate(
                [jnp.where(lane < k_sel, tag[None, :], lit[:1]), lit[1:]], axis=0
            )

            # Run emission: static pattern rows; unit 0 inserts seed bytes.
            prow = jnp.where(is_tail, TRUN, jnp.where(is_first, SEED, COPY))
            run = pat_ref[pl.ds(prow * PR, PR), :]
            if n_full or (tail and tail > G):
                seed_ins = pltpu.roll(d[:1], 1, 1)
                run0 = jnp.where(
                    is_first & (lane >= 1) & (lane < 1 + G), seed_ins, run[:1]
                )
                run = jnp.concatenate([run0, run[1:]], axis=0)
            run = jnp.concatenate([run, zrows], axis=0)

            lit_size = jnp.where(is_tail, p.tail_lit_size, p.emit_max)
            e = jnp.where(size == lit_size, lit, run)

            blk = pos // 128
            r = pos - blk * 128
            er = pltpu.roll(e, r, 1)
            zrow = jnp.zeros((1, 128), _I32)
            placed = jnp.where(
                lane >= r,
                jnp.concatenate([er, zrow], axis=0),
                jnp.concatenate([zrow, er], axis=0),
            )
            m = (widx >= r) & (widx < r + size)
            cur = out_ref[c, pl.ds(blk, erows + 1), :]
            out_ref[c, pl.ds(blk, erows + 1), :] = jnp.where(m, placed, cur)

        for c in range(tc):
            place_unit(c)

    out = pl.pallas_call(
        kernel,
        grid=(C // tc, n_units),
        in_specs=[
            pl.BlockSpec(
                (tc, 2 * n_units), lambda i, u: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((tc, R, 128), lambda i, u: (i, u, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * PR, 128), lambda i, u: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tc, nblk, 128), lambda i, u: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, nblk, 128), _I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(meta, data_blocks, jnp.asarray(pats))
    return out.reshape(C, nblk * 128)[:C0, :out_width].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_rows",))
def stitch_streams(
    streams: jnp.ndarray,    # (C, Brows*128) uint8 — bound-padded chunk streams
    q_positions: jnp.ndarray,  # (C,) int32 — byte offsets in the OUTPUT region
    lengths: jnp.ndarray,    # (C,) int32 — true stream lengths
    prefix: jnp.ndarray,     # (8*128,) uint8 — output rows [0, 8) prefill
    out_rows: int,
) -> jnp.ndarray:
    """Ragged back-to-back concatenation of C streams at byte positions.

    Replaces the container-assembly lax.scan of per-chunk
    dynamic_update_slice ops (64 sequential XLA steps cost ~2 ms/frame at
    4K — pure per-step latency). Streaming design: chunks arrive in
    increasing position order; each is rolled to its byte offset and masked
    into a persistent VMEM stage; whenever a full F-row block is complete
    it DMAs to the HBM output at an 8-row-aligned offset and the stage
    shifts down. Bytes the streams don't cover stay zero (matching the
    zeros-initialized scan form bit-for-bit); the partial head row is never
    flushed early, so the next chunk's merge sees it.

    Returns (out_rows, 128) int32 byte lanes (the caller casts/reshapes).
    out_rows must be a multiple of 8 with >= SROWS rows of slack beyond the
    last byte (the final flush writes the whole stage).
    """
    C0, BW = streams.shape
    Brows = BW // 128
    assert BW % 128 == 0 and Brows % 8 == 0
    F = Brows  # flush block rows (multiple of 8)
    SROWS = 2 * F + 16
    assert out_rows % 8 == 0
    tcs = _TC
    if C0 % tcs:
        padc = tcs - C0 % tcs
        streams = jnp.pad(streams, ((0, padc), (0, 0)))
        tail_q = q_positions[-1] + lengths[-1]
        q_positions = jnp.concatenate(
            [q_positions, jnp.broadcast_to(tail_q, (padc,))]
        )
        lengths = jnp.pad(lengths, (0, padc))  # zero-length: writes nothing
    C = streams.shape[0]
    stream_blocks = streams.astype(_I32).reshape(C, Brows, 128)
    meta = jnp.stack([q_positions.astype(_I32), lengths.astype(_I32)], axis=1)
    prefix_block = prefix.astype(_I32).reshape(8, 128)
    n_tiles = C // tcs
    init = jnp.zeros((out_rows, 128), _I32)  # aliased: rows beyond the
    # final flush keep deterministic zeros (bit-identical to the scan form)

    def kernel(meta_ref, prefix_ref, stream_ref, init_ref, out_ref,
               base_ref, stage, sem):
        t = pl.program_id(0)
        lane = _lane128()
        widx = (
            jax.lax.broadcasted_iota(_I32, (Brows + 1, 128), 0) * 128
            + jax.lax.broadcasted_iota(_I32, (Brows + 1, 128), 1)
        )

        @pl.when(t == 0)
        def _init():
            stage[:] = jnp.zeros_like(stage)
            stage[0:8, :] = prefix_ref[:]
            base_ref[0] = 0

        def flush_if_full(head_row):
            # One F-row block; the partial head row stays staged so the
            # next chunk's merge sees it. Called twice per chunk: a chunk
            # adds up to F+1 rows, so two flush slots keep the staged span
            # <= F-1 rows at every chunk start (no creep across chunks).
            base = base_ref[0]

            @pl.when(head_row - base >= F)
            def _flush():
                dma = pltpu.make_async_copy(
                    stage.at[pl.ds(0, F), :], out_ref.at[pl.ds(base, F), :], sem
                )
                dma.start()
                dma.wait()
                # Shift live rows down (src [F, 2F) and dst [0, F) are
                # disjoint; live span after a flush is < F rows), then
                # zero the vacated region.
                stage[0:F, :] = stage[pl.ds(F, F), :]
                stage[F:SROWS, :] = jnp.zeros((SROWS - F, 128), _I32)
                base_ref[0] = base + F

        def place_chunk(c):
            q = meta_ref[c, 0]
            ln = meta_ref[c, 1]
            base = base_ref[0]
            row0 = q // 128 - base
            r = q - (q // 128) * 128
            s = stream_ref[c]  # (Brows, 128)
            rolled = pltpu.roll(s, r, 1)
            zrow = jnp.zeros((1, 128), _I32)
            placed = jnp.where(
                lane >= r,
                jnp.concatenate([rolled, zrow], axis=0),
                jnp.concatenate([zrow, rolled], axis=0),
            )
            m = (widx >= r) & (widx < r + ln)
            cur = stage[pl.ds(row0, Brows + 1), :]
            stage[pl.ds(row0, Brows + 1), :] = jnp.where(m, placed, cur)

            head_row = (q + ln) // 128
            flush_if_full(head_row)
            flush_if_full(head_row)

        for c in range(tcs):
            place_chunk(c)

        @pl.when(t == n_tiles - 1)
        def _final_flush():
            base = base_ref[0]
            dma = pltpu.make_async_copy(
                stage.at[pl.ds(0, SROWS), :],
                out_ref.at[pl.ds(base, SROWS), :],
                sem,
            )
            dma.start()
            dma.wait()

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tcs, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tcs, Brows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), _I32),
        scratch_shapes=[
            pltpu.SMEM((1,), _I32),
            pltpu.VMEM((SROWS, 128), _I32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=_interpret(),
    )(meta, prefix_block, stream_blocks, init)
    return out


@functools.partial(
    jax.jit, static_argnames=("S", "G", "out_words", "stride_span")
)
def decode_streams_from_frame(
    frame: jnp.ndarray,  # (F,) uint8 — whole frame bytes
    chunk_offsets: jnp.ndarray,  # (C,) int32 — absolute stream starts
    comp_len: jnp.ndarray,  # (C,) int32
    is_comp: jnp.ndarray,  # (C,) bool — snappy chunk vs raw chunk
    S: int,
    G: int,
    out_words: bool = False,
    stride_span: int | None = None,
):
    """Structured-profile decode straight out of the frame buffer.

    Each grid step DMAs its tile's contiguous byte range from the HBM frame
    into VMEM scratch (chunks are stored in order, so a tile's chunks are
    contiguous) and walks the streams there, one 4096-byte unit per step.
    Raw-fallback chunks (hap.c:460-466) are copied through in the same unit
    loop. Returns ((C, S) uint8, (C,) bool ok), or with ``out_words`` set
    ((C, S//4) uint32 little-endian words, (C,) bool ok) — packed from the
    kernel's int32 byte-lanes with shifts, which is ~free, while the
    uint8-cast + bitcast route costs ~15 ms per 4K frame.

    ``stride_span``: per-chunk storage stride when chunks are NOT packed
    back-to-back (the decode_streams wrapper stores them at stride B); the
    DMA window is sized to cover _TC strides.
    """
    from hap_tpu.snappy.device import profile

    p = profile(S, G)
    U, n_full, tail = p.U, p.n_full, p.tail
    P = len(p.pre)
    n_units_out = n_full + (1 if tail else 0)

    C0 = chunk_offsets.shape[0]
    if C0 % _TC:
        padc = _TC - C0 % _TC
        # Padded chunks alias the last real chunk's offset so their cursors
        # stay inside the tile's DMA window. Their length check fails ->
        # flagged not-ok -> rows sliced off.
        chunk_offsets = jnp.concatenate(
            [chunk_offsets, jnp.broadcast_to(chunk_offsets[-1], (padc,))]
        )
        comp_len = jnp.pad(comp_len, (0, padc))
        is_comp = jnp.pad(is_comp, (0, padc))
    C = chunk_offsets.shape[0]

    R = U // 128  # unit rows per sequential step
    # Tile scratch: worst-case span of _TC in-order chunks, +8 rows for the
    # downward 8-row alignment of the DMA start, +(R+4) rows of read guard
    # (every window read spans <= R+2 rows past the cursor). The row count
    # must be a multiple of 8: DMAs into a scratch with a ragged final
    # sublane tile crash the TPU worker (tools/bisect2.py case E).
    span = max(p.bound, stride_span or 0)
    tcb = ((_TC * span) // 128 + 8 + R + 4 + 7) // 8 * 8
    fblk = (-(-frame.shape[0] // 128) + tcb + 7) // 8 * 8
    frame_blocks = (
        jnp.pad(frame, (0, fblk * 128 - frame.shape[0])).astype(_I32).reshape(fblk, 128)
    )

    lit_tag = np.asarray([61 << 2, (U - 1) & 0xFF, (U - 1) >> 8], np.uint8)
    seed_tag0 = int(p.seed_pat[0])
    copy_tag0 = int(p.copy_pat[0])
    # Static validation patterns (values + masks) as one kernel input.
    PRE, LIT, COPY, SEED, THDR, TRUN = range(6)
    if tail and n_full:
        trun = [(0, p.tail_copy_pat)]
    elif tail and tail > G:
        trun = [(0, p.tail_seed_pat[:1]), (1 + G, p.tail_seed_pat[1:])]
    else:
        trun = []
    # Pattern rows: the longest pattern (full-unit copy run, 3U/64 bytes)
    # spans multiple 128-byte rows for U >= 4096.
    PR = max(1, -(-(len(p.copy_pat)) // 128), -(-(G + len(p.seed_pat)) // 128))
    pats = _pat_rows([
        [(0, p.pre)],
        [(0, lit_tag)],
        [(0, p.copy_pat)],
        [(0, p.seed_pat[:1]), (1 + G, p.seed_pat[1:])],
        [(0, p.tail_hdr)],
        trun,
    ], PR)
    n_pat = 6

    def kernel(meta_ref, frame_ref, pat_ref, out_ref, ok_ref, scratch, sem):
        # meta rows: [offset, comp_len, is_comp] per chunk, ONE SMEM operand
        # (see module docstring). DMA start 8-row aligned.
        base_blk = pl.multiple_of((meta_ref[0, 0] // 1024) * 8, 8)
        dma = pltpu.make_async_copy(
            frame_ref.at[pl.ds(base_blk, tcb), :], scratch, sem
        )
        dma.start()
        dma.wait()

        def decode_full_unit(c, is_raw, not_raw, u_is_first, cursor, prevg, bad, u):
            w = _read_at(scratch, cursor, R + 1)
            tag = w[0, 0]
            lit_unit = _shift_static(w, p.lit_hdr, R)
            raw_unit = w[0:R]
            if u_is_first:
                is_run = (tag == seed_tag0) & not_raw
                seed = _shift_static(w, 1, 1)[:, :G]
                run_unit = _tile_g(seed, G, R)
                bad += _mismatch(w, pat_ref, n_pat, SEED, is_run, PR)
                adv_run = p.seed_size
            else:
                is_run = (tag == copy_tag0) & not_raw
                run_unit = _tile_g(prevg, G, R)
                bad += _mismatch(w, pat_ref, n_pat, COPY, is_run, PR)
                adv_run = len(p.copy_pat)
            is_lit = not_raw & jnp.logical_not(is_run)
            bad += _mismatch(w, pat_ref, n_pat, LIT, is_lit, PR)
            unit = jnp.where(
                is_raw, raw_unit, jnp.where(is_run, run_unit, lit_unit)
            )
            out_ref[c, pl.ds(u * R, R), :] = unit
            prevg = unit[R - 1 : R, 128 - G :]
            cursor = cursor + jnp.where(
                is_raw, U, jnp.where(is_run, adv_run, p.emit_max)
            )
            return cursor, prevg, bad

        def decode_tail(c, is_raw, not_raw, cursor, prevg, bad):
            w = _read_at(scratch, cursor, R + 1)
            tag = w[0, 0]
            lit_unit = _shift_static(w, len(p.tail_hdr), R)
            if n_full:
                is_run = (tag == int(p.tail_copy_pat[0])) & not_raw
                run_unit = _tile_g(prevg, G, R)
                adv_run = len(p.tail_copy_pat)
            elif tail > G:
                is_run = (tag == seed_tag0) & not_raw
                seed = _shift_static(w, 1, 1)[:, :G]
                run_unit = _tile_g(seed, G, R)
                adv_run = p.tail_seed_size
            else:
                is_run = jnp.bool_(False)
                run_unit = lit_unit
                adv_run = 0
            bad += _mismatch(w, pat_ref, n_pat, TRUN, is_run, PR)
            is_lit = not_raw & jnp.logical_not(is_run)
            bad += _mismatch(w, pat_ref, n_pat, THDR, is_lit, PR)
            unit = jnp.where(
                is_raw, w[0:R], jnp.where(is_run, run_unit, lit_unit)
            )
            out_ref[c, pl.ds(n_full * R, R), :] = unit
            return cursor + jnp.where(
                is_raw, tail, jnp.where(is_run, adv_run, p.tail_lit_size)
            ), bad

        # J chunks are walked interleaved per group: each chunk's cursor
        # chain is a serial dependency, so issuing J independent chains per
        # loop iteration hides the chain latency behind vector work.
        def group_body(g, _):
            cs = [g * _UJ + j for j in range(_UJ)]
            offs = [meta_ref[c, 0] - base_blk * 128 for c in cs]
            clens = [meta_ref[c, 1] for c in cs]
            raws = [meta_ref[c, 2] == 0 for c in cs]
            nraws = [jnp.logical_not(r) for r in raws]

            # varint(S) preamble of compressed streams
            bads = [
                _mismatch(_read_at(scratch, off, PR), pat_ref, n_pat, PRE, nr, PR)
                for off, nr in zip(offs, nraws)
            ]
            cursors = [
                off + jnp.where(r, 0, P) for off, r in zip(offs, raws)
            ]
            prevgs = [jnp.zeros((1, G), _I32)] * _UJ

            if n_full:
                for j in range(_UJ):
                    cursors[j], prevgs[j], bads[j] = decode_full_unit(
                        cs[j], raws[j], nraws[j], True,
                        cursors[j], prevgs[j], bads[j], jnp.int32(0),
                    )

                def unit_body(u, carry):
                    out = []
                    for j in range(_UJ):
                        out.append(decode_full_unit(
                            cs[j], raws[j], nraws[j], False,
                            carry[3 * j], carry[3 * j + 1], carry[3 * j + 2], u,
                        ))
                    return tuple(x for trio in out for x in trio)

                flat = jax.lax.fori_loop(
                    1, n_full, unit_body,
                    tuple(
                        x
                        for j in range(_UJ)
                        for x in (cursors[j], prevgs[j], bads[j])
                    ),
                )
                cursors = [flat[3 * j] for j in range(_UJ)]
                prevgs = [flat[3 * j + 1] for j in range(_UJ)]
                bads = [flat[3 * j + 2] for j in range(_UJ)]

            for j in range(_UJ):
                if tail:
                    cursors[j], bads[j] = decode_tail(
                        cs[j], raws[j], nraws[j], cursors[j], prevgs[j], bads[j]
                    )
                bads[j] += (cursors[j] - offs[j] != clens[j]).astype(_I32)
                ok_ref[cs[j], :] = jnp.broadcast_to(bads[j], (1, 128))[0, :]
            return 0

        jax.lax.fori_loop(0, _TC // _UJ, group_body, 0)

    meta = jnp.stack(
        [chunk_offsets.astype(_I32), comp_len.astype(_I32), is_comp.astype(_I32)],
        axis=1,
    )  # (C, 3)
    out, badv = pl.pallas_call(
        kernel,
        grid=(C // _TC,),
        in_specs=[
            pl.BlockSpec((_TC, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (2 * n_pat * PR, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (_TC, n_units_out * R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((_TC, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, n_units_out * R, 128), _I32),
            jax.ShapeDtypeStruct((C, 128), _I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tcb, 128), _I32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(meta, frame_blocks, jnp.asarray(pats))
    ok = jnp.sum(badv[:C0], axis=1) == 0
    if out_words:
        assert S % 4 == 0
        y = out.reshape(C, n_units_out * (U // 4), 4).astype(jnp.uint32)
        words = y[..., 0] | (y[..., 1] << 8) | (y[..., 2] << 16) | (y[..., 3] << 24)
        return words[:C0, : S // 4], ok
    out = out.reshape(C, n_units_out * U)[:C0, :S].astype(jnp.uint8)
    return out, ok


@functools.partial(jax.jit, static_argnames=("S", "G"))
def decode_streams(
    comp: jnp.ndarray,  # (C, B) uint8 — structured snappy streams
    comp_len: jnp.ndarray,  # (C,) int32
    S: int,
    G: int,
):
    """Structured-profile decode: returns ((C, S) uint8, (C,) bool ok).

    Thin wrapper: lays the (C, B) streams out as one flat buffer at stride
    B and runs the frame-direct kernel over it.
    """
    C, B = comp.shape
    flat = comp.reshape(-1)
    offsets = jnp.arange(C, dtype=_I32) * B
    return decode_streams_from_frame(
        flat,
        offsets,
        comp_len.astype(_I32),
        jnp.ones((C,), jnp.bool_),
        S,
        G,
        stride_span=B,
    )
