"""Pallas TPU kernels for the structured-Snappy byte plane.

XLA's gather/scatter lowering costs ~8 ns per element on TPU, which caps
byte-shuffling at ~0.1 GB/s — hopeless for the compaction and cursor-walk at
the heart of a byte codec. These kernels use what the hardware does well:
lane-aligned VMEM vector loads/stores plus dynamic lane rotates
(``pltpu.roll``), with sequential per-chunk unit loops.

Mosaic constraints shape the design (probed on v5e):
* vector accesses must be 128-lane aligned, and dynamic *lane* offsets are
  rejected even when provably aligned — so streams live as (chunk, block,
  128) refs and every byte-granular access is: dynamic middle-dim indexing
  of two adjacent 128-lane blocks + dynamic rotate + masked merge;
* dynamic rotates work on int32 lanes (uint8 rotates crash the compiler) ->
  one byte per int32 lane inside the kernels, uint8<->int32 at the XLA
  boundary;
* scalars (positions, lengths, flags) live in SMEM.

Kernels:
* compact_streams — encode-side: place each unit's emission at its byte
  position in the chunk stream (in-order writes; each padded 128-byte store
  is healed by the next unit's store).
* decode_streams  — decode-side: walk the structured tag stream per chunk
  (copy2(offset=G,len=U) or one literal per unit), validating as it goes.

Both fall back to interpret mode off-TPU (tests run them on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32

_WPAD = 256  # padded emission width (lanes == bytes)
_TC = 8  # chunks per grid step


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _lane256():
    return jax.lax.broadcasted_iota(_I32, (1, 256), 1)


def _to_blocks(x: jnp.ndarray, guard_blocks: int = 2) -> jnp.ndarray:
    """(C, B) uint8 -> (C, nblk, 128) int32 with trailing guard blocks."""
    C, B = x.shape
    nblk = -(-B // 128) + guard_blocks
    x = jnp.pad(x, ((0, 0), (0, nblk * 128 - B)))
    return x.astype(_I32).reshape(C, nblk, 128)


@functools.partial(jax.jit, static_argnames=("out_width",))
def compact_streams(
    emissions: jnp.ndarray,  # (C, n_units, _WPAD) uint8; true bytes lead
    positions: jnp.ndarray,  # (C, n_units) int32 byte offsets in the stream
    out_width: int,
) -> jnp.ndarray:
    """Scatter-free stream compaction: returns (C, out_width) uint8."""
    C0, n_units, w = emissions.shape
    assert w == _WPAD
    if C0 % _TC:
        padc = _TC - C0 % _TC
        emissions = jnp.pad(emissions, ((0, padc), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, padc), (0, 0)))
    C = emissions.shape[0]
    emissions = emissions.astype(_I32)
    nblk = -(-out_width // 128) + 3

    def kernel(pos_ref, emit_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def chunk_body(c, _):
            def unit_body(u, _):
                p = pos_ref[c, u]
                blk = p // 128
                r = p - blk * 128
                e = emit_ref[c, u, :].reshape(1, _WPAD)
                e512 = jnp.concatenate(
                    [e, jnp.zeros((1, 512 - _WPAD), _I32)], axis=1
                )
                rot = pltpu.roll(e512, r, 1)[:, :384]
                lane = jax.lax.broadcasted_iota(_I32, (1, 384), 1)
                mask = (lane >= r) & (lane < r + _WPAD)
                win = jnp.concatenate(
                    [out_ref[c, blk, :].reshape(1, 128),
                     out_ref[c, blk + 1, :].reshape(1, 128),
                     out_ref[c, blk + 2, :].reshape(1, 128)], axis=1
                )
                merged = jnp.where(mask, rot, win)
                out_ref[c, blk, :] = merged[0, :128]
                out_ref[c, blk + 1, :] = merged[0, 128:256]
                out_ref[c, blk + 2, :] = merged[0, 256:]
                return 0

            return jax.lax.fori_loop(0, n_units, unit_body, 0)

        jax.lax.fori_loop(0, _TC, chunk_body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(C // _TC,),
        in_specs=[
            pl.BlockSpec((_TC, n_units), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TC, n_units, _WPAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TC, nblk, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nblk, 128), _I32),
        interpret=_interpret(),
    )(positions, emissions)
    return out.reshape(C, nblk * 128)[:C0, :out_width].astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "G", "preamble_len", "copy_tag", "lit_tag", "lit_hdr", "out_words"
    ),
)
def decode_streams_from_frame(
    frame: jnp.ndarray,  # (F,) uint8 — whole frame bytes
    chunk_offsets: jnp.ndarray,  # (C,) int32 — absolute stream starts
    comp_len: jnp.ndarray,  # (C,) int32
    is_comp: jnp.ndarray,  # (C,) bool — snappy chunk vs raw chunk
    S: int,
    G: int,
    preamble_len: int,
    copy_tag: int,
    lit_tag: int,
    lit_hdr: int,
    out_words: bool = False,
):
    """Structured-profile decode straight out of the frame buffer.

    Avoids materializing per-chunk (C, bound) windows (a C-step extraction
    scan costs ~18 ms at 4K): each grid step DMAs its tile's contiguous
    byte range from the HBM frame into VMEM scratch (chunks are stored in
    order, so a tile's chunks are contiguous) and walks the streams there.
    Raw-fallback chunks (hap.c:460-466) are copied through in the same unit
    loop. Returns ((C, S) uint8, (C,) bool ok), or with ``out_words`` set
    ((C, S//4) uint32 little-endian words, (C,) bool ok) — packed from the
    kernel's int32 byte-lanes with shifts, which is ~free, while the
    uint8-cast + bitcast route costs ~15 ms per 4K frame
    (tools/profile_pack_variants.py).
    """
    from hap_tpu.snappy.device import _UNIT

    C0 = chunk_offsets.shape[0]
    U = _UNIT
    n_full = S // U
    tail = S - n_full * U
    emit = U + lit_hdr
    n_copy_elems = max(1, U // 64)
    copy_size = 3 * n_copy_elems
    # bound on one chunk's stream size (all-literal)
    bound = preamble_len + n_full * emit + (tail + 2 if tail else 0)

    if C0 % _TC:
        padc = _TC - C0 % _TC
        # Padded chunks alias the last real chunk's offset so their cursors
        # stay inside the tile's DMA window (offset 0 would make
        # start-base negative -> out-of-bounds VMEM access). Their length
        # check fails -> flagged not-ok -> rows sliced off.
        chunk_offsets = jnp.concatenate(
            [chunk_offsets, jnp.broadcast_to(chunk_offsets[-1], (padc,))]
        )
        comp_len = jnp.pad(comp_len, (0, padc))
        is_comp = jnp.pad(is_comp, (0, padc))
    C = chunk_offsets.shape[0]

    # Tile scratch: worst-case span of _TC in-order chunks + rotate guard.
    # +8 because the HBM DMA start row is rounded down to the (8,128) tile
    # granularity of the int32 layout; the row count itself must also be a
    # multiple of 8 — DMAs into a scratch with a ragged final sublane tile
    # crash the TPU worker (tools/bisect2.py case E: 77 rows).
    tcb = ((_TC * bound) // 128 + 4 + 8 + 7) // 8 * 8
    fblk = (-(-frame.shape[0] // 128) + tcb + 7) // 8 * 8
    frame_blocks = (
        jnp.pad(frame, (0, fblk * 128 - frame.shape[0])).astype(_I32).reshape(fblk, 128)
    )
    nout = -(-S // 128) + 1

    def kernel(meta_ref, frame_ref, out_ref, ok_ref, scratch, sem):
        # meta rows: [offset, comp_len, is_comp] per chunk. Packed into ONE
        # SMEM operand and ok returned via VMEM: the combination of several
        # SMEM operands + an SMEM output + a large DMA scratch miscompiles
        # on this toolchain (worker crash; see tools/bisect2.py).
        # Align the DMA start to the sublane-tile granularity (8 rows).
        base_blk = pl.multiple_of((meta_ref[0, 0] // 1024) * 8, 8)
        dma = pltpu.make_async_copy(
            frame_ref.at[pl.ds(base_blk, tcb), :], scratch, sem
        )
        dma.start()
        dma.wait()

        def read_window(cursor):
            blk = cursor // 128
            r = cursor - blk * 128
            win = jnp.concatenate(
                [scratch[blk, :].reshape(1, 128),
                 scratch[blk + 1, :].reshape(1, 128),
                 scratch[blk + 2, :].reshape(1, 128),
                 jnp.zeros((1, 128), _I32)], axis=1
            )
            shift = jnp.where(r == 0, 0, 512 - r)
            return pltpu.roll(win, shift, 1)

        def chunk_body(c, _):
            start = meta_ref[c, 0] - base_blk * 128
            is_raw = meta_ref[c, 2] == 0

            def unit_body(u, carry):
                cursor, okc, prevg = carry
                win = read_window(cursor)
                tag = win[0, 0]
                is_copy = (tag == copy_tag) & jnp.logical_not(is_raw)
                copy_ok = tag == copy_tag
                for e in range(n_copy_elems):
                    copy_ok = (
                        copy_ok
                        & (win[0, 3 * e] == copy_tag)
                        & (win[0, 3 * e + 1] == (G & 0xFF))
                        & (win[0, 3 * e + 2] == (G >> 8))
                    )
                lit_ok = tag == lit_tag
                if lit_hdr == 2:
                    lit_ok = lit_ok & (win[0, 1] == (U - 1))
                okc = okc & (
                    is_raw | jnp.where(is_copy, copy_ok & (u > 0), lit_ok)
                )
                lit = win[:, lit_hdr : lit_hdr + U]
                cp = jnp.concatenate([prevg] * (U // G), axis=1)
                unit = jnp.where(is_copy, cp, jnp.where(is_raw, win[:, :U], lit))
                prevg = unit[:, U - G :]
                out_ref[c, u, :] = unit[0, :]
                cursor = cursor + jnp.where(
                    is_raw, U, jnp.where(is_copy, copy_size, emit)
                )
                return cursor, okc, prevg

            # Validate the varint(S) preamble of compressed streams.
            from hap_tpu.snappy.device import _varint_bytes

            pre_vals = _varint_bytes(S)
            win0 = read_window(start)
            pre_ok = jnp.bool_(True)
            for i, pv in enumerate(pre_vals):
                pre_ok = pre_ok & (win0[0, i] == int(pv))
            ok0 = is_raw | pre_ok

            cursor0 = start + jnp.where(is_raw, 0, preamble_len)
            cursor, okc, prevg = jax.lax.fori_loop(
                0, n_full, unit_body, (cursor0, ok0, jnp.zeros((1, G), _I32))
            )
            if tail:
                win = read_window(cursor)
                if tail - 1 < 60:
                    thdr = 1
                    tag_ok = win[0, 0] == ((tail - 1) << 2)
                else:
                    thdr = 2
                    tag_ok = (win[0, 0] == (60 << 2)) & (win[0, 1] == tail - 1)
                okc = okc & (is_raw | tag_ok)
                th = jnp.where(is_raw, 0, thdr)
                twin = read_window(cursor + th)
                tail_padded = jnp.concatenate(
                    [twin[:, :tail], jnp.zeros((1, U - tail), _I32)], axis=1
                )
                out_ref[c, n_full, :] = tail_padded[0, :]
                cursor = cursor + th + tail
            okc = okc & (cursor - start == meta_ref[c, 1])
            ok_ref[c, :] = jnp.full((128,), okc.astype(_I32), _I32)
            return 0

        jax.lax.fori_loop(0, _TC, chunk_body, 0)

    n_units_out = n_full + (1 if tail else 0)
    meta = jnp.stack(
        [
            chunk_offsets.astype(_I32),
            comp_len.astype(_I32),
            is_comp.astype(_I32),
        ],
        axis=1,
    )  # (C, 3)
    out, ok = pl.pallas_call(
        kernel,
        grid=(C // _TC,),
        in_specs=[
            pl.BlockSpec((_TC, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((_TC, n_units_out, U), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, n_units_out, U), _I32),
            jax.ShapeDtypeStruct((C, 128), _I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tcb, 128), _I32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(meta, frame_blocks)
    if out_words:
        assert S % 4 == 0 and U % 4 == 0
        y = out.reshape(C, n_units_out * U // 4, 4).astype(jnp.uint32)
        words = y[..., 0] | (y[..., 1] << 8) | (y[..., 2] << 16) | (y[..., 3] << 24)
        return words[:C0, : S // 4], (ok[:C0, 0] != 0)
    out = out.reshape(C, n_units_out * U)[:C0, :S].astype(jnp.uint8)
    return out, (ok[:C0, 0] != 0)


@functools.partial(
    jax.jit, static_argnames=("S", "G", "preamble_len", "copy_tag", "lit_tag", "lit_hdr")
)
def decode_streams(
    comp: jnp.ndarray,  # (C, B) uint8 — structured snappy streams
    comp_len: jnp.ndarray,  # (C,) int32
    S: int,
    G: int,
    preamble_len: int,
    copy_tag: int,
    lit_tag: int,
    lit_hdr: int,
):
    """Structured-profile decode: returns ((C, S) uint8, (C,) bool ok)."""
    from hap_tpu.snappy.device import _UNIT

    C0, B = comp.shape
    U = _UNIT
    n_full = S // U
    tail = S - n_full * U
    emit = U + lit_hdr
    per_store = 128 // U  # units per aligned output store
    assert 128 % U == 0

    if C0 % _TC:
        padc = _TC - C0 % _TC
        comp = jnp.pad(comp, ((0, padc), (0, 0)))
        comp_len = jnp.pad(comp_len, (0, padc))
    C = comp.shape[0]
    comp_blocks = _to_blocks(comp, guard_blocks=3)  # (C, nin, 128) int32
    nin = comp_blocks.shape[1]
    nout = -(-S // 128) + 1

    n_copy_elems = max(1, U // 64)
    copy_size = 3 * n_copy_elems

    def kernel(len_ref, comp_ref, out_ref, ok_ref):
        def read_window(c, cursor):
            blk = cursor // 128
            r = cursor - blk * 128
            win = jnp.concatenate(
                [comp_ref[c, blk, :].reshape(1, 128),
                 comp_ref[c, blk + 1, :].reshape(1, 128),
                 comp_ref[c, blk + 2, :].reshape(1, 128),
                 jnp.zeros((1, 128), _I32)], axis=1
            )
            shift = jnp.where(r == 0, 0, 512 - r)
            return pltpu.roll(win, shift, 1)  # byte `cursor` at lane 0

        def chunk_body(c, _):
            def unit_body(u, carry):
                cursor, okc, prevg, pending = carry
                win = read_window(c, cursor)
                tag = win[0, 0]
                is_copy = tag == copy_tag
                copy_ok = tag == copy_tag
                for e in range(n_copy_elems):
                    copy_ok = (
                        copy_ok
                        & (win[0, 3 * e] == copy_tag)
                        & (win[0, 3 * e + 1] == (G & 0xFF))
                        & (win[0, 3 * e + 2] == (G >> 8))
                    )
                lit_ok = tag == lit_tag
                if lit_hdr == 2:
                    lit_ok = lit_ok & (win[0, 1] == (U - 1))
                okc = okc & jnp.where(is_copy, copy_ok & (u > 0), lit_ok)
                lit = win[:, lit_hdr : lit_hdr + U]
                cp = jnp.concatenate([prevg] * (U // G), axis=1)
                unit = jnp.where(is_copy, cp, lit)  # (1, U)
                prevg = unit[:, U - G :]
                # Stage into the 128-lane pending register; flush when full.
                if per_store == 1:
                    pending = unit
                else:
                    slot = jax.lax.rem(u, per_store)
                    lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)
                    unit_wide = jnp.concatenate(
                        [unit, jnp.zeros((1, 128 - U), _I32)], axis=1
                    )
                    placed = pltpu.roll(unit_wide, slot * U, 1)
                    sel = (lane128 >= slot * U) & (lane128 < (slot + 1) * U)
                    pending = jnp.where(sel, placed, pending)

                @pl.when(jax.lax.rem(u, per_store) == per_store - 1)
                def _():
                    out_ref[c, u // per_store, :] = pending[0, :]

                cursor = cursor + jnp.where(is_copy, copy_size, emit)
                return cursor, okc, prevg, pending

            carry0 = (
                jnp.int32(preamble_len),
                jnp.bool_(True),
                jnp.zeros((1, G), _I32),
                jnp.zeros((1, 128), _I32),
            )
            cursor, okc, prevg, pending = jax.lax.fori_loop(
                0, n_full, unit_body, carry0
            )

            # Flush a partial final store (when n_full % per_store != 0).
            if n_full % per_store:
                out_ref[c, n_full // per_store, :] = pending[0, :]

            if tail:
                win = read_window(c, cursor)
                if tail - 1 < 60:
                    thdr = 1
                    okc = okc & (win[0, 0] == ((tail - 1) << 2))
                else:
                    thdr = 2
                    okc = okc & (win[0, 0] == (60 << 2)) & (win[0, 1] == tail - 1)
                base = n_full * U
                blk = base // 128  # static
                r = base - blk * 128  # static
                pieces = []
                if r:
                    pieces.append(jnp.zeros((1, r), _I32))
                pieces.append(win[:, thdr : thdr + tail])
                if 256 - r - tail:
                    pieces.append(jnp.zeros((1, 256 - r - tail), _I32))
                tail_vec = jnp.concatenate(pieces, axis=1)
                lane = _lane256()
                mask = (lane >= r) & (lane < r + tail)
                cur = jnp.concatenate(
                    [out_ref[c, blk, :].reshape(1, 128),
                     out_ref[c, blk + 1, :].reshape(1, 128)], axis=1
                )
                merged = jnp.where(mask, tail_vec, cur)
                out_ref[c, blk, :] = merged[0, :128]
                out_ref[c, blk + 1, :] = merged[0, 128:]
                cursor = cursor + thdr + tail
            okc = okc & (cursor == len_ref[c, 0])
            ok_ref[c, 0] = okc.astype(_I32)
            return 0

        jax.lax.fori_loop(0, _TC, chunk_body, 0)

    out, ok = pl.pallas_call(
        kernel,
        grid=(C // _TC,),
        in_specs=[
            pl.BlockSpec((_TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TC, nin, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TC, nout, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, nout, 128), _I32),
            jax.ShapeDtypeStruct((C, 1), _I32),
        ),
        interpret=_interpret(),
    )(comp_len.astype(_I32).reshape(-1, 1), comp_blocks)
    return (
        out.reshape(C, nout * 128)[:C0, :S].astype(jnp.uint8),
        ok[:C0, 0].astype(jnp.bool_),
    )
