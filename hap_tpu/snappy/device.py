"""On-device Snappy codec (chunk-parallel, fully vectorized).

Byte-serial LZ parsing is the worst fit for a vector machine (SURVEY.md §7
"hard parts"), so the device encoder emits a *structured subset* of the
Snappy format — every stream is fully conforming (any spec-compliant
decoder, including the reference's google-snappy, decodes it bit-exactly),
but its element structure is chosen so that both emission and decoding
vectorize: the chunk payload is processed in 4096-byte units — four full
(8, 128) VPU tiles per sequential kernel step.

Unit flavors (sizes are static given S and G = the DXT block size):

* ``literal``: extended literal, 3-byte tag (61-coded length U) + bytes.
* ``copy``: U/64 back-to-back ``copy2(offset=G, len=64)`` elements (3U/64 bytes;
  overlapping copies continue a G-periodic run — the standard Snappy RLE
  idiom). Valid for units after the first.
* ``seeded``: for the FIRST unit of a G-periodic chunk (no history yet):
  a G-byte literal seed + copy elements covering the remaining U-G
  bytes. Keeps flat/G-periodic chunks ~21x compressible from byte 0.
* the sub-unit ``tail`` (S mod U bytes, a multiple of G) has the same
  three flavors with sizes derived from the tail length.

Both directions run as Pallas kernels (snappy/pallas_kernels.py): each
sequential step moves a whole (8, 128) tile with unaligned dynamic
multi-row VMEM accesses + dynamic lane rotates (probed supported on this
toolchain: tools/probe_wideunit.py). The decoder VALIDATES structure as it
goes and returns a per-chunk ok flag; streams produced by other encoders
fail validation cleanly and are routed to the general-stream device kernel
or the host codec.

Format reference: Snappy format description (normative ref [2] of the Hap
spec, HapVideoDRAFT.md:23,146). Stream = varint(uncompressed length) +
tagged elements; copy-2 tag = 2|((len-1)<<2), offset LE16; literal tag =
(len-1)<<2 for len<=60, else 60/61-coded with 1/2 trailing length bytes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_U8 = jnp.uint8

_UNIT = 4096  # output bytes per full unit (four (8, 128) VPU tiles)


def _varint_bytes(value: int) -> np.ndarray:
    out = []
    while True:
        b = value & 0x7F
        value >>= 7
        out.append(b | 0x80 if value else b)
        if not value:
            return np.array(out, dtype=np.uint8)


def _lit_tag_bytes(length: int) -> np.ndarray:
    """Literal tag bytes for a literal of ``length`` payload bytes."""
    n = length - 1
    if n < 60:
        return np.array([n << 2], dtype=np.uint8)
    if n < 256:
        return np.array([60 << 2, n], dtype=np.uint8)
    assert n < 65536
    return np.array([61 << 2, n & 0xFF, n >> 8], dtype=np.uint8)


def _copy_run_bytes(L: int, G: int) -> np.ndarray:
    """copy2 elements (offset=G) covering L output bytes. L % G == 0, L > 0."""
    nel = -(-L // 64)
    lens = [64] * (nel - 1) + [L - 64 * (nel - 1)]
    return np.concatenate(
        [np.array([2 | ((l - 1) << 2), G & 0xFF, G >> 8], np.uint8) for l in lens]
    )


class Profile(NamedTuple):
    """Static stream-structure facts for a (S, G) chunk shape."""

    U: int
    n_full: int            # number of full 1024-byte units
    tail: int              # S - n_full*U (multiple of G, < U)
    pre: np.ndarray        # varint(S)
    lit_hdr: int           # 3: full-unit literal tag length
    emit_max: int          # U + lit_hdr (worst per-unit emission)
    copy_pat: np.ndarray   # full-unit copy element bytes (48)
    seed_pat: np.ndarray   # seeded unit: tag + copies AFTER the G seed bytes
    seed_size: int         # 1 + G + len(seed_pat)-1 ... total seeded emission
    tail_hdr: np.ndarray   # tail literal tag bytes (empty if no tail)
    tail_lit_size: int
    tail_copy_pat: np.ndarray
    tail_seed_pat: np.ndarray
    tail_seed_size: int
    bound: int             # worst-case stream size


def profile(S: int, G: int) -> Profile:
    U = _UNIT
    assert S % G == 0 and G in (8, 16)
    n_full = S // U
    tail = S - n_full * U
    pre = _varint_bytes(S)
    lit_hdr = len(_lit_tag_bytes(U))  # 3
    emit_max = U + lit_hdr
    copy_pat = _copy_run_bytes(U, G)  # 48 bytes
    # seeded: [lit tag for G bytes][G seed bytes][copies covering U-G]
    seed_tag = np.array([(G - 1) << 2], np.uint8)
    seed_copies = _copy_run_bytes(U - G, G)
    seed_pat = np.concatenate([seed_tag, seed_copies])  # seed bytes go between
    seed_size = 1 + G + len(seed_copies)
    if tail:
        tail_hdr = _lit_tag_bytes(tail)
        tail_lit_size = len(tail_hdr) + tail
        tail_copy_pat = _copy_run_bytes(tail, G)
        if tail > G:
            t_seed_copies = _copy_run_bytes(tail - G, G)
            tail_seed_pat = np.concatenate([seed_tag, t_seed_copies])
            tail_seed_size = 1 + G + len(t_seed_copies)
        else:
            tail_seed_pat = np.zeros(0, np.uint8)
            tail_seed_size = tail_lit_size  # unused
    else:
        tail_hdr = np.zeros(0, np.uint8)
        tail_lit_size = 0
        tail_copy_pat = np.zeros(0, np.uint8)
        tail_seed_pat = np.zeros(0, np.uint8)
        tail_seed_size = 0
    bound = len(pre) + n_full * emit_max + tail_lit_size
    return Profile(
        U, n_full, tail, pre, lit_hdr, emit_max, copy_pat, seed_pat, seed_size,
        tail_hdr, tail_lit_size, tail_copy_pat, tail_seed_pat, tail_seed_size,
        bound,
    )


def _unit_layout(S: int, G: int):
    """Back-compat shim: (U, n_full, tail, lit_hdr, emit_max, pre, bound)."""
    p = profile(S, G)
    return p.U, p.n_full, p.tail, p.lit_hdr, p.emit_max, p.pre, p.bound


def _periodic(units: jnp.ndarray, ref_g: jnp.ndarray) -> jnp.ndarray:
    """units (..., k, G) == ref_g (..., 1, G) tiled -> (...) bool."""
    return jnp.all(units == ref_g, axis=(-2, -1))


def _build_emissions(data: jnp.ndarray, S: int, G: int):
    """(C, S) uint8 -> (emit (C,n_units,emit_max) u8, sizes (C,n_units) i32).

    n_units = n_full + (1 if tail else 0). Emission bytes beyond each unit's
    size are zero/garbage and masked out by the compactor.
    """
    p = profile(S, G)
    C = data.shape[0]
    U, n_full, tail = p.U, p.n_full, p.tail
    emits, sizes = [], []

    if n_full:
        units = data[:, : n_full * U].reshape(C, n_full, U // G, G)
        prevg = jnp.concatenate(
            [units[:, :1, :1, :], units[:, :-1, -1:, :]], axis=1
        )  # (C, n_full, 1, G); unit0 slot holds its own first group (seed test)
        is_run = _periodic(units, prevg)  # (C, n_full)

        lit_tag = jnp.asarray(_lit_tag_bytes(U))
        lit_emit = jnp.concatenate(
            [
                jnp.broadcast_to(lit_tag, (C, n_full, p.lit_hdr)).astype(_U8),
                units.reshape(C, n_full, U),
            ],
            axis=2,
        )  # (C, n_full, emit_max)
        copy_emit = jnp.zeros((C, n_full, p.emit_max), _U8).at[
            :, :, : len(p.copy_pat)
        ].set(jnp.asarray(p.copy_pat))
        emit = jnp.where(is_run[:, :, None], copy_emit, lit_emit)
        size = jnp.where(is_run, len(p.copy_pat), p.emit_max).astype(_I32)

        # Unit 0: no history — seeded flavor when self-periodic.
        seed = units[:, 0, 0, :]  # (C, G)
        seed_emit = jnp.zeros((C, p.emit_max), _U8)
        seed_emit = seed_emit.at[:, :1].set(jnp.asarray(p.seed_pat[:1]))
        seed_emit = seed_emit.at[:, 1 : 1 + G].set(seed)
        seed_emit = seed_emit.at[:, 1 + G : 1 + G + len(p.seed_pat) - 1].set(
            jnp.asarray(p.seed_pat[1:])
        )
        e0 = jnp.where(is_run[:, 0, None], seed_emit, lit_emit[:, 0])
        s0 = jnp.where(is_run[:, 0], p.seed_size, p.emit_max).astype(_I32)
        emit = jnp.concatenate([e0[:, None], emit[:, 1:]], axis=1)
        size = jnp.concatenate([s0[:, None], size[:, 1:]], axis=1)
        emits.append(emit)
        sizes.append(size)

    if tail:
        tdata = data[:, n_full * U :]  # (C, tail)
        tunits = tdata.reshape(C, tail // G, G)
        t_emit = jnp.zeros((C, p.emit_max), _U8)
        t_emit = t_emit.at[:, : len(p.tail_hdr)].set(jnp.asarray(p.tail_hdr))
        t_emit = t_emit.at[:, len(p.tail_hdr) : len(p.tail_hdr) + tail].set(tdata)
        t_size = jnp.full((C,), p.tail_lit_size, _I32)
        if n_full:
            prevg_t = data[:, n_full * U - G : n_full * U].reshape(C, 1, G)
            t_run = _periodic(tunits, prevg_t)
            tc_emit = jnp.zeros((C, p.emit_max), _U8).at[
                :, : len(p.tail_copy_pat)
            ].set(jnp.asarray(p.tail_copy_pat))
            t_emit = jnp.where(t_run[:, None], tc_emit, t_emit)
            t_size = jnp.where(t_run, len(p.tail_copy_pat), t_size)
        elif tail > G:
            t_run = _periodic(tunits, tunits[:, :1, :])
            ts_emit = jnp.zeros((C, p.emit_max), _U8)
            ts_emit = ts_emit.at[:, :1].set(jnp.asarray(p.tail_seed_pat[:1]))
            ts_emit = ts_emit.at[:, 1 : 1 + G].set(tunits[:, 0, :])
            ts_emit = ts_emit.at[
                :, 1 + G : 1 + G + len(p.tail_seed_pat) - 1
            ].set(jnp.asarray(p.tail_seed_pat[1:]))
            t_emit = jnp.where(t_run[:, None], ts_emit, t_emit)
            t_size = jnp.where(t_run, p.tail_seed_size, t_size)
        emits.append(t_emit[:, None])
        sizes.append(t_size[:, None])

    emit = jnp.concatenate(emits, axis=1)
    size = jnp.concatenate(sizes, axis=1)
    return emit, size


def _unit_sizes(data: jnp.ndarray, S: int, G: int) -> jnp.ndarray:
    """(C, S) uint8 -> (C, n_units) int32 per-unit emission sizes.

    The size alone identifies the unit flavor (literal / copy-run / seeded
    — all distinct by construction), so this is the only per-unit metadata
    the in-kernel emission composer needs."""
    p = profile(S, G)
    C = data.shape[0]
    U, n_full, tail = p.U, p.n_full, p.tail
    sizes = []
    if n_full:
        units = data[:, : n_full * U].reshape(C, n_full, U // G, G)
        prevg = jnp.concatenate(
            [units[:, :1, :1, :], units[:, :-1, -1:, :]], axis=1
        )
        is_run = _periodic(units, prevg)  # (C, n_full)
        size = jnp.where(is_run, len(p.copy_pat), p.emit_max).astype(_I32)
        s0 = jnp.where(is_run[:, 0], p.seed_size, p.emit_max).astype(_I32)
        sizes.append(jnp.concatenate([s0[:, None], size[:, 1:]], axis=1))
    if tail:
        tunits = data[:, n_full * U :].reshape(C, tail // G, G)
        t_size = jnp.full((C,), p.tail_lit_size, _I32)
        if n_full:
            prevg_t = data[:, n_full * U - G : n_full * U].reshape(C, 1, G)
            t_run = _periodic(tunits, prevg_t)
            t_size = jnp.where(t_run, len(p.tail_copy_pat), t_size)
        elif tail > G:
            t_run = _periodic(tunits, tunits[:, :1, :])
            t_size = jnp.where(t_run, p.tail_seed_size, t_size)
        sizes.append(t_size[:, None])
    return jnp.concatenate(sizes, axis=1)


@partial(jax.jit, static_argnames=("S", "G", "impl"))
def snappy_encode_chunks(
    data: jnp.ndarray, S: int, G: int, impl: str = "pallas"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, S) uint8 -> ((C, bound) uint8 streams, (C,) int32 lengths).

    Every output stream is a conforming Snappy encoding of its row.
    impl="pallas" composes and places unit emissions in a Pallas kernel
    straight from the payload bytes; impl="xla" materializes the emissions
    and scatters them (slow on TPU — ~8 ns/element — kept as a portable
    reference path). Both produce byte-identical streams.
    """
    C = data.shape[0]
    p = profile(S, G)
    P = len(p.pre)

    if impl == "pallas":
        from hap_tpu.snappy.pallas_kernels import (
            compact_fits_vmem,
            compact_streams_from_data,
        )

        if not compact_fits_vmem(p.bound, p.emit_max):
            impl = "xla"  # huge chunks: kernel output block exceeds VMEM

    if impl == "pallas":
        sizes = _unit_sizes(data, S, G)
        positions = P + jnp.concatenate(
            [jnp.zeros((C, 1), _I32), jnp.cumsum(sizes[:, :-1], axis=1)], axis=1
        )
        comp_len = positions[:, -1] + sizes[:, -1]
        out = compact_streams_from_data(data, positions, sizes, S, G, p.bound)
        out = out.at[:, :P].set(jnp.asarray(p.pre)[None, :])
        return out, comp_len

    emit, sizes = _build_emissions(data, S, G)
    n_units = emit.shape[1]
    positions = P + jnp.concatenate(
        [jnp.zeros((C, 1), _I32), jnp.cumsum(sizes[:, :-1], axis=1)], axis=1
    )
    comp_len = positions[:, -1] + sizes[:, -1]

    within = jnp.arange(p.emit_max, dtype=_I32)
    idx = positions[:, :, None] + within[None, None, :]
    valid = within[None, None, :] < sizes[:, :, None]
    idx = jnp.where(valid, idx, p.bound + 1)
    rows = jnp.broadcast_to(jnp.arange(C, dtype=_I32)[:, None, None], idx.shape)
    out = jnp.zeros((C, p.bound), _U8)
    out = out.at[:, :P].set(jnp.asarray(p.pre)[None, :])
    out = out.at[rows, idx].set(emit, mode="drop")
    return out, comp_len


def _window(comp: jnp.ndarray, cursor: jnp.ndarray, width: int) -> jnp.ndarray:
    """Per-row dynamic windows: comp (C,B), cursor (C,) -> (C,width)."""
    B = comp.shape[1]
    idx = jnp.minimum(cursor[:, None] + jnp.arange(width, dtype=_I32)[None, :], B - 1)
    return jnp.take_along_axis(comp, idx, axis=1)


@partial(jax.jit, static_argnames=("S", "G", "impl"))
def snappy_decode_chunks(
    comp: jnp.ndarray, comp_len: jnp.ndarray, S: int, G: int,
    impl: str = "pallas",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """((C, B) uint8 streams, (C,) lengths) -> ((C, S) uint8, (C,) ok bool).

    Lockstep structured decode. ok[c] is False when stream c is valid
    Snappy but not this framework's structured profile (or malformed) —
    the caller falls back to the general kernel / host codec for those.
    """
    if impl == "pallas":
        from hap_tpu.snappy.pallas_kernels import decode_streams

        return decode_streams(comp, comp_len, S, G)

    # Portable XLA reference: one unit per scan step, windowed gathers.
    p = profile(S, G)
    C, B = comp.shape
    U, n_full, tail = p.U, p.n_full, p.tail
    P = len(p.pre)
    ok = jnp.all(comp[:, :P] == jnp.asarray(p.pre)[None, :], axis=1)
    cursor = jnp.full((C,), P, _I32)
    outs = []
    prevg = jnp.zeros((C, G), _U8)

    def check_pat(win, off, pat):
        pat = jnp.asarray(pat)
        return jnp.all(win[:, off : off + pat.shape[0]] == pat[None, :], axis=1)

    lit_tag = jnp.asarray(_lit_tag_bytes(U))

    for u in range(n_full):
        win = _window(comp, cursor, p.emit_max)
        tag = win[:, 0]
        lit_ok = check_pat(win, 0, _lit_tag_bytes(U))
        lit = win[:, p.lit_hdr : p.lit_hdr + U]
        if u == 0:
            is_run = tag == int(p.seed_pat[0])
            run_ok = check_pat(win, 0, p.seed_pat[:1]) & check_pat(
                win, 1 + G, p.seed_pat[1:]
            )
            seed = win[:, 1 : 1 + G]
            run_unit = jnp.tile(seed, (1, U // G))
            adv = p.seed_size
        else:
            is_run = tag == int(p.copy_pat[0])
            run_ok = check_pat(win, 0, p.copy_pat)
            run_unit = jnp.tile(prevg, (1, U // G))
            adv = len(p.copy_pat)
        ok = ok & jnp.where(is_run, run_ok, lit_ok)
        unit = jnp.where(is_run[:, None], run_unit, lit)
        prevg = unit[:, U - G :]
        cursor = cursor + jnp.where(is_run, adv, p.emit_max)
        outs.append(unit)

    if tail:
        win = _window(comp, cursor, p.tail_lit_size)
        tag = win[:, 0]
        lit_ok = check_pat(win, 0, p.tail_hdr)
        lit = win[:, len(p.tail_hdr) : len(p.tail_hdr) + tail]
        if n_full:
            is_run = tag == int(p.tail_copy_pat[0])
            run_ok = check_pat(win, 0, p.tail_copy_pat)
            run_unit = jnp.tile(prevg, (1, -(-tail // G)))[:, :tail]
            adv = len(p.tail_copy_pat)
        elif tail > G:
            is_run = tag == int(p.tail_seed_pat[0])
            run_ok = check_pat(win, 0, p.tail_seed_pat[:1]) & check_pat(
                win, 1 + G, p.tail_seed_pat[1:]
            )
            seed = win[:, 1 : 1 + G]
            run_unit = jnp.tile(seed, (1, tail // G))
            adv = p.tail_seed_size
        else:
            is_run = jnp.zeros((C,), jnp.bool_)
            run_ok = jnp.zeros((C,), jnp.bool_)
            run_unit = lit
            adv = 0
        ok = ok & jnp.where(is_run, run_ok, lit_ok)
        outs.append(jnp.where(is_run[:, None], run_unit, lit))
        cursor = cursor + jnp.where(is_run, adv, p.tail_lit_size)

    ok = ok & (cursor == comp_len)
    out = jnp.concatenate(outs, axis=1) if outs else jnp.zeros((C, 0), _U8)
    return out, ok
