"""On-device decode of ARBITRARY legal Hap frames.

The zero-roundtrip pipeline (device_pipeline.py) parses/validates frames on
device but only accepts the fixed layout this framework and the reference
encoder emit, with structured-profile Snappy streams. This module covers
everything else — frames from the five ecosystem encoder applications
(reference README.md:24-30): offset tables present (hap.c:800-807), either
header form, any section order, per-chunk compressor mixes, and arbitrary
google/snappy output.

Serving routes, fastest first:

* snappy="table" (default) — parse/execute split: the host compiles each
  stream into executor piece tables (snappy/optable.py, multithreaded
  C++; short copies promoted to literal-plane bytes) and the Pallas
  executor (snappy/pallas_exec.py) replays them; ForeignGopSession
  batches N frames into ONE fused device dispatch per GOP.
* snappy="kernel" — the fused general Snappy Pallas kernel
  (snappy/pallas_general.py): parses, validates, and resolves overlap
  per element entirely on device — for streams whose bytes never touch
  the host.
* via="native" — byte-serial LZ is CPU-shaped work: the C++ runtime
  decompresses on host (multithreaded) and only the DXT payload ships to
  the chip for texture decode — the natural route on PCIe hosts with
  spare cores.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY
from hap_tpu.snappy.pallas_general import decode_any_streams

_I32 = jnp.int32


def _ceil(n: int, g: int) -> int:
    return -(-n // g) * g


def _default_snappy_route() -> str:
    import os

    return os.environ.get("HAP_TPU_FOREIGN_SNAPPY", "table")


@partial(jax.jit, static_argnames=("S_max", "B_comp", "total_bytes"))
def _decode_payload_from_frame(
    frame_pad: jnp.ndarray,  # (>= F + S_max + B_comp,) uint8 frame bytes
    comp_off: jnp.ndarray,  # (C,) int32 — chunk stream offsets in frame
    comp_len: jnp.ndarray,  # (C,) int32 — stream lengths
    out_len: jnp.ndarray,  # (C,) int32 — uncompressed sizes
    out_off: jnp.ndarray,  # (C,) int32 — uncompressed offsets
    is_comp: jnp.ndarray,  # (C,) bool — Snappy chunk vs raw chunk
    S_max: int,  # static: max uncompressed chunk size
    B_comp: int,  # static: 128-multiple >= max Snappy stream length
    total_bytes: int,  # static: decoded payload size
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame bytes -> ((total_bytes,) uint8 payload, ok scalar), on device.

    Only Snappy chunks go through the kernel (raw chunks get comp_len=0 and
    exit its chain immediately); raw chunk bytes are sliced straight from
    the frame during the stitch. B_comp is decoupled from S_max so the
    kernel's input VMEM footprint tracks actual stream sizes (more chains
    per grid step — see pallas_general._pick_tc).
    """

    def slice_body(_, off):
        return None, jax.lax.dynamic_slice(frame_pad, (off,), (B_comp,))

    _, comp = jax.lax.scan(slice_body, None, comp_off)
    klen = jnp.where(is_comp, comp_len, 0)
    dec, ok = decode_any_streams(comp, klen, jnp.where(is_comp, out_len, 0), S_max)
    ok_all = jnp.all(ok | ~is_comp)
    return _stitch_payload(
        frame_pad, dec, comp_off, out_off, is_comp, S_max, total_bytes
    ), ok_all


@partial(jax.jit, static_argnames=("S_max", "total_bytes"))
def _stitch_payload(
    frame_pad: jnp.ndarray,
    dec: jnp.ndarray,  # (C, S_max) uint8 decoded snappy rows
    comp_off: jnp.ndarray,
    out_off: jnp.ndarray,
    is_comp: jnp.ndarray,
    S_max: int,
    total_bytes: int,
) -> jnp.ndarray:
    """Place decoded/raw chunk rows at their uncompressed offsets.

    Chunks are written in increasing-offset order, so each S_max-wide
    padded write is healed by the next chunk's write (same idiom as
    encode_frame_device).
    """
    order = jnp.argsort(out_off)
    buf = jnp.zeros(total_bytes + S_max, jnp.uint8)

    def body(buf, c):
        raw = jax.lax.dynamic_slice(frame_pad, (comp_off[c],), (S_max,))
        row = jnp.where(is_comp[c], dec[c], raw)
        return jax.lax.dynamic_update_slice(buf, row, (out_off[c],)), None

    buf, _ = jax.lax.scan(body, buf, order)
    return buf[:total_bytes]


def _texture_payload_device(
    frame_dev: jnp.ndarray, frame_len: int, tex
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device frame bytes + host-parsed chunk tables -> (payload, ok)."""
    csizes = np.asarray(tex.chunk_compressed_sizes, np.int64)
    usizes = np.asarray(tex.chunk_uncompressed_sizes, np.int64)
    is_comp = np.asarray(tex.chunk_compressors) == CHUNK_COMPRESSOR_SNAPPY
    S_max = int(usizes.max())
    comp_max = int(csizes[is_comp].max()) if is_comp.any() else 1
    # Bucket the kernel window width (a static shape) so recompiles are
    # bounded per stream instead of per frame.
    B_comp = _ceil(max(comp_max, 128), 4096 if comp_max > 128 else 128)
    need = int(np.asarray(tex.chunk_compressed_offsets).max()) + max(S_max, B_comp)
    if frame_dev.shape[0] < need:
        frame_dev = jnp.pad(frame_dev, (0, need - frame_dev.shape[0]))
    return _decode_payload_from_frame(
        frame_dev,
        jnp.asarray(np.asarray(tex.chunk_compressed_offsets), _I32),
        jnp.asarray(csizes, _I32),
        jnp.asarray(usizes, _I32),
        jnp.asarray(np.asarray(tex.chunk_uncompressed_offsets), _I32),
        jnp.asarray(is_comp),
        S_max,
        B_comp,
        int(tex.decoded_bytes),
    )


def _texture_payload_device_tables(
    frame: bytes, frame_dev: jnp.ndarray, tex
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parse/execute-split route: host compiles each Snappy chunk stream
    into an op table (snappy/optable.py — merged runs, expanded overlaps,
    compacted literal plane); the Pallas executor (snappy/pallas_exec.py)
    replays them with pure vector moves. ~7x the fused general kernel on
    real HapEncode streams; the host walk is the CPU-shaped part of the
    job (the reference hands it to google snappy's CPU parser, hap.c:612)
    and overlaps with device compute when serving GOPs.
    """
    from hap_tpu.snappy.optable import pack_tables
    from hap_tpu.snappy.pallas_exec import execute_op_tables

    csizes = np.asarray(tex.chunk_compressed_sizes, np.int64)
    usizes = np.asarray(tex.chunk_uncompressed_sizes, np.int64)
    is_comp = np.asarray(tex.chunk_compressors) == CHUNK_COMPRESSOR_SNAPPY
    S_max = int(usizes.max())
    frame_np = np.frombuffer(frame, np.uint8)
    streams = []
    exp = []
    for i in range(len(csizes)):
        if is_comp[i]:
            o = int(tex.chunk_compressed_offsets[i])
            streams.append(frame_np[o: o + int(csizes[i])].tobytes())
            exp.append(int(usizes[i]))
        else:
            streams.append(b"")
            exp.append(0)
    # Raw chunks get an empty table (ok=False there is fine — they bypass
    # the kernel and are sliced from the frame in the stitch).
    p = pack_tables(streams, exp, S_max=S_max)
    ok_host = bool((p.ok | ~is_comp).all())
    # Bucket shapes so jit recompiles are bounded per stream.
    nmax = _ceil(max(p.ops.shape[1], 64), 512)
    lmax = _ceil(max(p.lit.shape[1], 128), 4096 if p.lit.shape[1] > 128 else 128)
    ops = np.zeros((p.ops.shape[0], nmax, 2), np.int32)
    ops[:, : p.ops.shape[1]] = p.ops
    lit = np.zeros((p.lit.shape[0], lmax), np.uint8)
    lit[:, : p.lit.shape[1]] = p.lit
    dec = execute_op_tables(
        jnp.asarray(ops), jnp.asarray(p.n_ops), jnp.asarray(lit),
        jnp.asarray(p.out_len), S_max)
    need = int(np.asarray(tex.chunk_compressed_offsets).max()) + S_max
    if frame_dev.shape[0] < need:
        frame_dev = jnp.pad(frame_dev, (0, need - frame_dev.shape[0]))
    payload = _stitch_payload(
        frame_dev,
        dec,
        jnp.asarray(np.asarray(tex.chunk_compressed_offsets), _I32),
        jnp.asarray(np.asarray(tex.chunk_uncompressed_offsets), _I32),
        jnp.asarray(is_comp),
        S_max,
        int(tex.decoded_bytes),
    )
    return payload, jnp.bool_(ok_host)


def decode_frame_any_device(
    frame, height: int, width: int, frame_dev: Optional[jnp.ndarray] = None,
    snappy: Optional[str] = None,
):
    """Decode any legal Hap frame, all compute and outputs on device.

    Returns (pixels device array (H, W, C), ok device scalar). Pass
    ``frame_dev`` (uint8 device array of the same bytes, e.g. already
    resident from a previous stage) to skip the host->device upload.

    ``snappy`` picks the general-decode route: "table" (default; host
    op-table compile + Pallas executor) or "kernel" (fused on-device
    general kernel — no host byte-walk, for frames whose bytes are only
    on device). Env default: HAP_TPU_FOREIGN_SNAPPY.
    """
    from hap_tpu.container.parse import parse_frame
    from hap_tpu.kernels.layout import pack_u8_to_u32
    from hap_tpu.pipeline.codecs import _DECODERS, codec_for_frame

    frame = bytes(frame)
    spec = codec_for_frame(frame)
    plan = parse_frame(frame)
    if snappy is None:
        snappy = _default_snappy_route()
    if frame_dev is None:
        # Bucketed upload length: bounded recompiles across a stream.
        fpad = _ceil(len(frame), 1 << 20)
        buf = np.zeros(fpad, np.uint8)
        buf[: len(frame)] = np.frombuffer(frame, np.uint8)
        frame_dev = jnp.asarray(buf)

    images = []
    ok_all = jnp.bool_(True)
    for index, fmt in enumerate(spec.texture_formats):
        if snappy == "table":
            payload, ok = _texture_payload_device_tables(
                frame, frame_dev, plan.textures[index]
            )
        else:
            payload, ok = _texture_payload_device(
                frame_dev, len(frame), plan.textures[index]
            )
        ok_all = ok_all & ok
        dec, wpb = _DECODERS[fmt]
        words = pack_u8_to_u32(payload.reshape(-1, 4)).reshape(-1, wpb)
        images.append(dec(words, height, width))

    if not spec.multi_texture:
        return images[0], ok_all
    color, alpha = images
    return jnp.concatenate([color, alpha[..., None]], axis=-1), ok_all


@dataclass
class StagedForeignFrame:
    """Host-compiled, device-staged decode inputs for one foreign frame.

    Produced by ForeignGopSession.stage(); all jnp members are device
    arrays (uploads are async — staging frame k+1 overlaps decoding frame
    k). Profile = the bucketing key: frames with equal profiles decode in
    the same jit programs with zero recompiles.
    """

    frame_len: int
    spec: object  # codec spec (pipeline/codecs.HapCodec)
    profile: tuple
    ok_host: bool
    frame_dev: Optional[jnp.ndarray]  # (F_pad,) uint8; None when uniform
    per_texture: list  # [(ops, n_ops, lit, out_len, comp_off, out_off, is_comp, S_max, total, raw_rows)]


class ForeignGopSession:
    """Batched serving loop for ARBITRARY legal Hap frames (hap.h:113-128
    is the reference's player-facing surface; this is ours).

    stage(): host parses the container, compiles op tables (multithreaded
    C++, snappy/optable.py semantics) and starts async uploads.
    decode_gop(): decodes N staged frames with ONE executor-kernel call
    over all N x C chunk streams per texture, a batched stitch, lax.map'd
    BCn decode, and a single host sync — amortizing this environment's
    ~25 ms dispatch+fetch floor and any per-call overhead across the GOP.

    Frames in one decode_gop() call must share codec + dimensions +
    chunk profile (one video stream's GOP does); stage() records the
    profile so callers can group mixed streams.

    Heterogeneous streams (resolution or chunk-layout changes) are
    supported by grouping on .profile; each DISTINCT profile costs one jit
    compilation of the fused GOP program (coarse bucketing keeps nmax/lmax
    out of the key). ``max_profiles`` bounds the compiled-program set: when
    more distinct profiles than that have been served, the jit caches are
    dropped and rebuilt on demand (bounded memory; stats in
    .compile_stats()).

    ``promote`` picks the literal-promotion policy (round-4 fix for the
    staging-bound fresh-frame regime — r3 tuned promotion for executor
    pieces only and inflated staged bytes on copy-heavy content):
    "pieces" promotes at the piece-optimal threshold (best for GOPs that
    stay device-resident and are decoded repeatedly); "auto" compiles
    both variants and keeps, per texture, the one minimizing
    staged_bytes * HAP_TPU_STAGE_NS_PER_BYTE (default 26 — this
    environment's ~38 MB/s tunnel; set ~0.06 on PCIe hosts) +
    pieces * HAP_TPU_EXEC_NS_PER_PIECE (default 80, measured executor
    floor) — the steady-state cost of staging + decoding a fresh frame
    once; an int pins promote_max explicitly.
    """

    def __init__(self, height: int, width: int, max_profiles: int = 16,
                 promote="pieces"):
        self.height = height
        self.width = width
        self.max_profiles = max_profiles
        self.promote = promote
        self._profiles_seen = set()
        self.cache_evictions = 0

    def _pack(self, streams, exp, S_max):
        import os

        from hap_tpu.snappy.optable import pack_tables

        if self.promote == "pieces":
            return pack_tables(streams, exp, S_max=S_max)
        if isinstance(self.promote, int):
            return pack_tables(streams, exp, S_max=S_max,
                               promote_max=self.promote)
        p0 = pack_tables(streams, exp, S_max=S_max, promote_max=0)
        p1 = pack_tables(streams, exp, S_max=S_max)
        ns_b = float(os.environ.get("HAP_TPU_STAGE_NS_PER_BYTE", "26"))
        ns_p = float(os.environ.get("HAP_TPU_EXEC_NS_PER_PIECE", "80"))

        def cost(p):
            staged = p.ops.nbytes + p.lit.nbytes
            return staged * ns_b + float(p.n_ops.sum()) * ns_p

        return p0 if cost(p0) <= cost(p1) else p1

    def stage(self, frame) -> StagedForeignFrame:
        from hap_tpu.container.parse import parse_frame
        from hap_tpu.pipeline.codecs import codec_for_frame

        frame = bytes(frame)
        spec = codec_for_frame(frame)
        plan = parse_frame(frame)
        frame_np = np.frombuffer(frame, np.uint8)

        # legalized frames have uniform chunk geometry (usizes all S_max,
        # offsets k*S_max — hap.c:285-298): the device needs NO stitch and
        # no frame bytes, only dense per-chunk rows. Non-uniform foreign
        # layouts keep the frame upload + general scan stitch.
        all_uniform = all(
            bool((np.asarray(t.chunk_uncompressed_sizes)
                  == int(np.asarray(t.chunk_uncompressed_sizes).max())).all()
                 and (np.asarray(t.chunk_uncompressed_offsets)
                      == int(np.asarray(t.chunk_uncompressed_sizes).max())
                      * np.arange(t.chunk_count)).all())
            for t in plan.textures
        )
        frame_dev = None
        fpad = 0
        if not all_uniform:
            fpad = _ceil(max(len(frame), 1), 1 << 20)
            buf = np.zeros(fpad, np.uint8)
            buf[: len(frame)] = frame_np
            frame_dev = jnp.asarray(buf)

        per_texture = []
        prof = [spec.name, fpad, all_uniform]
        ok_host = True
        for tex in plan.textures:
            csizes = np.asarray(tex.chunk_compressed_sizes, np.int64)
            usizes = np.asarray(tex.chunk_uncompressed_sizes, np.int64)
            is_comp = (np.asarray(tex.chunk_compressors)
                       == CHUNK_COMPRESSOR_SNAPPY)
            S_max = int(usizes.max())
            streams = []
            exp = []
            for i in range(len(csizes)):
                if is_comp[i]:
                    o = int(tex.chunk_compressed_offsets[i])
                    streams.append(frame_np[o: o + int(csizes[i])].tobytes())
                    exp.append(int(usizes[i]))
                else:
                    streams.append(b"")
                    exp.append(0)
            p = self._pack(streams, exp, S_max)
            ok_host &= bool((p.ok | ~is_comp).all())
            # PACKED staging (round 4): the r3 dense (C, nmax, 2) op and
            # (C, lmax) literal planes shipped zero padding up to the
            # LARGEST chunk's table for every chunk (8.4 MB of an 8.6 MB
            # natural-class lit upload was zeros). Stage the concatenated
            # true rows + per-chunk offsets; decode_gop rebuilds the dense
            # executor layout on device (C dynamic-slice DMAs, HBM-cheap).
            C = p.ops.shape[0]
            nl = p.n_lit.astype(np.int64)
            no = p.n_ops.astype(np.int64)
            ops_off = np.zeros(C, np.int32)
            ops_off[1:] = np.cumsum(no)[:-1]
            lit_off = np.zeros(C, np.int32)
            lit_off[1:] = np.cumsum(nl)[:-1]
            ops_packed = np.zeros(
                (_ceil(max(int(no.sum()), 1), 4096), 2), np.int32)
            w = 0
            for i in range(C):
                k = int(no[i])
                ops_packed[w:w + k] = p.ops[i, :k]
                w += k
            lit_packed = np.zeros(_ceil(max(int(nl.sum()), 1), 65536),
                                  np.uint8)
            w = 0
            for i in range(C):
                k = int(nl[i])
                lit_packed[w:w + k] = p.lit[i, :k]
                w += k
            nops_maxlen = int(no.max(initial=1))
            lit_maxlen = int(nl.max(initial=1))
            # host pre-aligns raw-chunk bytes into dense rows (a memcpy;
            # the device then does a pure elementwise where instead of
            # byte-offset dynamic slices, which lower catastrophically).
            # PACKED (round 4): only the raw chunks' rows are staged
            # ((R, S_max) + a (C,) row map gathered on device) — the r3
            # dense (C, S_max) form shipped a zero row per Snappy chunk,
            # which dominated natural/noise staging volume (the fresh-
            # frame serving regime is staging-bound through this tunnel).
            raw_rows = None
            if all_uniform and not is_comp.all():
                ridx = np.nonzero(~is_comp)[0]
                rpad = -(-len(ridx) // 4) * 4  # small bucket for profiles
                rp = np.zeros((rpad, S_max), np.uint8)
                rmap = np.zeros(len(csizes), np.int32)
                for k, i in enumerate(ridx):
                    o = int(tex.chunk_compressed_offsets[i])
                    n = int(csizes[i])
                    rp[k, :n] = frame_np[o: o + n]
                    rmap[i] = k
                raw_rows = (jnp.asarray(rp), jnp.asarray(rmap))
            per_texture.append((
                jnp.asarray(ops_packed), jnp.asarray(p.n_ops),
                jnp.asarray(lit_packed),
                jnp.asarray(p.out_len),
                jnp.asarray(np.asarray(tex.chunk_compressed_offsets), _I32),
                jnp.asarray(np.asarray(tex.chunk_uncompressed_offsets), _I32),
                jnp.asarray(is_comp), S_max, int(tex.decoded_bytes),
                raw_rows,
                jnp.asarray(ops_off), jnp.asarray(lit_off),
                nops_maxlen, lit_maxlen,
            ))
            # packed lengths / per-chunk maxima deliberately NOT in the
            # profile: decode_gop repads device-side to the GOP max and
            # buckets the dense-rebuild widths (bounded recompiles)
            prof.extend([len(csizes), S_max, raw_rows is not None,
                         int(tex.decoded_bytes)])
        return StagedForeignFrame(
            frame_len=len(frame), spec=spec, profile=tuple(prof),
            ok_host=ok_host, frame_dev=frame_dev, per_texture=per_texture)

    def hbm_bytes_per_frame(self, staged_frame, nmax_by_tex=None,
                            lmax_by_tex=None) -> int:
        """Estimated device residency of one staged frame inside the fused
        GOP program: decoded rows + payload + the staged packed planes +
        the dense (C, nmax) executor layout decode_gop rebuilds on device
        + output pixels/folds. Feeds the decode_gop HBM guard.

        nmax_by_tex/lmax_by_tex override the per-frame ops/lit maxima with
        the (bucketed) GOP-wide widths the dense rebuild actually pads to —
        decode_gop passes them so a GOP whose first frame is small cannot
        underestimate residency (the fused program pads every frame to the
        GOP maxima)."""
        per_frame = 0
        for ti in range(len(staged_frame.spec.texture_formats)):
            t = staged_frame.per_texture[ti]
            S_max, total = t[7], t[8]
            C = t[1].shape[0]  # n_ops is per-chunk; t[0] is the PACKED
            # flat op array (round 4), whose row count is total ops, not C
            nops_max = nmax_by_tex[ti] if nmax_by_tex is not None else t[12]
            lit_max = lmax_by_tex[ti] if lmax_by_tex is not None else t[13]
            per_frame += (C * S_max * 4 + total + t[0].nbytes + t[2].nbytes
                          + C * nops_max * 8 + C * lit_max)
        per_frame += 4 * self.height * self.width * 4  # pixels + folds
        return per_frame

    def decode_gop(self, staged: list):
        """[StagedForeignFrame] -> ((N,H,W,ch) device pixels, (N,) ok).

        ONE device dispatch for the whole GOP (table concat/pad, executor,
        payload fold, and BCn decode fused into a single jit program —
        every extra dispatch costs a tunnel enqueue on this environment).
        """
        assert staged, "empty GOP"
        prof = staged[0].profile
        assert all(s.profile == prof for s in staged), (
            "decode_gop requires a uniform frame profile; group by "
            ".profile for mixed streams")
        # Bounded compiled-program set: real players switch streams, and
        # every distinct profile keys a fused-GOP jit entry. Past the cap
        # the caches are dropped wholesale (jax.jit has no per-entry
        # eviction); the next GOP of any profile recompiles once.
        self._profiles_seen.add(prof)
        if len(self._profiles_seen) > self.max_profiles:
            _gop_decode_fused.clear_cache()
            _gop_payload.clear_cache()
            self._profiles_seen = {prof}
            self.cache_evictions += 1
        # HBM guard: the fused program holds decoded rows + payload +
        # pixels for every frame concurrently; 16K frames fit one per
        # dispatch, not eight (measured OOM at 2x16K on a 16 GB chip).
        # The dense rebuild pads every frame to the GOP-wide BUCKETED
        # ops/lit maxima (nmax_g/lmax_g below), and packed plane sizes are
        # content-dependent — so the estimate uses those maxima and sums
        # over all staged frames rather than extrapolating from frame 0
        # (a small first frame must not admit a dispatch that OOMs).
        n_tex = len(staged[0].spec.texture_formats)
        nmax_by_tex = [_ceil(max(s.per_texture[ti][12] for s in staged), 512)
                       for ti in range(n_tex)]
        lmax_by_tex = [_ceil(max(s.per_texture[ti][13] for s in staged), 8192)
                       for ti in range(n_tex)]
        per_frame = max(
            self.hbm_bytes_per_frame(s, nmax_by_tex, lmax_by_tex)
            for s in staged)
        est = per_frame * len(staged)
        if est > 12 * 2**30:
            raise ValueError(
                f"GOP of {len(staged)} frames needs ~{est/2**30:.1f} GiB "
                f"of HBM in one fused dispatch; split the GOP (~"
                f"{max(1, int(12 * 2**30 // per_frame))} frames fit)")
        spec = staged[0].spec
        frames = (tuple(s.frame_dev for s in staged)
                  if staged[0].frame_dev is not None else None)
        per_tex = []
        statics = []
        for ti, fmt in enumerate(spec.texture_formats):
            t0 = staged[0].per_texture[ti]
            S_max, total, rr0 = t0[7], t0[8], t0[9]
            C = t0[4].shape[0]
            # dense-rebuild widths: bucketed statics (bounded recompiles)
            nmax_g = _ceil(max(s.per_texture[ti][12] for s in staged), 512)
            lmax_g = _ceil(max(s.per_texture[ti][13] for s in staged), 8192)
            per_tex.append(tuple(
                tuple(s.per_texture[ti][k] for s in staged)
                for k in (0, 1, 2, 3, 4, 5, 6, 10, 11)
            ) + ((tuple(s.per_texture[ti][9] for s in staged)
                  if rr0 is not None else None),))
            statics.append((S_max, total, C, nmax_g, lmax_g))
        pixels = _gop_decode_fused(
            frames, tuple(per_tex),
            tuple(statics), tuple(spec.texture_formats),
            self.height, self.width, spec.multi_texture)
        ok = jnp.asarray([s.ok_host for s in staged])
        return pixels, ok

    def compile_stats(self) -> dict:
        """Observability for the serving loop: how many fused-GOP programs
        are live and how often the profile cap forced an eviction."""
        return {
            "profiles_seen": len(self._profiles_seen),
            "compiled_programs": int(_gop_decode_fused._cache_size()),
            "cache_evictions": self.cache_evictions,
            "max_profiles": self.max_profiles,
        }


_FMT_SUBCODEC = {
    "RGB_DXT1": ("hap", 2),
    "RGBA_DXT5": ("hap_alpha", 4),
    "YCoCg_DXT5": ("hap_q", 4),
    "A_RGTC1": ("hap_alpha_only", 2),
    "RGBA_BPTC_UNORM": ("hap_r", 4),
    "RGB_BPTC_UNSIGNED_FLOAT": ("hap_hdr", 4),
    "RGB_BPTC_SIGNED_FLOAT": ("hap_hdr_signed", 4),
}


@partial(jax.jit, static_argnames=("statics", "fmts", "H", "W", "multi"))
def _gop_decode_fused(frames, per_tex, statics, fmts, H, W, multi):
    from hap_tpu.kernels.layout import payload_to_words
    # device_pipeline's per-codec block decoders (split-channel hap_q path
    # skips the interleaved (N, 16, 4) relayout the generic BC3 composition
    # would materialize)
    from hap_tpu.pipeline.device_pipeline import _decode_blocks

    images = []
    for ti, fmt in enumerate(fmts):
        S_max, total, C, nmax_g, lmax_g = statics[ti]
        (ops_l, n_l, lit_l, ol_l, co_l, uo_l, ic_l, oo_l, lo_l,
         rr_l) = per_tex[ti]

        def rebuild(packed_l, off_l, width, twod):
            """Packed per-frame rows + per-chunk offsets -> dense
            (N*C, width[, 2]) executor layout (C dynamic-slice DMAs per
            frame — HBM-cheap; the packed form is what crossed the
            host->device link)."""
            pmax = max(x.shape[0] for x in packed_l)
            pad2 = ((0, 0),) if twod else ()
            pk = jnp.stack([
                jnp.pad(x, ((0, pmax + width - x.shape[0]),) + pad2)
                for x in packed_l])  # (N, pmax + width[, 2])
            offs = jnp.stack(off_l)  # (N, C)

            def per_frame(args):
                p, off = args

                def body(_, o):
                    idx = (o,) + ((0,) if twod else ())
                    sz = (width,) + ((2,) if twod else ())
                    return None, jax.lax.dynamic_slice(p, idx, sz)

                _, rows = jax.lax.scan(body, None, off)
                return rows  # (C, width[, 2])

            rows = jax.lax.map(per_frame, (pk, offs))
            return rows.reshape((-1,) + rows.shape[2:])

        ops = rebuild(ops_l, oo_l, nmax_g, True)
        lit = rebuild(lit_l, lo_l, lmax_g, False)
        n_ops = jnp.concatenate(n_l)
        out_len = jnp.concatenate(ol_l)
        comp_off = jnp.stack(co_l)
        out_off = jnp.stack(uo_l)
        is_comp = jnp.stack(ic_l)
        if rr_l is not None:
            # packed raw rows: repad to the GOP max R device-side (R is
            # deliberately NOT in the profile) and stack the row maps.
            rmax_g = max(r[0].shape[0] for r in rr_l)
            raw_packed = jnp.stack([
                jnp.pad(r[0], ((0, rmax_g - r[0].shape[0]), (0, 0)))
                for r in rr_l])
            raw_map = jnp.stack([r[1] for r in rr_l])
        else:
            raw_packed = raw_map = None
        fstack = jnp.stack(frames) if frames is not None else None
        payload = _gop_payload(
            fstack, ops, n_ops, lit, out_len, comp_off, out_off,
            is_comp, raw_packed, raw_map, S_max, total, C)
        sub, wpb = _FMT_SUBCODEC[fmt.name]
        payload_is_words = payload.dtype == jnp.uint32

        def one(pay, sub=sub, wpb=wpb, is_words=payload_is_words):
            # lane-safe (m, 128, 4) bitcast — the (k, 4) form tiles each
            # 4-byte row onto an (8, 128) vreg (32x padding; layout.py).
            # The uniform-layout path already delivers words from the
            # executor's byte lanes (no repack at all).
            words = pay if is_words else payload_to_words(pay)
            return _decode_blocks(sub, words.reshape(-1, wpb), H, W)

        images.append(jax.lax.map(one, payload))

    if not multi:
        return images[0]
    color, alpha = images
    return jnp.concatenate([color, alpha[..., None]], axis=-1)


@partial(jax.jit, static_argnames=("S_max", "total", "C"))
def _gop_payload(frames, ops, n_ops, lit, out_len, comp_off, out_off,
                 is_comp, raw_packed, raw_map, S_max: int, total: int,
                 C: int):
    """All frames' chunk streams through ONE executor call + payload fold.

    ops (N*C, ...) concatenated chunk tables. Returns (N, total) u8.
    Three payload shapes (host-chosen at stage time):
    * uniform, all-snappy (frames is None, raw_packed None): the decoded
      rows ARE the payload — pure reshape;
    * uniform with raw chunks (raw_packed (N, R, S_max) holding ONLY the
      raw chunks' bytes + raw_map (N, C) row indices): a row gather +
      one elementwise where — no on-device byte shuffling, and the
      staged volume is the raw bytes, not a dense (C, S_max) plane;
    * non-uniform foreign layout (frames (N, F)): general scan stitch.
    """
    from hap_tpu.snappy.pallas_exec import execute_op_tables

    N = n_ops.shape[0] // C
    if frames is None and S_max % 4 == 0 and total % 4 == 0:
        # uniform layouts: produce WORDS straight from the executor's
        # int32 byte lanes (skips the i32->u8 relayout + u8->u32 repack;
        # measured ~2.7 ms per 4K frame, profile_foreign_gop_stages.py).
        # Raw rows stage as u8 and pack via the lane-safe bitcast (~free).
        decw = execute_op_tables(ops, n_ops, lit, out_len, S_max,
                                 out_words=True)
        decw = decw.reshape(N, C, S_max // 4)
        if raw_packed is not None:
            from hap_tpu.kernels.layout import payload_to_words

            raww = jax.vmap(jax.vmap(payload_to_words))(raw_packed)
            rows = jax.vmap(lambda rp, m: rp[m])(raww, raw_map)
            decw = jnp.where(is_comp[:, :, None], decw, rows)
        return decw.reshape(N, C * (S_max // 4))[:, : total // 4]

    dec = execute_op_tables(ops, n_ops, lit, out_len, S_max)  # (N*C, S_max)
    dec = dec.reshape(N, C, S_max)
    if frames is None:
        if raw_packed is not None:
            rows = jax.vmap(lambda rp, m: rp[m])(raw_packed, raw_map)
            dec = jnp.where(is_comp[:, :, None], dec, rows)
        return dec.reshape(N, C * S_max)[:, :total]

    def stitch_one(args):
        frame, d, co, uo, ic = args
        fpad = jnp.pad(frame, (0, S_max + 128))
        return _stitch_payload(fpad, d, co, uo, ic, S_max, total)

    return jax.lax.map(stitch_one, (frames, dec, comp_off, out_off, is_comp))


def decode_frames_any_device(frames, height: int, width: int):
    """Convenience: stage + decode one uniform GOP of foreign frames."""
    sess = ForeignGopSession(height, width)
    return sess.decode_gop([sess.stage(f) for f in frames])


def decode_frame_any(
    frame, height: int, width: int, via: str = "device",
    snappy: Optional[str] = None,
) -> Tuple[np.ndarray, bool]:
    """Decode any legal Hap frame to (H, W, C) host pixels.

    via="device": on-device byte plane (decode_frame_any_device; ``snappy``
    selects "table" — host op-table compile + Pallas executor, default —
    or "kernel" — fused on-device general kernel).
    via="native": the C++ runtime decompresses on host (multithreaded),
    only texture decode runs on device — the route for frames that are
    cheaper to finish on CPU than to ship (see module docstring).

    Returns (pixels, ok). ok is False only for streams flagged malformed —
    the caller should then raise via the host path
    (pipeline/codecs.decode_frame), which reports the precise HapResult.
    """
    if via == "native":
        return _decode_frame_any_native(frame, height, width)
    img, ok = decode_frame_any_device(frame, height, width, snappy=snappy)
    return np.asarray(img), bool(ok)


def _decode_frame_any_native(frame, height: int, width: int):
    from hap_tpu import native
    from hap_tpu.kernels.layout import pack_u8_to_u32
    from hap_tpu.pipeline.codecs import _DECODERS, codec_for_frame

    frame = bytes(frame)
    spec = codec_for_frame(frame)
    images = []
    ok_all = True
    for index, fmt in enumerate(spec.texture_formats):
        try:
            payload, _ = native.decode(frame, index=index)
        except Exception:
            return (
                np.zeros(
                    (height, width, 4 if spec.multi_texture else 3), np.uint8
                ),
                False,
            )
        pay = jnp.asarray(np.frombuffer(payload, np.uint8))
        dec, wpb = _DECODERS[fmt]
        words = pack_u8_to_u32(pay.reshape(-1, 4)).reshape(-1, wpb)
        images.append(dec(words, height, width))

    if not spec.multi_texture:
        return np.asarray(images[0]), ok_all
    color, alpha = images
    return (
        np.asarray(jnp.concatenate([color, alpha[..., None]], axis=-1)),
        ok_all,
    )
