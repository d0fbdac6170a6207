"""What match structure delivers the reference's Snappy ratio on DXT payloads?

Round-5 job #1 (VERDICT r4): the device encoder must stop storing raw. This
probe measures, per content class, WHERE google snappy's savings on real DXT
payloads come from (offset/length structure of its emitted copies) and what
compressed size a TPU-friendly restricted matcher would achieve:

* ``word4``  — matches at 4-byte granularity, 4-byte-aligned offsets,
               exact last-occurrence within the window (upper bound for a
               word-lattice matcher).
* ``group8`` — matches at 8-byte granularity, 8-byte-aligned offsets
               (one BC1/BC4 block or half a BC3 block per group).
* fixed candidate-offset variants (no hash/sort needed on device).

Each scheme is costed with the exact snappy emission model (copy-1/2/4,
literal tags, per-chunk raw fallback) and reports PIECE counts (copies +
literal runs), because device emission/decode cost scales with pieces
(~80 ns/piece through the executor; CLAUDE.md round-3 facts).

Usage: JAX_PLATFORMS=cpu python tools/probe_lz_structure.py [--hw 1080p|4k]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_content import make_frame


def dxt_payload(cls: str, seed: int, H: int, W: int, codec: str = "hap_q") -> bytes:
    import jax.numpy as jnp

    from hap_tpu.pipeline.device_pipeline import _encode_blocks

    img = make_frame(cls, seed, H, W)
    words = _encode_blocks(codec, jnp.asarray(img))
    return np.ascontiguousarray(np.asarray(words), dtype="<u4").tobytes()


# ---------------------------------------------------------------------------
# Reference: google snappy per chunk (the exact reference encode loop shape)
# ---------------------------------------------------------------------------

def ref_compress_chunks(payload: bytes, C: int):
    from hap_tpu import oracle

    S = len(payload) // C
    sizes = []
    streams = []
    for c in range(C):
        comp = oracle.snappy_compress(payload[c * S : (c + 1) * S])
        if len(comp) < S:  # per-chunk raw fallback (hap.c:460-466)
            sizes.append(len(comp))
            streams.append(comp)
        else:
            sizes.append(S)
            streams.append(None)
    return sizes, streams, S


def walk_elements(stream: bytes):
    """Parse a snappy stream -> [(kind, length, offset)]; kind 0=lit 1=copy."""
    # varint preamble
    i = 0
    shift = 0
    n = 0
    while True:
        b = stream[i]
        n |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not (b & 0x80):
            break
    out = []
    L = len(stream)
    while i < L:
        tag = stream[i]
        t = tag & 3
        if t == 0:
            ln = (tag >> 2) + 1
            i += 1
            if ln > 60:
                nb = ln - 60
                ln = int.from_bytes(stream[i : i + nb], "little") + 1
                i += nb
            out.append((0, ln, 0))
            i += ln
        elif t == 1:
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | stream[i + 1]
            out.append((1, ln, off))
            i += 2
        elif t == 2:
            ln = (tag >> 2) + 1
            off = int.from_bytes(stream[i + 1 : i + 3], "little")
            out.append((1, ln, off))
            i += 3
        else:
            ln = (tag >> 2) + 1
            off = int.from_bytes(stream[i + 1 : i + 5], "little")
            out.append((1, ln, off))
            i += 5
    return out


# ---------------------------------------------------------------------------
# Emission cost model (exact snappy byte costs)
# ---------------------------------------------------------------------------

def lit_cost(nbytes: int) -> int:
    if nbytes == 0:
        return 0
    n = nbytes - 1
    if n < 60:
        return 1 + nbytes
    if n < 256:
        return 2 + nbytes
    if n < 65536:
        return 3 + nbytes
    return 4 + nbytes


def copy_run_cost(nbytes: int, dist_bytes: int) -> tuple[int, int]:
    """(stream bytes, n copy elements) to cover nbytes at distance d."""
    per = 5 if dist_bytes > 65535 else 3
    nel = -(-nbytes // 64)
    return per * nel, nel


def varint_len(n: int) -> int:
    k = 1
    while n >= 1 << (7 * k):
        k += 1
    return k


# ---------------------------------------------------------------------------
# Restricted matchers (simulated at payload level, vectorized numpy)
# ---------------------------------------------------------------------------

def last_occurrence_dist(keys: np.ndarray, max_dist: int) -> np.ndarray:
    """For each i, distance (in positions) to the most recent j<i with
    keys[j]==keys[i], 0 if none within max_dist. Exact (dict-based)."""
    d = np.zeros(len(keys), np.int64)
    last: dict = {}
    for i, k in enumerate(keys.tolist()):
        j = last.get(k)
        if j is not None and i - j <= max_dist:
            d[i] = i - j
        last[k] = i
    return d


def fixed_candidate_dist(keys: np.ndarray, cands: list[int]) -> np.ndarray:
    """Most-preferred (first in cands) candidate distance where the key
    matches; 0 if none. Pure vectorized compares — the device-cheap form."""
    n = len(keys)
    d = np.zeros(n, np.int64)
    for c in reversed(cands):  # earlier candidates override later ones
        if c >= n:
            continue
        eq = np.zeros(n, bool)
        eq[c:] = keys[c:] == keys[:-c]
        d[eq] = c
    return d


def run_lengths_bool(m: np.ndarray) -> np.ndarray:
    """For bool m, length of the maximal run of True containing i (0 where
    False). Vectorized."""
    n = len(m)
    change = np.ones(n, bool)
    change[1:] = m[1:] != m[:-1]
    rid = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))
    out = np.where(m, lens[rid], 0)
    return out


def best_run_candidate_dist(keys: np.ndarray, cands: list[int]) -> np.ndarray:
    """Per position: the candidate distance whose match-run through this
    position is longest (ties -> smaller d). 0 when no candidate matches.
    Device-friendly: per candidate it is one shifted compare + run-length
    scan; selection is an argmax over ~|D| planes."""
    n = len(keys)
    best_d = np.zeros(n, np.int64)
    best_len = np.zeros(n, np.int64)
    for c in cands:
        if c >= n:
            continue
        m = np.zeros(n, bool)
        m[c:] = keys[c:] == keys[:-c]
        rl = run_lengths_bool(m)
        take = rl > best_len
        best_d[take] = c
        best_len[take] = rl[take]
    return best_d


def realigned_ref_bound(streams, S: int, gbytes: int):
    """Cost of the REFERENCE's own matches snapped to a g-byte lattice:
    each ref copy [pos, pos+len) at offset off becomes the sub-extent with
    g-aligned start/end and g-aligned offset (dropped if misaligned offset
    or empty after snapping). Upper bound for any g-lattice matcher that
    finds at most what google snappy found."""
    total = 0
    for st in streams:
        if st is None:
            total += S
            continue
        cost = varint_len(S)
        pos = 0
        lit_pend = 0
        pieces = []
        for kind, ln, off in walk_elements(st):
            if kind == 0:
                lit_pend += ln
                pos += ln
                continue
            if off % gbytes:
                lit_pend += ln
                pos += ln
                continue
            s = -(-pos // gbytes) * gbytes  # align start up
            e = (pos + ln) // gbytes * gbytes  # align end down
            if e <= s:
                lit_pend += ln
                pos += ln
                continue
            lit_pend += s - pos
            if lit_pend:
                cost += lit_cost(lit_pend)
                lit_pend = 0
            cb, _ = copy_run_cost(e - s, off)
            cost += cb
            lit_pend += (pos + ln) - e
            pos += ln
        if lit_pend:
            cost += lit_cost(lit_pend)
        total += min(cost, S)
    return total


def scheme_cost(d: np.ndarray, gbytes: int, S_positions: int, min_run: int = 1,
                chunk: np.ndarray | None = None):
    """Compressed cost of per-position match distances for one chunk.

    d[i] > 0: position i's gbytes match at distance d[i] positions back.
    Runs of equal d merge into copy runs; runs shorter than min_run
    (positions) are demoted to literals. With ``chunk`` (the raw bytes),
    each copy run's edges are extended into the neighbouring literal by
    up to gbytes-1 BYTES where bytes still match at the same distance
    (snappy copy lengths are byte-granular — recovers the lattice
    truncation loss on short matches). Returns (bytes, pieces)."""
    n = len(d)
    assert n == S_positions
    # run segmentation: new run where d changes
    change = np.ones(n, bool)
    change[1:] = d[1:] != d[:-1]
    run_starts = np.flatnonzero(change)
    run_lens = np.diff(np.append(run_starts, n))
    run_d = d[run_starts]
    is_copy = (run_d > 0) & (run_lens >= min_run)

    total = 0
    pieces = 0
    nruns = 0  # copy runs + literal runs: the device emission/decode unit
    cur_lit = 0  # pending literal BYTES
    pend_trim = 0  # bytes stolen from the front of the next literal run
    nb = n * gbytes
    for r, (ln, isc, dd) in enumerate(
        zip(run_lens.tolist(), is_copy.tolist(), run_d.tolist())
    ):
        if isc:
            s = run_starts[r] * gbytes
            e = s + ln * gbytes
            db = dd * gbytes
            ext_l = ext_r = 0
            if chunk is not None:
                # extend left into the pending literal only
                while (ext_l < gbytes - 1 and ext_l < cur_lit
                       and s - 1 - ext_l >= db
                       and chunk[s - 1 - ext_l] == chunk[s - 1 - ext_l - db]):
                    ext_l += 1
                # extend right into the following literal run only
                avail_r = 0
                if r + 1 < len(run_lens) and not is_copy[r + 1]:
                    avail_r = run_lens[r + 1] * gbytes
                elif r + 1 == len(run_lens):
                    avail_r = 0
                while (ext_r < gbytes - 1 and ext_r < avail_r
                       and e + ext_r < nb
                       and chunk[e + ext_r] == chunk[e + ext_r - db]):
                    ext_r += 1
            cur_lit -= ext_l
            if cur_lit:
                total += lit_cost(cur_lit)
                pieces += 1
                nruns += 1
            cur_lit = 0
            cb, ne = copy_run_cost(ln * gbytes + ext_l + ext_r, db)
            total += cb
            pieces += ne
            nruns += 1
            pend_trim = ext_r
        else:
            cur_lit += ln * gbytes - pend_trim
            pend_trim = 0
    if cur_lit:
        total += lit_cost(cur_lit)
        pieces += 1
        nruns += 1
    total += varint_len(S_positions * gbytes)
    return total, pieces, nruns


def simulate(payload: bytes, C: int, gbytes: int, mode: str, cands=None,
             min_run: int = 1, window: int = 65535, extend: bool = False):
    """Per-chunk restricted matcher; returns (total bytes, pieces, n_raw)."""
    S = len(payload) // C
    a = np.frombuffer(payload, np.uint8)
    total = 0
    pieces = 0
    runs = 0
    n_raw = 0
    for c in range(C):
        chunk = a[c * S : (c + 1) * S]
        npos = S // gbytes
        view = chunk[: npos * gbytes].reshape(npos, gbytes)
        # pack group bytes into a hashable key (void view) / int64
        if gbytes == 4:
            keys = view.view("<u4")[:, 0].astype(np.int64)
        elif gbytes == 8:
            keys = view.view("<u8")[:, 0].astype(np.uint64)
        else:
            keys = np.ascontiguousarray(view).view(
                [("", np.uint8)] * gbytes
            )[:, 0]
        if mode == "last":
            dist = last_occurrence_dist(keys, window // gbytes)
        elif mode == "cand":
            dist = fixed_candidate_dist(keys, cands)
        elif mode == "bestrun":
            dist = best_run_candidate_dist(keys, cands)
        else:
            raise ValueError(mode)
        cost, pc, nr = scheme_cost(dist, gbytes, npos, min_run,
                                   chunk if extend else None)
        cost += lit_cost(S - npos * gbytes) if S != npos * gbytes else 0
        if cost < S:
            total += cost
            pieces += pc
            runs += nr
        else:
            total += S
            n_raw += 1
    return total, pieces, runs, n_raw


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1080p", choices=["1080p", "4k"])
    ap.add_argument("--codec", default="hap_q")
    ap.add_argument("--chunks", type=int, default=64)
    args = ap.parse_args()
    H, W = (2160, 3840) if args.hw == "4k" else (1080, 1920)

    for cls in ("natural", "graphics", "noise"):
        t0 = time.time()
        payload = dxt_payload(cls, 0, H, W, args.codec)
        raw = len(payload)
        C = args.chunks
        ref_sizes, ref_streams, S = ref_compress_chunks(payload, C)
        ref_total = sum(ref_sizes)
        print(f"\n== {cls} {args.hw} {args.codec}: raw {raw/1e6:.2f} MB, "
              f"ref {ref_total/1e6:.3f} MB ({ref_total/raw:.3f}x) "
              f"[payload gen+ref {time.time()-t0:.1f}s]")

        # --- where do the reference's savings come from?
        off_hist: dict = {}
        len_hist = {"4-7": 0, "8-15": 0, "16-63": 0, "64+": 0}
        align_saved = {0: 0, 4: 0, 8: 0, 16: 0, "other": 0}
        n_copies = 0
        n_lits = 0
        copy_bytes = 0
        for st in ref_streams:
            if st is None:
                continue
            for kind, ln, off in walk_elements(st):
                if kind == 0:
                    n_lits += 1
                    continue
                n_copies += 1
                copy_bytes += ln
                saved = ln - 3
                b = ("4-7" if ln < 8 else "8-15" if ln < 16
                     else "16-63" if ln < 64 else "64+")
                len_hist[b] += ln
                key = off if off <= 64 else (128 if off <= 128 else
                                             (1 << (off - 1).bit_length()))
                off_hist[key] = off_hist.get(key, 0) + saved
                if off % 16 == 0:
                    align_saved[16] += saved
                elif off % 8 == 0:
                    align_saved[8] += saved
                elif off % 4 == 0:
                    align_saved[4] += saved
                else:
                    align_saved["other"] += saved
        print(f"  ref elements: {n_copies} copies / {n_lits} literals, "
              f"copy-covered {copy_bytes/1e6:.2f} MB")
        print(f"  savings by offset alignment: mod16={align_saved[16]}, "
              f"mod8(only)={align_saved[8]}, mod4(only)={align_saved[4]}, "
              f"unaligned={align_saved['other']}")
        top = sorted(off_hist.items(), key=lambda kv: -kv[1])[:8]
        print(f"  top offset buckets (<=64 exact, then pow2) by saved bytes: {top}")
        # exact offsets (no bucketing) — candidate-set design input
        exact: dict = {}
        for st in ref_streams:
            if st is None:
                continue
            for kind, ln, off in walk_elements(st):
                if kind == 1:
                    exact[off] = exact.get(off, 0) + ln - 3
        topx = sorted(exact.items(), key=lambda kv: -kv[1])[:12]
        print(f"  top EXACT offsets by saved bytes: {topx}")
        print(f"  copy bytes by length class: {len_hist}")
        for g in (4, 8, 16):
            b = realigned_ref_bound(ref_streams, S, g)
            print(f"  ref matches snapped to {g}-byte lattice: {b/1e6:.3f}M "
                  f"({b/ref_total:.3f}x ref)")

        # --- restricted schemes
        # row stride in bytes: one 4-pixel block row of 16-byte blocks
        rowb = 4 * W  # == (W//4 blocks) * 16 bytes for BC3-family payloads
        d16 = [16, 32, 48, 64, 128, 256, rowb - 16, rowb, rowb + 16, 2 * rowb]
        rows = []
        for name, g, mode, kw in [
            ("word4 last-occ 64K", 4, "last", {}),
            ("group8 last-occ 64K", 8, "last", {}),
            ("w4 bestrun d16-set+row", 4, "bestrun",
             {"cands": [d // 4 for d in d16]}),
            ("w4 bestrun d16-set+row minrun2", 4, "bestrun",
             {"cands": [d // 4 for d in d16], "min_run": 2}),
            ("g8 bestrun d16-set+row", 8, "bestrun",
             {"cands": [d // 8 for d in d16 if d % 8 == 0]}),
            ("g16 bestrun d16-set+row", 16, "bestrun",
             {"cands": [d // 16 for d in d16 if d % 16 == 0]}),
            ("w4 bestrun wide", 4, "bestrun",
             {"cands": sorted({d // 4 for d in (
                 [16, 32, 48, 64, 80, 96, 128, 192, 256, 384, 512, 1024,
                  2048, 4096, rowb - 32, rowb - 16, rowb, rowb + 16,
                  rowb + 32, 2 * rowb, 3 * rowb, 4 * rowb])})}),
            ("w4 bestrun wide+ext", 4, "bestrun", {"extend": True,
             "cands": sorted({d // 4 for d in (
                 [16, 32, 48, 64, 80, 96, 128, 192, 256, 384, 512, 1024,
                  2048, 4096, rowb - 32, rowb - 16, rowb, rowb + 16,
                  rowb + 32, 2 * rowb, 3 * rowb, 4 * rowb])})}),
            ("w4 bestrun mult16-256+ext", 4, "bestrun", {"extend": True,
             "cands": sorted({d // 4 for d in (
                 list(range(16, 257, 16)) + [320, 384, 512, 768, 1024,
                  2048, 4096, rowb - 32, rowb - 16, rowb, rowb + 16,
                  rowb + 32, 2 * rowb, 3 * rowb, 4 * rowb])})}),
            ("w4 bestrun mult16-512+ext", 4, "bestrun", {"extend": True,
             "cands": sorted({d // 4 for d in (
                 list(range(16, 513, 16)) + [768, 1024, 1536, 2048, 3072,
                  4096, 6144, 8192, rowb - 32, rowb - 16, rowb, rowb + 16,
                  rowb + 32, 2 * rowb, 3 * rowb, 4 * rowb])})}),
            ("w8key bestrun mult16-256+ext", 8, "bestrun", {"extend": True,
             "cands": sorted({d // 8 for d in (
                 list(range(16, 257, 16)) + [320, 384, 512, 768, 1024,
                  2048, 4096, rowb - 32, rowb - 16, rowb, rowb + 16,
                  rowb + 32, 2 * rowb, 3 * rowb, 4 * rowb]) if d % 8 == 0})}),
        ] + [
            (f"w4 bestrun mult16-256+ext minrun{mr}", 4, "bestrun",
             {"extend": True, "min_run": mr,
              "cands": sorted({d // 4 for d in (
                  list(range(16, 257, 16)) + [320, 384, 512, 768, 1024,
                   2048, 4096, rowb - 32, rowb - 16, rowb, rowb + 16,
                   rowb + 32, 2 * rowb, 3 * rowb, 4 * rowb])})})
            for mr in (2, 4, 8, 16)
        ]:
            t1 = time.time()
            tot, pc, runs, nr = simulate(payload, C, g, mode, **kw)
            rows.append((name, tot, pc, runs, nr, time.time() - t1))
        print(f"  {'scheme':44s} {'bytes':>10s} {'x raw':>7s} {'x ref':>7s} "
              f"{'elems':>8s} {'runs':>7s} {'raw ch':>6s}")
        for name, tot, pc, runs, nr, dt in rows:
            print(f"  {name:44s} {tot/1e6:9.3f}M {tot/raw:7.3f} "
                  f"{tot/ref_total:7.3f} {pc:8d} {runs:7d} {nr:6d}  [{dt:.1f}s]")


if __name__ == "__main__":
    main()
