"""Device LZ encoder: planning + reference emission correctness.

Every emitted stream must be CONFORMING snappy (decodable by the pure-
Python reference decoder and, where available, the real google snappy via
the oracle) and decode bit-exactly to the chunk payload. Ratios on
structured content must beat raw storage (the r4 gap this closes)."""

import numpy as np
import pytest

from hap_tpu.snappy import pyref
from hap_tpu.snappy.device_lz import (
    LzPlan,
    MIN_RUN_WORDS,
    SEG_SLOTS,
    candidate_distances,
    emit_reference,
    lz_bound,
    plan_lz,
)


def _roundtrip_chunks(data: np.ndarray, S: int, row_bytes: int = 256):
    plan = plan_lz(data, S, 8, row_bytes)
    streams = emit_reference(data, plan, S)
    comp_len = np.asarray(plan.comp_len)
    for c, st in enumerate(streams):
        assert len(st) == comp_len[c]
        dec = pyref.decompress(st)
        assert dec == data[c].tobytes(), f"chunk {c} mismatch"
    return plan, streams


def test_flat_content_compresses_hard():
    # constant payload: one seed literal + long copy runs
    data = np.full((2, 4096), 0xAB, np.uint8)
    data[1, :16] = np.arange(16)  # slightly different seed
    plan, streams = _roundtrip_chunks(data, 4096)
    assert all(len(s) < 4096 // 8 for s in streams)


def test_periodic_blocks_match_at_stride():
    # repeating 16-byte "block" rows (BC3-like): matches at d=16
    rng = np.random.default_rng(0)
    block = rng.integers(0, 256, 16, dtype=np.uint8)
    data = np.tile(block, 512)[None, :]  # (1, 8192)
    plan, streams = _roundtrip_chunks(data, 8192)
    assert len(streams[0]) < 8192 // 4


def test_random_payload_stays_near_raw():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (2, 4096), dtype=np.uint8)
    plan = plan_lz(data, 4096, 8, 256)
    # incompressible: planner must report cost >= raw so the chunk
    # falls back to raw storage (hap.c:460-466 semantics upstream)
    assert np.asarray(plan.comp_len).min() >= 4096 - 64
    streams = emit_reference(data, plan, 4096)
    for c, st in enumerate(streams):
        assert pyref.decompress(st) == data[c].tobytes()


def test_mixed_content_roundtrip():
    rng = np.random.default_rng(2)
    S = 16384
    data = np.zeros((3, S), np.uint8)
    # flat band + random band + periodic band per chunk, different splits
    for c in range(3):
        a = rng.integers(0, 256, S, dtype=np.uint8)
        cut1, cut2 = (c + 1) * S // 6, S // 2 + c * S // 8
        a[:cut1] = 7 * c + 1
        block = rng.integers(0, 256, 16, dtype=np.uint8)
        a[cut2:] = np.tile(block, -(-(S - cut2) // 16))[: S - cut2]
        data[c] = a
    _roundtrip_chunks(data, S)


def test_vertical_stride_matches():
    # rows repeat at a "block row" stride of 480 bytes (mult of 16)
    rng = np.random.default_rng(3)
    row = rng.integers(0, 256, 480, dtype=np.uint8)
    noise_row = rng.integers(0, 256, 480, dtype=np.uint8)
    rows = [row if i % 2 == 0 else noise_row for i in range(17)]
    data = np.concatenate(rows)[: 480 * 17][None, :]
    S = data.shape[1]
    assert S % 4 == 0
    plan = plan_lz(data, S, 8, row_bytes=960)
    streams = emit_reference(data, plan, S)
    assert pyref.decompress(streams[0]) == data[0].tobytes()
    # rows 2..16 match at d=960 -> heavy compression
    assert len(streams[0]) < S // 2


def test_oracle_decodes_lz_streams():
    from hap_tpu import oracle

    if not oracle.available():
        pytest.skip("oracle unavailable")
    rng = np.random.default_rng(4)
    S = 8192
    block = rng.integers(0, 256, 16, dtype=np.uint8)
    data = np.tile(block, S // 16)[None, :].copy()
    data[0, S // 2 : S // 2 + 37] = rng.integers(0, 256, 37, dtype=np.uint8)
    plan = plan_lz(data, S, 8, 256)
    streams = emit_reference(data, plan, S)
    assert oracle.snappy_uncompress(streams[0]) == data[0].tobytes()
    assert oracle.snappy_validate(streams[0])


def test_byte_extension_is_exact():
    # a copy region whose byte-level match extends past the word lattice:
    # period-16 block with a mid-stream partial-word mutation
    rng = np.random.default_rng(5)
    block = rng.integers(0, 256, 16, dtype=np.uint8)
    data = np.tile(block, 256)[None, :].copy()  # (1, 4096)
    data[0, 1001] ^= 0xFF  # breaks byte inside a word
    data[0, 2002] ^= 0x0F
    plan = plan_lz(data, 4096, 8, 256)
    streams = emit_reference(data, plan, 4096)
    assert pyref.decompress(streams[0]) == data[0].tobytes()


def test_min_run_demotion_bounds_pieces():
    # alternating 16-byte match / 4-byte literal worst case: piece counts
    # stay bounded by the min-run demotion + segment slot cap
    rng = np.random.default_rng(6)
    S = 8192
    base = rng.integers(0, 256, S, dtype=np.uint8)
    data = base.copy()
    # every second word differs -> only isolated word matches at d=16
    data[::8] = rng.integers(0, 256, len(data[::8]), dtype=np.uint8)
    data = data[None, :]
    plan = plan_lz(data, S, 8, 256)
    counts = np.asarray(plan.counts)
    assert counts.max() <= SEG_SLOTS
    streams = emit_reference(data, plan, S)
    assert pyref.decompress(streams[0]) == data[0].tobytes()


def test_candidate_distances_static_properties():
    for S, rb in [(4096, 256), (131072, 15360), (131072, 61440)]:
        cands = candidate_distances(S, rb)
        assert len(cands) <= 28
        assert all(c % 4 == 0 and 4 <= c < min(S, 65536) for c in cands)
        assert list(cands) == sorted(cands)
    assert lz_bound(4096) > 4096


def test_plan_comp_len_matches_emission():
    rng = np.random.default_rng(7)
    S = 4096
    data = np.tile(rng.integers(0, 256, 16, dtype=np.uint8), S // 16)
    data = np.stack([data, rng.integers(0, 256, S, dtype=np.uint8)])
    plan = plan_lz(data, S, 8, 256)
    streams = emit_reference(data, plan, S)
    for c, st in enumerate(streams):
        assert len(st) == int(np.asarray(plan.comp_len)[c])


def _kernel_matches_reference(data: np.ndarray, S: int, row_bytes: int):
    import jax.numpy as jnp

    from hap_tpu.snappy.pallas_lz import emit_lz_streams

    plan = plan_lz(jnp.asarray(data), S, 8, row_bytes)
    ref = emit_reference(data, plan, S)
    out = np.asarray(emit_lz_streams(
        jnp.asarray(data), plan.tables_lit, plan.tables_copy,
        plan.counts, S))
    comp_len = np.asarray(plan.comp_len)
    for c in range(data.shape[0]):
        got = out[c, : comp_len[c]].tobytes()
        assert got == ref[c], (
            f"chunk {c}: kernel stream differs at byte "
            f"{next(i for i, (a, b) in enumerate(zip(got, ref[c])) if a != b)}"
        )


def test_emit_kernel_bit_identical_flat():
    data = np.full((2, 4096), 0xAB, np.uint8)
    data[1, :16] = np.arange(16)
    _kernel_matches_reference(data, 4096, 256)


def test_emit_kernel_bit_identical_mixed():
    rng = np.random.default_rng(12)
    S = 16384
    data = np.zeros((5, S), np.uint8)
    for c in range(5):
        a = rng.integers(0, 256, S, dtype=np.uint8)
        cut1, cut2 = (c + 1) * S // 8, S // 2 + c * S // 10
        a[:cut1] = 3 * c + 2
        block = rng.integers(0, 256, 16, dtype=np.uint8)
        a[cut2:] = np.tile(block, -(-(S - cut2) // 16))[: S - cut2]
        # sprinkle partial-word mutations to exercise byte extensions
        for p in rng.integers(cut2, S - 1, 5):
            a[p] ^= 0x5A
        data[c] = a
    _kernel_matches_reference(data, S, 960)


def test_emit_kernel_bit_identical_dxt():
    import jax.numpy as jnp

    from hap_tpu.pipeline.device_pipeline import _encode_blocks

    H = W = 64
    rng = np.random.default_rng(13)
    img = rng.integers(0, 40, (H, W, 3), dtype=np.uint8)
    img[: H // 2] = [9, 200, 120]
    words = _encode_blocks("hap_q", jnp.asarray(img))
    payload = np.ascontiguousarray(np.asarray(words), dtype="<u4").tobytes()
    S = len(payload) // 2
    data = np.frombuffer(payload, np.uint8).reshape(2, S)
    _kernel_matches_reference(data, S, 4 * W)


def _decode_roundtrip(data: np.ndarray, S: int, row_bytes: int):
    import jax.numpy as jnp

    from hap_tpu.snappy.device_lz import lz_bound
    from hap_tpu.snappy.pallas_lz import decode_lz_streams, emit_lz_streams

    plan = plan_lz(jnp.asarray(data), S, 8, row_bytes)
    comp = emit_lz_streams(jnp.asarray(data), plan.tables_lit,
                           plan.tables_copy, plan.counts, S)
    out, ok = decode_lz_streams(comp, plan.comp_len, S)
    assert np.asarray(ok).all(), np.asarray(ok)
    np.testing.assert_array_equal(np.asarray(out), data)


def test_decode_kernel_roundtrips_lz_streams():
    rng = np.random.default_rng(21)
    S = 16384
    data = np.zeros((3, S), np.uint8)
    for c in range(3):
        a = rng.integers(0, 256, S, dtype=np.uint8)
        a[: S // 3] = 5 * c + 3
        block = rng.integers(0, 256, 16, dtype=np.uint8)
        a[S // 2 :] = np.tile(block, -(-(S - S // 2) // 16))[: S - S // 2]
        for p in rng.integers(S // 2, S - 1, 4):
            a[p] ^= 0x77
        data[c] = a
    _decode_roundtrip(data, S, 960)


def test_decode_kernel_handles_raw_and_mixed_chunks():
    import jax.numpy as jnp

    from hap_tpu.snappy.device_lz import lz_bound
    from hap_tpu.snappy.pallas_lz import (
        decode_lz_streams_from_frame,
        emit_lz_streams,
    )

    rng = np.random.default_rng(22)
    S = 8192
    flat = np.full(S, 0x3C, np.uint8)
    noisy = rng.integers(0, 256, S, dtype=np.uint8)
    data = np.stack([flat, noisy])
    plan = plan_lz(jnp.asarray(data), S, 8, 256)
    comp = np.asarray(emit_lz_streams(
        jnp.asarray(data), plan.tables_lit, plan.tables_copy,
        plan.counts, S))
    comp_len = np.asarray(plan.comp_len).copy()
    assert comp_len[0] < S and comp_len[1] >= S  # per-chunk raw fallback
    # frame layout: [chunk0 compressed][chunk1 raw]
    frame = np.concatenate([comp[0, : comp_len[0]], noisy])
    offs = np.asarray([0, comp_len[0]], np.int32)
    lens = np.asarray([comp_len[0], S], np.int32)
    is_comp = np.asarray([True, False])
    out, ok = decode_lz_streams_from_frame(
        jnp.asarray(frame), jnp.asarray(offs), jnp.asarray(lens),
        jnp.asarray(is_comp), S)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), data)


def test_decode_kernel_accepts_legacy_rle_streams():
    # the RLE structured profile (snappy/device.py) is a sub-language:
    # big literals + copy2(offset=G) runs — the LZ walker must decode it
    import jax.numpy as jnp

    from hap_tpu.snappy.device import snappy_encode_chunks
    from hap_tpu.snappy.pallas_lz import decode_lz_streams

    S, G = 8192, 16
    rng = np.random.default_rng(23)
    block = rng.integers(0, 256, G, dtype=np.uint8)
    periodic = np.tile(block, S // G)
    lit = rng.integers(0, 256, S, dtype=np.uint8)
    data = np.stack([periodic, lit])
    comp, comp_len = snappy_encode_chunks(jnp.asarray(data), S, G,
                                          impl="xla")
    out, ok = decode_lz_streams(comp, comp_len, S)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), data)


def test_decode_kernel_rejects_foreign_streams():
    # copy-1 elements and offsets < 8 are outside the device profile and
    # must flag not-ok (host-fallback contract). Hand-built conforming
    # streams (the elements google snappy emits for short nearby matches).
    import jax.numpy as jnp

    from hap_tpu.snappy.pallas_lz import decode_lz_streams

    S = 256
    rng = np.random.default_rng(24)
    base = rng.integers(0, 256, S, dtype=np.uint8).tobytes()

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | 0x80 if v else b7])
            if not v:
                return out

    # stream A: 100-byte literal + copy-1(len 6, off 50) + literal tail
    stA = varint(S)
    stA += bytes([60 << 2, 99]) + base[:100]
    stA += bytes([1 | ((6 - 4) << 2), 50])  # copy-1
    rest = S - 106
    stA += bytes([60 << 2, rest - 1]) + base[100 : 100 + rest]
    # stream B: 8-byte literal + copy-2(len 64, offset 4) + tail literal
    stB = varint(S)
    stB += bytes([7 << 2]) + base[:8]
    stB += bytes([2 | (63 << 2), 4, 0])  # offset 4 < 8: rejected
    rest = S - 72
    stB += bytes([60 << 2, rest - 1]) + base[72 : 72 + rest]

    B = 512
    comp = np.zeros((2, B), np.uint8)
    comp[0, : len(stA)] = np.frombuffer(stA, np.uint8)
    comp[1, : len(stB)] = np.frombuffer(stB, np.uint8)
    lens = np.asarray([len(stA), len(stB)], np.int32)
    out, ok = decode_lz_streams(jnp.asarray(comp), jnp.asarray(lens), S)
    assert not np.asarray(ok).any(), np.asarray(ok)


def test_decode_kernel_accepts_in_profile_foreign_streams():
    # conversely: a conforming stream that stays inside the profile
    # (copy-2, offsets >= 8) decodes bit-exactly even when it came from
    # another encoder — here pyref on an 8-periodic payload
    import jax.numpy as jnp

    from hap_tpu.snappy.pallas_lz import decode_lz_streams

    rng = np.random.default_rng(25)
    S = 4096
    payload = np.tile(rng.integers(0, 256, 8, dtype=np.uint8), S // 8)
    st = np.frombuffer(pyref.compress(payload.tobytes()), np.uint8)
    B = 4608
    comp = np.zeros((1, B), np.uint8)
    comp[0, : len(st)] = st
    out, ok = decode_lz_streams(
        jnp.asarray(comp), jnp.asarray([len(st)], np.int32), S)
    # the walker either decodes it bit-exactly (all elements in-profile)
    # or rejects it cleanly — never returns ok with wrong bytes
    if bool(np.asarray(ok)[0]):
        np.testing.assert_array_equal(np.asarray(out)[0], payload)


def test_dxt_payload_ratio_beats_raw():
    # a small real BCn payload via the pipeline encoder: graphics-like
    # content must compress (the r4 device encoder stored this raw)
    import jax.numpy as jnp

    from hap_tpu.pipeline.device_pipeline import _encode_blocks

    H = W = 128
    img = np.zeros((H, W, 3), np.uint8)
    img[:, : W // 2] = [200, 30, 40]  # flat half
    img[:, W // 2 :] = np.linspace(0, 255, W // 2, dtype=np.uint8)[None, :, None]
    words = _encode_blocks("hap_q", jnp.asarray(img))
    payload = np.ascontiguousarray(np.asarray(words), dtype="<u4").tobytes()
    S = len(payload) // 2
    data = np.frombuffer(payload, np.uint8).reshape(2, S)
    plan = plan_lz(data, S, 16, row_bytes=4 * W)
    streams = emit_reference(data, plan, S)
    total = sum(min(len(s), S) for s in streams)
    assert total < 0.8 * len(payload)
    for c, st in enumerate(streams):
        assert pyref.decompress(st) == data[c].tobytes()
