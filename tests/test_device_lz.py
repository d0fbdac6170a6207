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
