"""General (any-conforming-stream) on-device Snappy decoder tests.

The structured kernels only accept this framework's emission profile;
``decode_any_streams`` must decode arbitrary streams — everything the
reference ecosystem's encoders can legally produce via google/snappy
(hap.c:453) — and flag malformed input per-chunk without faulting.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hap_tpu.snappy import pyref
from hap_tpu.snappy.pallas_general import decode_any_streams


def _pack(streams, S_max):
    """list[bytes] -> padded (C, B) uint8 + lengths, via pyref lengths."""
    B = max(len(s) for s in streams)
    B = -(-B // 128) * 128
    comp = np.zeros((len(streams), B), np.uint8)
    clen = np.zeros(len(streams), np.int32)
    for i, s in enumerate(streams):
        comp[i, : len(s)] = np.frombuffer(s, np.uint8)
        clen[i] = len(s)
    return jnp.asarray(comp), jnp.asarray(clen)


def _roundtrip(payloads, S_max=None):
    S_max = S_max or max(len(p) for p in payloads)
    streams = [pyref.compress(p) for p in payloads]
    comp, clen = _pack(streams, S_max)
    ulen = jnp.asarray([len(p) for p in payloads], jnp.int32)
    out, ok = decode_any_streams(comp, clen, ulen, S_max)
    out, ok = np.asarray(out), np.asarray(ok)
    assert ok.all(), f"ok={ok.tolist()}"
    for i, p in enumerate(payloads):
        assert out[i, : len(p)].tobytes() == p, f"row {i} mismatch"


def _content(kind, n, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "random":
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return bytes(n)
    if kind == "periodic":  # long overlapping-copy runs, period 16
        return (bytes(range(16)) * (n // 16 + 1))[:n]
    if kind == "text":  # literal/copy mix with varied offsets
        words = [b"hap", b"snappy", b"tpu", b"chunk", b"frame", b"pallas"]
        out = bytearray()
        while len(out) < n:
            out += words[rng.integers(0, len(words))] + b" "
        return bytes(out[:n])
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["random", "zeros", "periodic", "text"])
@pytest.mark.parametrize("n", [1, 7, 127, 128, 1000, 5000])
def test_roundtrip_content_kinds(kind, n):
    _roundtrip([_content(kind, n, seed=n)])


def test_many_chunks_mixed_content_odd_count():
    payloads = [
        _content(k, n, seed=i)
        for i, (k, n) in enumerate(
            [("random", 900), ("zeros", 900), ("text", 900), ("periodic", 900),
             ("text", 123), ("zeros", 1), ("random", 899)]
        )
    ]
    _roundtrip(payloads, S_max=900)


def test_long_literal_classes():
    # Hand-built streams exercising every literal length class (1-5 byte
    # headers). Class 62/63 need lengths > 65536 — keep S modest but real.
    for n in (1, 59, 60, 61, 255, 256, 257, 4096, 65537, 70000):
        data = _content("random", n, seed=n)
        out = bytearray(pyref.write_varint(n) if hasattr(pyref, "write_varint") else b"")
        from hap_tpu.snappy.format import write_varint

        out = bytearray(write_varint(n))
        m = n - 1
        if m < 60:
            out.append(m << 2)
        elif m < 256:
            out += bytes([60 << 2, m])
        elif m < 65536:
            out += bytes([61 << 2]) + m.to_bytes(2, "little")
        else:
            out += bytes([62 << 2]) + m.to_bytes(3, "little")
        out += data
        comp, clen = _pack([bytes(out)], n)
        res, ok = decode_any_streams(comp, clen, jnp.asarray([n], jnp.int32), n)
        assert np.asarray(ok).all(), n
        assert np.asarray(res)[0, :n].tobytes() == data, n


def test_all_copy_kinds_and_overlaps():
    from hap_tpu.snappy.format import write_varint

    # literal "abcdefgh", then: copy1(off=8,len=8); copy2(off=16,len=16);
    # copy1(off=1,len=11) RLE; copy2(off=3,len=64) period-3;
    # copy4(off=99,len=7); copy2(off=107,len=40) (= off==already-written).
    lit = bytes(range(97, 105))
    expect = bytearray(lit)
    stream = bytearray()
    stream += bytes([(len(lit) - 1) << 2]) + lit

    def copy1(off, ln):
        stream.append(0x01 | ((ln - 4) << 2) | ((off >> 8) << 5))
        stream.append(off & 0xFF)
        for i in range(ln):
            expect.append(expect[len(expect) - off])

    def copy2(off, ln):
        stream.append(0x02 | ((ln - 1) << 2))
        stream.extend(off.to_bytes(2, "little"))
        for i in range(ln):
            expect.append(expect[len(expect) - off])

    def copy4(off, ln):
        stream.append(0x03 | ((ln - 1) << 2))
        stream.extend(off.to_bytes(4, "little"))
        for i in range(ln):
            expect.append(expect[len(expect) - off])

    copy1(8, 8)
    copy2(16, 16)
    copy1(1, 11)
    copy2(3, 64)
    copy4(99, 7)
    copy2(107, 40)
    n = len(expect)
    full = write_varint(n) + bytes(stream)
    # Cross-check the hand-built expectation against the oracle decoder.
    assert pyref.decompress(full) == bytes(expect)
    comp, clen = _pack([full], n)
    out, ok = decode_any_streams(comp, clen, jnp.asarray([n], jnp.int32), n)
    assert np.asarray(ok).all()
    assert np.asarray(out)[0, :n].tobytes() == bytes(expect)


def test_malformed_streams_flag_not_ok():
    from hap_tpu.snappy.format import write_varint

    good = pyref.compress(_content("text", 500, seed=3))
    cases = []
    # 1: truncated stream
    cases.append((good[: len(good) // 2], 500))
    # 2: preamble mismatch
    cases.append((write_varint(400) + good[len(write_varint(500)) :], 500))
    # 3: copy with offset 0
    cases.append((write_varint(8) + bytes([3 << 2]) + b"abcd" + bytes([0x02 | (3 << 2), 0, 0]), 8))
    # 4: copy offset beyond written output
    cases.append((write_varint(8) + bytes([3 << 2]) + b"abcd" + bytes([0x02 | (3 << 2), 200, 0]), 8))
    # 5: literal overrunning declared output
    cases.append((write_varint(4) + bytes([7 << 2]) + b"abcdefgh", 4))
    # 6: trailing garbage after completing output
    cases.append((write_varint(4) + bytes([3 << 2]) + b"abcd" + b"\xff\xff", 4))
    # 7: varint that never terminates
    cases.append((b"\xff\xff\xff\xff\xff\xff" + b"aaaa", 4))
    # 8: empty stream
    cases.append((b"", 4))

    for i, (blob, n) in enumerate(cases):
        with pytest.raises(Exception):
            pyref.decompress(blob, expected_length=n)
    S_max = 512
    comp, clen = _pack([c[0] if c[0] else b"\x00" for c in cases], S_max)
    clen = jnp.asarray([len(c[0]) for c in cases], jnp.int32)
    ulen = jnp.asarray([c[1] for c in cases], jnp.int32)
    out, ok = decode_any_streams(comp, clen, ulen, S_max)
    assert not np.asarray(ok).any(), np.asarray(ok).tolist()


def test_good_and_bad_chunks_mixed():
    goods = [pyref.compress(_content("text", 300, seed=i)) for i in range(3)]
    bad = goods[1][:10]
    streams = [goods[0], bad, goods[2]]
    comp, clen = _pack(streams, 300)
    ulen = jnp.asarray([300, 300, 300], jnp.int32)
    out, ok = decode_any_streams(comp, clen, ulen, 300)
    ok = np.asarray(ok)
    assert ok.tolist() == [True, False, True]
    assert np.asarray(out)[0].tobytes() == _content("text", 300, seed=0)
    assert np.asarray(out)[2].tobytes() == _content("text", 300, seed=2)


@pytest.mark.parametrize("impl", ["hybrid", "branch", "interleaved", "serial"])
def test_impl_matrix(impl):
    """Every selectable kernel variant passes one combined scenario:
    mixed content (roundtrip incl. overlap copies), a malformed row, and a
    good/bad mix — so no env-selectable kernel ships suite-untested
    (CLAUDE.md §4: interpret-mode coverage before silicon)."""
    payloads = [
        _content("periodic", 700, seed=1),  # overlap copies, period 16
        _content("text", 543, seed=2),
        _content("random", 700, seed=3),
        _content("zeros", 700, seed=4),
    ]
    streams = [pyref.compress(p) for p in payloads]
    streams.append(streams[1][:9])  # truncated -> malformed
    payloads.append(b"\x00" * 543)
    comp, clen = _pack(streams, 700)
    ulen = jnp.asarray([len(p) for p in payloads], jnp.int32)
    out, ok = decode_any_streams(comp, clen, ulen, 700, impl=impl)
    out, ok = np.asarray(out), np.asarray(ok)
    assert ok.tolist() == [True, True, True, True, False]
    for i, p in enumerate(payloads[:4]):
        assert out[i, : len(p)].tobytes() == p, f"impl={impl} row {i}"


def test_against_native_cpp_encoder():
    """Streams from the C++ runtime's general matcher decode identically."""
    try:
        from hap_tpu import native

        native.load()
    except Exception:
        pytest.skip("native runtime unavailable")
    payloads = [
        _content("text", 4096, seed=11),
        _content("periodic", 4096, seed=12),
        _content("random", 4096, seed=13),
    ]
    streams = [native.snappy_compress(p) for p in payloads]
    comp, clen = _pack(streams, 4096)
    ulen = jnp.asarray([4096] * 3, jnp.int32)
    out, ok = decode_any_streams(comp, clen, ulen, 4096)
    assert np.asarray(ok).all()
    for i, p in enumerate(payloads):
        assert np.asarray(out)[i].tobytes() == p
