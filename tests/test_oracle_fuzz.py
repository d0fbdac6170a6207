"""Differential malformed-frame fuzzing against the REAL reference decoder.

The reference defines an exact accept/reject surface (bounds checks at
hap.c:142-145,161-164,178-184,840-843,895-898,911-914; 5-value HapResult,
hap.h:55-61). Internal-consistency fuzzing (test_device_decode_fuzz.py)
cannot catch a parser that is accidentally more lenient or stricter than
hap.c on malformed input — so this file mutates real frames (structural
bytes, truncations, extensions, type nibbles) plus random blobs and, for
every mutant, asserts that our host parser (pure Python), the C++ runtime,
and the real compiled HapDecode agree accept/reject — and byte-for-byte on
accept.

The real decoder is driven in a crash-tolerant worker subprocess: hap.c
SEGFAULTS on size-table mutations (the chunk input pointers are a running
sum of stored compressed sizes, hap.c:800-807, never validated against
the input buffer length before snappy reads them) — found by this fuzz.
Our parsers reject those frames with Bad_Frame instead; a reference crash
is therefore classified as "reject" (documented in FORMAT_NOTES.md,
"Malformed-frame rejection parity"). That asymmetry aside, any deliberate
divergence must be documented there and encoded here explicitly —
currently there are none.
"""

import numpy as np
import pytest

from hap_tpu import oracle

if not oracle.available():
    pytest.skip("oracle toolchain unavailable", allow_module_level=True)

from hap_tpu.constants import HapError, TextureFormat
from hap_tpu.container.parse import frame_texture_format
from hap_tpu.pipeline.codecs import _decode_texture_python
from hap_tpu.snappy import pyref


def _ours_python(frame: bytes):
    """(payload, fmt) or None via the pure-Python host path."""
    try:
        fmt = frame_texture_format(frame, 0)
        return _decode_texture_python(frame, 0), int(fmt)
    except Exception:
        return None


def _ours_native(frame: bytes):
    try:
        from hap_tpu import native

        payload, fmt = native.decode(frame, 0)
        return payload, int(fmt)
    except HapError:
        return None
    except Exception:
        return None


def _worker_main(conn):
    """Child process: decode (and introspect) frames shipped over the pipe
    with the real compiled library; a segfault kills only this process.

    The frame is placed flush against a PROT_NONE guard page so that ANY
    read past the input buffer — hap.c has no input-extent validation on
    chunk data (hap.c:794-838) — faults deterministically instead of
    silently returning heap garbage. "Real accepts by reading out of
    bounds" is undefined behavior, not an acceptance we must match.
    """
    import ctypes
    import mmap

    libc = ctypes.CDLL(None, use_errno=True)
    page = mmap.PAGESIZE
    npages = 16  # frames under 60 KB
    buf = mmap.mmap(-1, (npages + 1) * page)
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    assert libc.mprotect(ctypes.c_void_p(addr + npages * page), page, 0) == 0

    while True:
        try:
            msg = conn.recv_bytes()
        except EOFError:
            return
        mode, frame = msg[:1], msg[1:]
        assert len(frame) <= npages * page
        start = npages * page - len(frame)
        buf[start: npages * page] = frame
        guarded = (ctypes.c_char * max(len(frame), 1)).from_buffer(
            buf, start)
        try:
            if mode == b"d":
                try:
                    payload, fmt = oracle.decode_raw(guarded, len(frame), 0)
                    conn.send(("ok", payload, int(fmt)))
                except oracle.OracleError:
                    conn.send(("reject", None, None))
            else:  # introspection trio (count / format@0 / chunk_count@0)
                out = []
                for fn in (oracle.texture_count,
                           lambda f: oracle.texture_format(f, 0),
                           lambda f: oracle.texture_chunk_count(f, 0)):
                    try:
                        out.append(fn(bytes(frame)))
                    except oracle.OracleError:
                        out.append(None)
                conn.send(("trio", out, None))
        finally:
            del guarded


class _RealOracle:
    """Crash-tolerant driver for the real compiled HapDecode."""

    def __init__(self):
        self._proc = None
        self._conn = None
        self.crashes = 0

    def _spawn(self):
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(target=_worker_main, args=(child,),
                                 daemon=True)
        self._proc.start()
        child.close()

    def _call(self, mode: bytes, frame: bytes):
        if self._proc is None or not self._proc.is_alive():
            self._spawn()
        try:
            self._conn.send_bytes(mode + frame)
            return self._conn.recv()
        except (EOFError, BrokenPipeError, ConnectionResetError):
            self.crashes += 1
            self._proc.join()
            self._proc = None
            return ("crash", None, None)

    def decode(self, frame: bytes):
        """(payload, fmt), None (reject), or "crash" (hap.c segfaulted)."""
        kind, payload, fmt = self._call(b"d", frame)
        if kind == "crash":
            return "crash"
        return (payload, fmt) if kind == "ok" else None

    def trio(self, frame: bytes):
        """[count|None, format|None, chunk_count|None], or "crash"."""
        kind, out, _ = self._call(b"t", frame)
        return "crash" if kind == "crash" else out


_REAL = _RealOracle()


def _real(frame: bytes):
    return _REAL.decode(frame)


def _base_frames():
    rng = np.random.default_rng(11)
    frames = []
    # structured + noisy payload halves -> snappy and raw chunks both appear
    pay1 = bytes(bytes([17]) * 600) + rng.integers(0, 256, 424, np.uint8).tobytes()
    frames.append(oracle.encode([pay1], [int(TextureFormat.RGB_DXT1)], [1], [1]))
    pay2 = (np.arange(2048, dtype=np.uint8) // 7).tobytes()
    frames.append(
        oracle.encode([pay2], [int(TextureFormat.YCoCg_DXT5)], [1], [4]))
    # two-texture frame (YCoCg-DXT5 + RGTC1)
    pay3 = rng.integers(0, 256, 1024, np.uint8).tobytes()
    pay4 = bytes(512)
    frames.append(
        oracle.encode([pay3, pay4],
                      [int(TextureFormat.YCoCg_DXT5), int(TextureFormat.A_RGTC1)],
                      [1, 1], [2, 2]))
    # our own encoder's output as a base too (host serializer layout)
    import jax.numpy as jnp

    from hap_tpu.pipeline.codecs import encode_frame

    img = np.asarray(rng.integers(0, 256, (16, 24, 4)), np.uint8)
    img[:8] = 5
    frames.append(bytes(encode_frame(jnp.asarray(img), "hap_alpha",
                                     chunk_count=3)))
    return frames


def _check_one(mut: bytes):
    real = _real(mut)
    ours = _ours_python(mut)
    ours_n = _ours_native(mut)
    if real == "crash":
        # hap.c segfaulted (see module docstring): we must reject, not crash
        assert ours is None, "python parser accepts a frame that crashes hap.c"
        assert ours_n is None, "C++ runtime accepts a frame that crashes hap.c"
        return False
    if real is None:
        assert ours is None, "python parser accepts a frame hap.c rejects"
        assert ours_n is None, "C++ runtime accepts a frame hap.c rejects"
    else:
        assert ours is not None, "python parser rejects a frame hap.c accepts"
        assert ours_n is not None, "C++ runtime rejects a frame hap.c accepts"
        assert ours[0] == real[0] and ours[1] == real[1], "payload mismatch"
        assert ours_n[0] == real[0] and ours_n[1] == real[1]
    return real is not None


def test_single_byte_mutations_structural():
    rng = np.random.default_rng(0)
    frames = _base_frames()
    n_total = n_accept = 0
    for frame in frames:
        arr = np.frombuffer(frame, np.uint8).copy()
        # bias toward structure: every byte of the first 64 (headers,
        # decode-instructions container, table headers), plus random
        # interior positions
        positions = list(range(min(64, len(arr)))) + [
            int(rng.integers(0, len(arr))) for _ in range(60)
        ]
        for pos in positions:
            for val in (0x00, 0xFF, int(rng.integers(0, 256)),
                        int(arr[pos]) ^ 0x10):
                mut = arr.copy()
                mut[pos] = val
                n_accept += _check_one(mut.tobytes())
                n_total += 1
    assert n_total >= 900
    # sanity: mutations must actually produce both outcomes
    assert 0 < n_accept < n_total


def test_truncations_and_extensions():
    rng = np.random.default_rng(1)
    frames = _base_frames()
    n = 0
    for frame in frames:
        for _ in range(40):
            cut = int(rng.integers(0, len(frame)))
            _check_one(frame[:cut])
            n += 1
        for _ in range(15):
            tail = rng.integers(0, 256, int(rng.integers(1, 32)),
                                np.uint8).tobytes()
            _check_one(frame + tail)
            n += 1
    assert n >= 200


def test_type_nibble_sweep():
    """All 256 values of the top-level section type byte (byte 3 in the
    4-byte header form): every (compressor, format) nibble combination."""
    frames = _base_frames()
    frame = frames[0]
    arr = np.frombuffer(frame, np.uint8).copy()
    both = 0
    for v in range(256):
        mut = arr.copy()
        mut[3] = v
        both += _check_one(mut.tobytes())
    assert both >= 1  # at least the original type accepts


def test_random_blobs():
    rng = np.random.default_rng(2)
    for i in range(120):
        n = int(rng.integers(0, 64))
        blob = rng.integers(0, 256, n, np.uint8).tobytes()
        _check_one(blob)
    # all-zero and header-shaped blobs
    for blob in (b"", b"\x00" * 8, b"\x04\x00\x00\xbb1234",
                 b"\x00\x00\x00\xbb\x04\x00\x00\x00 1234"):
        _check_one(blob)


def test_mutated_snappy_interiors():
    """Mutations inside chunk streams: decode must agree with google
    snappy's accept/reject through the real HapDecode."""
    rng = np.random.default_rng(3)
    from hap_tpu.container.parse import parse_frame
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY

    frame = _base_frames()[1]
    tex = parse_frame(frame).textures[0]
    arr = np.frombuffer(frame, np.uint8).copy()
    snappy_spans = [
        (int(tex.chunk_compressed_offsets[i]), int(tex.chunk_compressed_sizes[i]))
        for i in range(tex.chunk_count)
        if tex.chunk_compressors[i] == CHUNK_COMPRESSOR_SNAPPY
    ]
    assert snappy_spans
    n = 0
    for off, sz in snappy_spans:
        for _ in range(60):
            mut = arr.copy()
            mut[off + int(rng.integers(0, sz))] = int(rng.integers(0, 256))
            _check_one(mut.tobytes())
            n += 1
    assert n >= 60


def _ours_trio(frame: bytes):
    from hap_tpu.api import (
        hap_get_frame_texture_chunk_count,
        hap_get_frame_texture_count,
        hap_get_frame_texture_format,
    )

    out = []
    for fn in (hap_get_frame_texture_count,
               lambda f: hap_get_frame_texture_format(f, 0),
               lambda f: hap_get_frame_texture_chunk_count(f, 0)):
        try:
            v = fn(frame)
            out.append(int(v))
        except Exception:
            out.append(None)
    return out


def test_introspection_trio_parity_on_mutants():
    """HapGetFrameTextureCount / Format / ChunkCount agree with the real
    compiled functions on mutated frames — accept/reject AND values.
    (The three functions have DIFFERENT walk bounds in the reference:
    count walks all children bounded by the buffer, the indexer stops at
    the index bounded by the parent — hap.c:956-975 vs 1061-1076 — so
    trio parity is a separate surface from decode parity.)"""
    rng = np.random.default_rng(4)
    frames = _base_frames()
    n = n_crash = 0
    for frame in frames:
        arr = np.frombuffer(frame, np.uint8).copy()
        positions = list(range(min(48, len(arr)))) + [
            int(rng.integers(0, len(arr))) for _ in range(30)
        ]
        for pos in positions:
            for val in (0x00, 0xFF, int(rng.integers(0, 256))):
                mut = arr.copy()
                mut[pos] = val
                mb = mut.tobytes()
                real = _REAL.trio(mb)
                if real == "crash":
                    n_crash += 1
                    continue
                ours = _ours_trio(mb)
                assert ours == real, (pos, val, ours, real)
                n += 1
        # truncations exercise the header bound checks
        for _ in range(20):
            cut = int(rng.integers(0, len(arr)))
            mb = arr[:cut].tobytes()
            real = _REAL.trio(mb)
            if real == "crash":
                n_crash += 1
                continue
            assert _ours_trio(mb) == real, cut
            n += 1
    assert n >= 800 and n_crash == 0  # introspection never reads chunk data
