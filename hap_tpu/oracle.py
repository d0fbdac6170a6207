"""Differential-test oracle: the ACTUAL reference codec + real google snappy.

Compiles /root/reference/source/hap.c (read in place — never copied into this
repository) together with a small shim (native/src/oracle/oracle_shim.c) and
links the system google-snappy C library (/lib/x86_64-linux-gnu/libsnappy.so.1,
the exact C ABI hap.c:32 consumes). The result is the real `HapEncode`
(hap.c:506), `HapDecode` (hap.c:993), `HapMaxEncodedLength` (hap.c:324) and
the introspection trio (hap.c:1042-1188) as Python functions.

This module exists so that "bit-exact vs the reference" is established against
the reference itself, not against same-author reimplementations agreeing with
each other. It also exposes the raw google-snappy codec (`snappy_compress` /
`snappy_uncompress`) for foreign-bytes interop tests.

Test/verification infrastructure only — nothing in the framework runtime
imports this module.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

_HERE = os.path.dirname(__file__)
_REF_SRC = "/root/reference/source"
_SHIM_DIR = os.path.join(_HERE, "native", "src", "oracle")
_BUILD_DIR = os.path.join(_HERE, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libhaporacle.so")
_SNAPPY = "/lib/x86_64-linux-gnu/libsnappy.so.1"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_snappy_lib: Optional[ctypes.CDLL] = None

_U8P = ctypes.POINTER(ctypes.c_uint8)


def available() -> bool:
    """True when the reference source and system snappy are both present."""
    return os.path.exists(os.path.join(_REF_SRC, "hap.c")) and os.path.exists(_SNAPPY)


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "gcc", "-O2", "-fPIC", "-shared", "-w",
        "-I", _SHIM_DIR, "-I", _REF_SRC,
        "-o", _LIB,
        os.path.join(_REF_SRC, "hap.c"),
        os.path.join(_SHIM_DIR, "oracle_shim.c"),
        _SNAPPY, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _mtimes() -> float:
    return max(
        os.path.getmtime(os.path.join(_REF_SRC, "hap.c")),
        os.path.getmtime(os.path.join(_SHIM_DIR, "oracle_shim.c")),
        os.path.getmtime(os.path.join(_SHIM_DIR, "snappy-c.h")),
    )


def load() -> ctypes.CDLL:
    """Load (building if stale) the compiled reference oracle."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not available():
            raise RuntimeError("reference source or system snappy unavailable")
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < _mtimes():
            _build()
        lib = ctypes.CDLL(_LIB)

        lib.HapMaxEncodedLength.restype = ctypes.c_ulong
        lib.HapMaxEncodedLength.argtypes = [
            ctypes.c_uint,
            ctypes.POINTER(ctypes.c_ulong),
            ctypes.POINTER(ctypes.c_uint),
            ctypes.POINTER(ctypes.c_uint),
        ]
        lib.HapEncode.restype = ctypes.c_uint
        lib.HapEncode.argtypes = [
            ctypes.c_uint,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_ulong),
            ctypes.POINTER(ctypes.c_uint),
            ctypes.POINTER(ctypes.c_uint),
            ctypes.POINTER(ctypes.c_uint),
            ctypes.c_void_p, ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_ulong),
        ]
        lib.oracle_decode.restype = ctypes.c_uint
        lib.oracle_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_ulong, ctypes.c_uint, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_ulong), ctypes.POINTER(ctypes.c_uint),
        ]
        lib.HapGetFrameTextureCount.restype = ctypes.c_uint
        lib.HapGetFrameTextureCount.argtypes = [
            ctypes.c_void_p, ctypes.c_ulong, ctypes.POINTER(ctypes.c_uint)]
        lib.HapGetFrameTextureFormat.restype = ctypes.c_uint
        lib.HapGetFrameTextureFormat.argtypes = [
            ctypes.c_void_p, ctypes.c_ulong, ctypes.c_uint,
            ctypes.POINTER(ctypes.c_uint)]
        lib.HapGetFrameTextureChunkCount.restype = ctypes.c_uint
        lib.HapGetFrameTextureChunkCount.argtypes = [
            ctypes.c_void_p, ctypes.c_ulong, ctypes.c_uint,
            ctypes.POINTER(ctypes.c_int)]

        _lib = lib
        return _lib


class OracleError(Exception):
    """Raised when the reference returns a non-zero HapResult."""

    def __init__(self, result: int, what: str):
        self.result = int(result)
        super().__init__(f"{what}: HapResult={self.result}")


def max_encoded_length(
    lengths: Sequence[int],
    texture_formats: Sequence[int],
    chunk_counts: Sequence[int],
) -> int:
    """Real HapMaxEncodedLength (hap.c:324). Returns 0 on bad arguments."""
    lib = load()
    n = len(lengths)
    return int(lib.HapMaxEncodedLength(
        ctypes.c_uint(n),
        (ctypes.c_ulong * n)(*[int(x) for x in lengths]),
        (ctypes.c_uint * n)(*[int(x) for x in texture_formats]),
        (ctypes.c_uint * n)(*[int(x) for x in chunk_counts]),
    ))


def encode(
    textures: Sequence[bytes],
    texture_formats: Sequence[int],
    compressors: Sequence[int],
    chunk_counts: Sequence[int],
) -> bytes:
    """Real HapEncode (hap.c:506). compressors: 0=None, 1=Snappy (hap.h:50)."""
    lib = load()
    n = len(textures)
    bufs = [ctypes.create_string_buffer(bytes(t), len(t)) for t in textures]
    in_ptrs = (ctypes.c_void_p * n)(*[ctypes.addressof(b) for b in bufs])
    in_lens = (ctypes.c_ulong * n)(*[len(t) for t in textures])
    fmts = (ctypes.c_uint * n)(*[int(f) for f in texture_formats])
    comps = (ctypes.c_uint * n)(*[int(c) for c in compressors])
    chunks = (ctypes.c_uint * n)(*[int(c) for c in chunk_counts])
    out_cap = int(lib.HapMaxEncodedLength(ctypes.c_uint(n), in_lens, fmts, chunks))
    if out_cap == 0:
        raise OracleError(1, "HapMaxEncodedLength returned 0")
    out = ctypes.create_string_buffer(out_cap)
    used = ctypes.c_ulong(0)
    rc = lib.HapEncode(ctypes.c_uint(n), in_ptrs, in_lens, fmts, comps, chunks,
                       out, ctypes.c_ulong(out_cap), ctypes.byref(used))
    if rc != 0:
        raise OracleError(rc, "HapEncode")
    return out.raw[: used.value]


def decode(
    frame: bytes, index: int = 0, *, out_cap: Optional[int] = None,
    threaded: bool = False,
) -> Tuple[bytes, int]:
    """Real HapDecode (hap.c:993) via the shim's serial/threaded callback.

    Returns (texture bytes, HapTextureFormat constant).
    """
    lib = load()
    frame = bytes(frame)
    if out_cap is None:
        # The reference has no output-size query; a Hap texture can never
        # inflate past ~arbitrary factors of its frame, so grow on
        # Buffer_Too_Small (HapResult 2, hap.h:58).
        out_cap = max(64, 16 * len(frame))
    inbuf = ctypes.create_string_buffer(frame, len(frame))
    while True:
        out = ctypes.create_string_buffer(out_cap)
        used = ctypes.c_ulong(0)
        fmt = ctypes.c_uint(0)
        rc = lib.oracle_decode(
            inbuf, ctypes.c_ulong(len(frame)), ctypes.c_uint(index),
            ctypes.c_int(1 if threaded else 0),
            out, ctypes.c_ulong(out_cap), ctypes.byref(used), ctypes.byref(fmt))
        if rc == 2 and out_cap < 1 << 32:  # Buffer_Too_Small
            out_cap *= 4
            continue
        if rc != 0:
            raise OracleError(rc, "HapDecode")
        return out.raw[: used.value], int(fmt.value)


def decode_raw(inbuf, length: int, index: int = 0, *,
               out_cap: Optional[int] = None) -> Tuple[bytes, int]:
    """decode() on a caller-owned ctypes buffer, WITHOUT copying the frame.

    For harnesses that place the frame against a guard page to catch the
    reference's unchecked chunk-data reads (tests/test_oracle_fuzz.py) —
    a copy into a fresh string buffer would defeat the guard.
    """
    lib = load()
    if out_cap is None:
        out_cap = max(64, 16 * length)
    while True:
        out = ctypes.create_string_buffer(out_cap)
        used = ctypes.c_ulong(0)
        fmt = ctypes.c_uint(0)
        rc = lib.oracle_decode(
            inbuf, ctypes.c_ulong(length), ctypes.c_uint(index),
            ctypes.c_int(0),
            out, ctypes.c_ulong(out_cap), ctypes.byref(used), ctypes.byref(fmt))
        if rc == 2 and out_cap < 1 << 32:  # Buffer_Too_Small
            out_cap *= 4
            continue
        if rc != 0:
            raise OracleError(rc, "HapDecode")
        return out.raw[: used.value], int(fmt.value)


def texture_count(frame: bytes) -> int:
    """Real HapGetFrameTextureCount (hap.c:1042)."""
    lib = load()
    frame = bytes(frame)
    n = ctypes.c_uint(0)
    rc = lib.HapGetFrameTextureCount(frame, ctypes.c_ulong(len(frame)), ctypes.byref(n))
    if rc != 0:
        raise OracleError(rc, "HapGetFrameTextureCount")
    return int(n.value)


def texture_format(frame: bytes, index: int = 0) -> int:
    """Real HapGetFrameTextureFormat (hap.c:1089)."""
    lib = load()
    frame = bytes(frame)
    f = ctypes.c_uint(0)
    rc = lib.HapGetFrameTextureFormat(
        frame, ctypes.c_ulong(len(frame)), ctypes.c_uint(index), ctypes.byref(f))
    if rc != 0:
        raise OracleError(rc, "HapGetFrameTextureFormat")
    return int(f.value)


def texture_chunk_count(frame: bytes, index: int = 0) -> int:
    """Real HapGetFrameTextureChunkCount (hap.c:1128)."""
    lib = load()
    frame = bytes(frame)
    c = ctypes.c_int(0)
    rc = lib.HapGetFrameTextureChunkCount(
        frame, ctypes.c_ulong(len(frame)), ctypes.c_uint(index), ctypes.byref(c))
    if rc != 0:
        raise OracleError(rc, "HapGetFrameTextureChunkCount")
    return int(c.value)


# ---------------------------------------------------------------------------
# Raw google snappy (the real library, direct): foreign-bytes interop tests.
# ---------------------------------------------------------------------------

def _snappy() -> ctypes.CDLL:
    global _snappy_lib
    with _lock:
        if _snappy_lib is None:
            lib = ctypes.CDLL(_SNAPPY)
            lib.snappy_max_compressed_length.restype = ctypes.c_size_t
            lib.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
            lib.snappy_compress.restype = ctypes.c_int
            lib.snappy_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t)]
            lib.snappy_uncompress.restype = ctypes.c_int
            lib.snappy_uncompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t)]
            lib.snappy_uncompressed_length.restype = ctypes.c_int
            lib.snappy_uncompressed_length.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
            lib.snappy_validate_compressed_buffer.restype = ctypes.c_int
            lib.snappy_validate_compressed_buffer.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t]
            _snappy_lib = lib
        return _snappy_lib


def snappy_compress(data: bytes) -> bytes:
    """Real google snappy_compress — the exact call at hap.c:453."""
    lib = _snappy()
    data = bytes(data)
    cap = ctypes.c_size_t(lib.snappy_max_compressed_length(len(data)))
    out = ctypes.create_string_buffer(cap.value)
    rc = lib.snappy_compress(data, len(data), out, ctypes.byref(cap))
    if rc != 0:
        raise OracleError(rc, "snappy_compress")
    return out.raw[: cap.value]


def snappy_uncompress(data: bytes) -> bytes:
    """Real google snappy_uncompress — the exact call at hap.c:612."""
    lib = _snappy()
    data = bytes(data)
    n = ctypes.c_size_t(0)
    rc = lib.snappy_uncompressed_length(data, len(data), ctypes.byref(n))
    if rc != 0:
        raise OracleError(rc, "snappy_uncompressed_length")
    out = ctypes.create_string_buffer(max(1, n.value))
    got = ctypes.c_size_t(n.value)
    rc = lib.snappy_uncompress(data, len(data), out, ctypes.byref(got))
    if rc != 0:
        raise OracleError(rc, "snappy_uncompress")
    return out.raw[: got.value]


def snappy_validate(data: bytes) -> bool:
    """Real google snappy_validate_compressed_buffer."""
    lib = _snappy()
    return lib.snappy_validate_compressed_buffer(bytes(data), len(data)) == 0


def snappy_max_compressed_length(n: int) -> int:
    """Real google snappy_max_compressed_length — the call at hap.c:313."""
    return int(_snappy().snappy_max_compressed_length(ctypes.c_size_t(n)))
