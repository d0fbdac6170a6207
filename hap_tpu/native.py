"""ctypes bindings for the native C++ byte-plane runtime (hapn.cpp).

Builds libhapn.so on demand with g++ (no pybind11 in this environment; the
C ABI + ctypes keeps the binding dependency-free). The native runtime is the
production path for Snappy and container byte work — the TPU-native analogue
of the reference's external C++ Snappy dependency (hap.c:32) and the caller
thread pool (hap.h:113-128).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from hap_tpu.constants import HapError, HapResult, TextureFormat

_SRC = os.path.join(os.path.dirname(__file__), "native", "src", "hapn.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libhapn.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_ULP = ctypes.POINTER(ctypes.c_ulong)
_UIP = ctypes.POINTER(ctypes.c_uint)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
        "-std=c++17", "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if stale) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)

        lib.hapn_snappy_max_compressed_length.restype = ctypes.c_size_t
        lib.hapn_snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.hapn_snappy_compress.restype = ctypes.c_int
        lib.hapn_snappy_compress.argtypes = [
            _U8P, ctypes.c_size_t, _U8P, ctypes.POINTER(ctypes.c_size_t)]
        lib.hapn_snappy_uncompress.restype = ctypes.c_int
        lib.hapn_snappy_uncompress.argtypes = [
            _U8P, ctypes.c_size_t, _U8P, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.hapn_snappy_uncompressed_length.restype = ctypes.c_int
        lib.hapn_snappy_uncompressed_length.argtypes = [
            _U8P, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
        lib.hapn_max_encoded_length.restype = ctypes.c_ulong
        lib.hapn_max_encoded_length.argtypes = [ctypes.c_uint, _ULP, _UIP, _UIP]
        lib.hapn_encode.restype = ctypes.c_int
        lib.hapn_encode.argtypes = [
            ctypes.c_uint, ctypes.POINTER(_U8P), _ULP, _UIP, _UIP, _UIP,
            _U8P, ctypes.c_ulong, _ULP, ctypes.c_int]
        lib.hapn_decode.restype = ctypes.c_int
        lib.hapn_decode.argtypes = [
            _U8P, ctypes.c_ulong, ctypes.c_uint, _U8P, ctypes.c_ulong,
            _ULP, _UIP, ctypes.c_int]
        lib.hapn_get_texture_count.restype = ctypes.c_int
        lib.hapn_get_texture_count.argtypes = [_U8P, ctypes.c_ulong, _UIP]
        lib.hapn_get_texture_format.restype = ctypes.c_int
        lib.hapn_get_texture_format.argtypes = [
            _U8P, ctypes.c_ulong, ctypes.c_uint, _UIP]
        lib.hapn_get_chunk_count.restype = ctypes.c_int
        lib.hapn_get_chunk_count.argtypes = [
            _U8P, ctypes.c_ulong, ctypes.c_uint, ctypes.POINTER(ctypes.c_int)]
        for name in ("hapn_snappy_compress_batch", "hapn_snappy_uncompress_batch"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [_U8P, _ULP, _ULP, _U8P, _ULP, _ULP,
                           ctypes.c_uint, ctypes.c_int]
        _I32P = ctypes.POINTER(ctypes.c_int32)
        lib.hapn_snappy_optable_batch.restype = ctypes.c_int
        lib.hapn_snappy_optable_batch.argtypes = [
            _U8P, _ULP, _ULP, _ULP, _I32P, ctypes.c_ulong, _U8P,
            ctypes.c_ulong, _I32P, _I32P, _I32P, _I32P,
            ctypes.c_uint, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return lib


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(_U8P)


def _check(result: int, context: str) -> None:
    if result != 0:
        raise HapError(HapResult(result), context)


def _np_from(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, dtype=np.uint8)
    return np.frombuffer(bytes(data) if not isinstance(data, (bytes, bytearray, memoryview)) else data, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Snappy
# ---------------------------------------------------------------------------

def snappy_compress(data) -> bytes:
    lib = load()
    src = _np_from(data)
    bound = lib.hapn_snappy_max_compressed_length(src.size)
    dst = np.empty(bound, dtype=np.uint8)
    out_len = ctypes.c_size_t(bound)
    _check(lib.hapn_snappy_compress(_as_u8p(src), src.size, _as_u8p(dst),
                                    ctypes.byref(out_len)), "snappy_compress")
    return dst[: out_len.value].tobytes()


def snappy_uncompress(data, expected_length: Optional[int] = None) -> bytes:
    lib = load()
    src = _np_from(data)
    length = ctypes.c_size_t()
    _check(lib.hapn_snappy_uncompressed_length(_as_u8p(src), src.size,
                                               ctypes.byref(length)),
           "snappy_uncompressed_length")
    if expected_length is not None and length.value != expected_length:
        raise HapError(HapResult.BAD_FRAME, "snappy length mismatch")
    dst = np.empty(length.value, dtype=np.uint8)
    got = ctypes.c_size_t()
    _check(lib.hapn_snappy_uncompress(_as_u8p(src), src.size, _as_u8p(dst),
                                      dst.size, ctypes.byref(got)),
           "snappy_uncompress")
    return dst[: got.value].tobytes()


def snappy_optable_batch(streams: Sequence[bytes],
                         expected_lens: Sequence[int],
                         n_threads: int = 0,
                         promote_max: int = 0):
    """Compile Snappy streams into executor op tables (multithreaded C++).

    Mirrors hap_tpu/snappy/optable.pack_tables semantics (differentially
    tested). Empty streams (raw chunks) come back ok=False with 0 ops.
    Returns (ops (C, N_max, 2) i32, n_ops (C,) i32, lit (C, L_max) u8,
    n_lit (C,) i32, out_len (C,) i32, ok (C,) bool).
    """
    lib = load()
    C = len(streams)
    sizes = np.asarray([len(s) for s in streams], np.uint64)
    offs = np.zeros(C, np.uint64)
    if C > 1:
        np.cumsum(sizes[:-1], out=offs[1:])
    flat = np.empty(int(sizes.sum()), np.uint8)
    for i, s in enumerate(streams):
        flat[int(offs[i]): int(offs[i]) + len(s)] = np.frombuffer(s, np.uint8)
    if flat.size == 0:
        flat = np.zeros(1, np.uint8)
    exp = np.asarray(expected_lens, np.uint64)
    # pieces <= elements + out_len/128 per stream (block splitting)
    ops_cap = max(
        2048,
        int(sizes.max(initial=0)) // 8 + int(exp.max(initial=0)) // 128)
    lit_cap = max(128, int(sizes.max(initial=0)))
    if promote_max > 0:
        lit_cap = max(lit_cap, int(exp.max(initial=0)))
    _I32P = ctypes.POINTER(ctypes.c_int32)
    while True:
        ops = np.zeros((C, ops_cap, 2), np.int32)
        lit = np.zeros((C, lit_cap), np.uint8)
        n_ops = np.zeros(C, np.int32)
        n_lit = np.zeros(C, np.int32)
        out_len = np.zeros(C, np.int32)
        status = np.zeros(C, np.int32)
        r = lib.hapn_snappy_optable_batch(
            _as_u8p(flat),
            offs.ctypes.data_as(_ULP),
            sizes.ctypes.data_as(_ULP),
            exp.ctypes.data_as(_ULP),
            ops.ctypes.data_as(_I32P), ops_cap,
            _as_u8p(lit), lit_cap,
            n_ops.ctypes.data_as(_I32P),
            n_lit.ctypes.data_as(_I32P),
            out_len.ctypes.data_as(_I32P),
            status.ctypes.data_as(_I32P),
            C, n_threads, promote_max)
        _check(r, "snappy_optable_batch")
        if (status == 2).any():  # BUFFER_TOO_SMALL: retry with needed sizes
            ops_cap = max(ops_cap, int(n_ops.max()))
            lit_cap = max(lit_cap, int(n_lit.max()))
            continue
        ok = status == 0
        n_max = max(int(n_ops.max(initial=1)), 1)
        l_max = max(int(n_lit.max(initial=1)), 1)
        return (np.ascontiguousarray(ops[:, :n_max]), n_ops,
                np.ascontiguousarray(lit[:, :l_max]), n_lit, out_len, ok)


# ---------------------------------------------------------------------------
# Hap frame encode/decode (full native path)
# ---------------------------------------------------------------------------

def max_encoded_length(lengths: Sequence[int], formats: Sequence[int],
                       chunk_counts: Sequence[int]) -> int:
    lib = load()
    n = len(lengths)
    return int(lib.hapn_max_encoded_length(
        n,
        (ctypes.c_ulong * n)(*lengths),
        (ctypes.c_uint * n)(*formats),
        (ctypes.c_uint * n)(*chunk_counts),
    ))


def encode(
    textures: Sequence,
    formats: Sequence[int],
    compressors: Optional[Sequence[int]] = None,
    chunk_counts: Optional[Sequence[int]] = None,
    n_threads: int = 0,
) -> bytes:
    """HapEncode equivalent, fully native (container + threaded snappy)."""
    lib = load()
    count = len(textures)
    arrays = [_np_from(t) for t in textures]
    lengths = [a.size for a in arrays]
    compressors = list(compressors or [1] * count)
    chunk_counts = list(chunk_counts or [1] * count)
    cap = max_encoded_length(lengths, formats, chunk_counts)
    if cap == 0:
        raise HapError(HapResult.BAD_ARGUMENTS, "bad encode arguments")
    out = np.empty(cap, dtype=np.uint8)
    used = ctypes.c_ulong()
    input_ptrs = (_U8P * count)(*[_as_u8p(a) for a in arrays])
    _check(
        lib.hapn_encode(
            count, input_ptrs,
            (ctypes.c_ulong * count)(*lengths),
            (ctypes.c_uint * count)(*[int(f) for f in formats]),
            (ctypes.c_uint * count)(*[int(c) for c in compressors]),
            (ctypes.c_uint * count)(*chunk_counts),
            _as_u8p(out), cap, ctypes.byref(used), n_threads,
        ),
        "hapn_encode",
    )
    return out[: used.value].tobytes()


def decode(
    frame, index: int = 0, output_size_hint: Optional[int] = None,
    n_threads: int = 0,
) -> Tuple[bytes, TextureFormat]:
    """HapDecode equivalent. Returns (texture_bytes, texture_format)."""
    lib = load()
    buf = _np_from(frame)
    if output_size_hint is None:
        # One extra parse to size the output exactly (a real player would use
        # frame dimensions; introspection keeps this API self-contained).
        # Index-targeted plan: acceptance must match HapDecode's lazy child
        # walk, not the stricter whole-frame planner (test_oracle_fuzz.py).
        from hap_tpu.container.parse import plan_texture_at

        output_size_hint = plan_texture_at(bytes(buf), index).decoded_bytes
    out = np.empty(max(output_size_hint, 1), dtype=np.uint8)
    used = ctypes.c_ulong()
    fmt = ctypes.c_uint()
    _check(
        lib.hapn_decode(_as_u8p(buf), buf.size, index, _as_u8p(out), out.size,
                        ctypes.byref(used), ctypes.byref(fmt), n_threads),
        "hapn_decode",
    )
    return out[: used.value].tobytes(), TextureFormat(fmt.value)


def get_texture_count(frame) -> int:
    lib = load()
    buf = _np_from(frame)
    count = ctypes.c_uint()
    _check(lib.hapn_get_texture_count(_as_u8p(buf), buf.size,
                                      ctypes.byref(count)), "texture_count")
    return count.value


def get_texture_format(frame, index: int = 0) -> TextureFormat:
    lib = load()
    buf = _np_from(frame)
    fmt = ctypes.c_uint()
    _check(lib.hapn_get_texture_format(_as_u8p(buf), buf.size, index,
                                       ctypes.byref(fmt)), "texture_format")
    return TextureFormat(fmt.value)


def get_chunk_count(frame, index: int = 0) -> int:
    lib = load()
    buf = _np_from(frame)
    cc = ctypes.c_int()
    _check(lib.hapn_get_chunk_count(_as_u8p(buf), buf.size, index,
                                    ctypes.byref(cc)), "chunk_count")
    return cc.value


# ---------------------------------------------------------------------------
# Batched snappy over flat buffers (pipeline overlap path)
# ---------------------------------------------------------------------------

def snappy_compress_batch(
    src: np.ndarray, src_offsets: np.ndarray, src_sizes: np.ndarray,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compress many chunks of one flat uint8 buffer in parallel.

    Returns (dst buffer, dst_offsets, dst_sizes); dst slots are spaced at the
    per-chunk worst-case bound, true sizes carried separately (the static-
    shape discipline the device pipeline also uses).
    """
    lib = load()
    count = len(src_sizes)
    bounds = np.array(
        [lib.hapn_snappy_max_compressed_length(int(s)) for s in src_sizes],
        dtype=np.uint64,
    )
    dst_offsets = np.zeros(count, dtype=np.uint64)
    np.cumsum(bounds[:-1], out=dst_offsets[1:])
    dst = np.empty(int(bounds.sum()), dtype=np.uint8)
    dst_sizes = bounds.copy()
    _check(
        lib.hapn_snappy_compress_batch(
            _as_u8p(src),
            src_offsets.astype(np.uint64).ctypes.data_as(_ULP),
            src_sizes.astype(np.uint64).ctypes.data_as(_ULP),
            _as_u8p(dst),
            dst_offsets.ctypes.data_as(_ULP),
            dst_sizes.ctypes.data_as(_ULP),
            count, n_threads,
        ),
        "snappy_compress_batch",
    )
    return dst, dst_offsets, dst_sizes


def snappy_uncompress_batch(
    src: np.ndarray, src_offsets: np.ndarray, src_sizes: np.ndarray,
    dst_offsets: np.ndarray, dst_sizes: np.ndarray, total_out: int,
    n_threads: int = 0,
) -> np.ndarray:
    """Decompress many chunks into one flat output buffer in parallel."""
    lib = load()
    count = len(src_sizes)
    dst = np.empty(total_out, dtype=np.uint8)
    out_sizes = dst_sizes.astype(np.uint64).copy()
    _check(
        lib.hapn_snappy_uncompress_batch(
            _as_u8p(src),
            src_offsets.astype(np.uint64).ctypes.data_as(_ULP),
            src_sizes.astype(np.uint64).ctypes.data_as(_ULP),
            _as_u8p(dst),
            dst_offsets.astype(np.uint64).ctypes.data_as(_ULP),
            out_sizes.ctypes.data_as(_ULP),
            count, n_threads,
        ),
        "snappy_uncompress_batch",
    )
    return dst
