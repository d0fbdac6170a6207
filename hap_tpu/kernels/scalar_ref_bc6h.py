"""Scalar numpy BC6H decoder — independent sequential-bit-reader structure,

the golden oracle for kernels/bc6h.py. Shares only the normative layout
tables (bc6h_tables.py, bc7_tables.py)."""

from __future__ import annotations

import numpy as np

from hap_tpu.kernels.bc6h_tables import MODES6
from hap_tpu.kernels.bc7_tables import ANCHOR2_2, PARTITIONS2, WEIGHTS


class _BitReader:
    def __init__(self, block16: bytes):
        self.value = int.from_bytes(block16, "little")
        self.pos = 0

    def read(self, nbits: int) -> int:
        v = (self.value >> self.pos) & ((1 << nbits) - 1)
        self.pos += nbits
        return v

    def read_reversed(self, nbits: int) -> int:
        acc = 0
        for i in range(nbits):
            acc |= self.read(1) << (nbits - 1 - i)
        return acc


def _sign_extend(v: int, bits: int) -> int:
    sign = 1 << (bits - 1)
    return (v ^ sign) - sign


def _unquantize(x: int, bits: int, signed: bool) -> int:
    if not signed:
        if bits >= 15:
            return x
        if x == 0:
            return 0
        if x == (1 << bits) - 1:
            return 0xFFFF
        return ((x << 16) + 0x8000) >> bits
    if bits >= 16:
        return x
    s = x < 0
    ax = abs(x)
    full = (1 << (bits - 1)) - 1
    if ax == 0:
        unq = 0
    elif ax >= full:
        unq = 0x7FFF
    else:
        unq = ((ax << 15) + 0x4000) >> (bits - 1)
    return -unq if s else unq


def _finish(x: int, signed: bool) -> int:
    if not signed:
        return (x * 31) >> 6
    ax = (abs(x) * 31) >> 5
    return (ax | 0x8000) if x < 0 else ax


def bc6h_decode_block(block16: bytes, signed: bool = False) -> np.ndarray:
    """16 bytes -> (16, 3) uint16 half-float bit patterns."""
    r = _BitReader(block16)
    two = r.read(2)
    if two < 2:
        mode_key = two
    else:
        r.pos = 0
        mode_key = r.read(5)
    if mode_key not in MODES6 or (two >= 2 and MODES6[mode_key]["bits"] == 2):
        return np.zeros((16, 3), dtype=np.uint16)  # reserved mode
    cfg = MODES6[mode_key]
    r.pos = cfg["bits"]

    fields = {k: 0 for k in
              ("rw", "gw", "bw", "rx", "gx", "bx", "ry", "gy", "by", "rz", "gz", "bz")}
    for (name, lo, nbits, rev) in cfg["layout"]:
        v = r.read_reversed(nbits) if (rev and nbits > 1) else r.read(nbits)
        fields[name] |= v << lo

    ns, epb, delta = cfg["ns"], cfg["epb"], cfg["delta"]
    if ns == 2:
        partition = r.read(5)
        subset = PARTITIONS2[partition]
        anchors = {0, int(ANCHOR2_2[partition])}
        ib = 3
    else:
        partition = 0
        subset = np.zeros(16, dtype=np.int64)
        anchors = {0}
        ib = 4

    names = [("rw", "gw", "bw"), ("rx", "gx", "bx"),
             ("ry", "gy", "by"), ("rz", "gz", "bz")][: 2 * ns]
    endpoints = []
    for ei, chans in enumerate(names):
        vals = []
        for ci, cname in enumerate(chans):
            raw = fields[cname]
            if ei == 0:
                v = _sign_extend(raw, epb) if signed else raw
            elif delta is not None:
                d = _sign_extend(raw, delta[ci])
                v = (endpoints[0][ci] + d) & ((1 << epb) - 1)
                if signed:
                    v = _sign_extend(v, epb)
            else:
                v = _sign_extend(raw, epb) if signed else raw
            vals.append(v)
        endpoints.append(vals)
    unq = [[_unquantize(endpoints[e][c], epb, signed) for c in range(3)]
           for e in range(2 * ns)]

    idx = []
    for t in range(16):
        width = ib - 1 if t in anchors else ib
        idx.append(r.read(width))

    table = WEIGHTS[ib]
    out = np.zeros((16, 3), dtype=np.uint16)
    for t in range(16):
        s = int(subset[t])
        w = int(table[idx[t]])
        for c in range(3):
            e0 = unq[2 * s][c]
            e1 = unq[2 * s + 1][c]
            val = (e0 * (64 - w) + e1 * w + 32) >> 6
            out[t, c] = _finish(val, signed) & 0xFFFF
    return out


def bc6h_decode(data: bytes, signed: bool = False) -> np.ndarray:
    n = len(data) // 16
    out = np.empty((n, 16, 3), dtype=np.uint16)
    for i in range(n):
        out[i] = bc6h_decode_block(data[16 * i : 16 * i + 16], signed)
    return out
