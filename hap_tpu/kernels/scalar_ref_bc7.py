"""Scalar numpy BC7 decoder — independent sequential-bit-reader structure,

used as the golden oracle for the vectorized kernel (kernels/bc7.py). Shares
only the normative spec tables (bc7_tables.py)."""

from __future__ import annotations

import numpy as np

from hap_tpu.kernels.bc7_tables import (
    ANCHOR2_2,
    ANCHOR3_2,
    ANCHOR3_3,
    MODES,
    PARTITIONS2,
    PARTITIONS3,
    WEIGHTS,
)


class _BitReader:
    def __init__(self, block16: bytes):
        self.value = int.from_bytes(block16, "little")
        self.pos = 0

    def read(self, nbits: int) -> int:
        v = (self.value >> self.pos) & ((1 << nbits) - 1)
        self.pos += nbits
        return v


def _unquant(e: int, depth: int) -> int:
    if depth >= 8:
        return e
    v = e << (8 - depth)
    return v | (v >> depth)


def bc7_decode_block(block16: bytes) -> np.ndarray:
    """16 bytes -> (16, 4) uint8 RGBA."""
    byte0 = block16[0]
    if byte0 == 0:
        return np.zeros((16, 4), dtype=np.uint8)  # invalid block
    mode = (byte0 & -byte0).bit_length() - 1  # lowest set bit
    cfg = MODES[mode]
    NS, PB, RB, ISB = cfg["NS"], cfg["PB"], cfg["RB"], cfg["ISB"]
    CB, AB, EPB, SPB = cfg["CB"], cfg["AB"], cfg["EPB"], cfg["SPB"]
    IB, IB2 = cfg["IB"], cfg["IB2"]
    ne = 2 * NS

    r = _BitReader(block16)
    r.read(mode + 1)
    partition = r.read(PB)
    rotation = r.read(RB)
    idx_mode = r.read(ISB)

    raw = [[r.read(CB) for _ in range(ne)] for _ in range(3)]
    if AB:
        raw.append([r.read(AB) for _ in range(ne)])
    if EPB:
        pbits = [r.read(1) for _ in range(ne)]
    elif SPB:
        shared = [r.read(1) for _ in range(NS)]
        pbits = [shared[i // 2] for i in range(ne)]
    else:
        pbits = None

    cdepth = CB + (1 if pbits is not None else 0)
    adepth = (AB + (1 if pbits is not None else 0)) if AB else 0
    endpoints = np.zeros((ne, 4), dtype=np.int64)
    for i in range(ne):
        for c in range(3):
            e = raw[c][i]
            if pbits is not None:
                e = (e << 1) | pbits[i]
            endpoints[i, c] = _unquant(e, cdepth)
        if AB:
            a = raw[3][i]
            if pbits is not None:
                a = (a << 1) | pbits[i]
            endpoints[i, 3] = _unquant(a, adepth)
        else:
            endpoints[i, 3] = 255

    if NS == 1:
        subset = np.zeros(16, dtype=np.int64)
        anchors = {0}
    elif NS == 2:
        subset = PARTITIONS2[partition]
        anchors = {0, int(ANCHOR2_2[partition])}
    else:
        subset = PARTITIONS3[partition]
        anchors = {0, int(ANCHOR3_2[partition]), int(ANCHOR3_3[partition])}

    def read_plane(bits: int) -> list:
        vals = []
        for t in range(16):
            width = bits - 1 if t in anchors else bits
            vals.append(r.read(width))
        return vals

    idx1 = read_plane(IB)
    idx2 = read_plane(IB2) if IB2 else None

    out = np.zeros((16, 4), dtype=np.int64)
    w1 = WEIGHTS[IB]
    w2 = WEIGHTS[IB2] if IB2 else None
    for t in range(16):
        s = subset[t]
        e0, e1 = endpoints[2 * s], endpoints[2 * s + 1]
        if IB2:
            wc = w1[idx1[t]] if idx_mode == 0 else w2[idx2[t]]
            wa = w2[idx2[t]] if idx_mode == 0 else w1[idx1[t]]
            for c in range(3):
                out[t, c] = (e0[c] * (64 - wc) + e1[c] * wc + 32) >> 6
            out[t, 3] = (e0[3] * (64 - wa) + e1[3] * wa + 32) >> 6
        else:
            w = w1[idx1[t]]
            for c in range(4):
                out[t, c] = (e0[c] * (64 - w) + e1[c] * w + 32) >> 6
    if rotation:
        c = rotation - 1
        out[:, [3, c]] = out[:, [c, 3]]
    return out.astype(np.uint8)


def bc7_decode(data: bytes) -> np.ndarray:
    n = len(data) // 16
    out = np.empty((n, 16, 4), dtype=np.uint8)
    for i in range(n):
        out[i] = bc7_decode_block(data[16 * i : 16 * i + 16])
    return out
