"""Scalar numpy oracle for the BCn codecs — slow, loop-based, obviously

correct. The JAX kernels are required to match these bit-for-bit on decode
(tests/test_bcn.py); the shared rounding rules are documented in
kernels/bc1.py and kernels/bc4.py.
"""

from __future__ import annotations

import numpy as np


def expand565(c: int):
    r5 = (c >> 11) & 0x1F
    g6 = (c >> 5) & 0x3F
    b5 = c & 0x1F
    return (
        (r5 << 3) | (r5 >> 2),
        (g6 << 2) | (g6 >> 4),
        (b5 << 3) | (b5 >> 2),
    )


def bc1_decode_block(block8: bytes, punchthrough: bool = True):
    """8 bytes -> (16, 3) uint8 RGB + (16,) uint8 alpha."""
    c0 = block8[0] | (block8[1] << 8)
    c1 = block8[2] | (block8[3] << 8)
    idx = block8[4] | (block8[5] << 8) | (block8[6] << 16) | (block8[7] << 24)
    e0 = np.array(expand565(c0), dtype=np.int64)
    e1 = np.array(expand565(c1), dtype=np.int64)
    four = (c0 > c1) or not punchthrough
    if four:
        palette = [e0, e1, (2 * e0 + e1 + 1) // 3, (e0 + 2 * e1 + 1) // 3]
        opaque = [255, 255, 255, 255]
    else:
        palette = [e0, e1, (e0 + e1 + 1) // 2, np.zeros(3, dtype=np.int64)]
        opaque = [255, 255, 255, 0]
    rgb = np.empty((16, 3), dtype=np.uint8)
    alpha = np.empty(16, dtype=np.uint8)
    for t in range(16):
        code = (idx >> (2 * t)) & 0x3
        rgb[t] = palette[code]
        alpha[t] = opaque[code]
    return rgb, alpha


def bc4_decode_block(block8: bytes) -> np.ndarray:
    """8 bytes -> (16,) uint8 channel values."""
    a0, a1 = block8[0], block8[1]
    field = int.from_bytes(block8[2:8], "little")
    if a0 > a1:
        palette = [a0, a1] + [((8 - k) * a0 + (k - 1) * a1 + 3) // 7 for k in range(2, 8)]
    else:
        palette = (
            [a0, a1]
            + [((6 - k) * a0 + (k - 1) * a1 + 2) // 5 for k in range(2, 6)]
            + [0, 255]
        )
    out = np.empty(16, dtype=np.uint8)
    for t in range(16):
        out[t] = palette[(field >> (3 * t)) & 0x7]
    return out


def bc3_decode_block(block16: bytes) -> np.ndarray:
    """16 bytes -> (16, 4) uint8 RGBA."""
    alpha = bc4_decode_block(block16[0:8])
    rgb, _ = bc1_decode_block(block16[8:16], punchthrough=False)
    return np.concatenate([rgb, alpha[:, None]], axis=1)


def bc1_decode(data: bytes, punchthrough: bool = True):
    """Whole payload -> (N, 16, 3), (N, 16)."""
    n = len(data) // 8
    rgb = np.empty((n, 16, 3), dtype=np.uint8)
    alpha = np.empty((n, 16), dtype=np.uint8)
    for i in range(n):
        rgb[i], alpha[i] = bc1_decode_block(data[8 * i : 8 * i + 8], punchthrough)
    return rgb, alpha


def bc4_decode(data: bytes) -> np.ndarray:
    n = len(data) // 8
    out = np.empty((n, 16), dtype=np.uint8)
    for i in range(n):
        out[i] = bc4_decode_block(data[8 * i : 8 * i + 8])
    return out


def bc3_decode(data: bytes) -> np.ndarray:
    n = len(data) // 16
    out = np.empty((n, 16, 4), dtype=np.uint8)
    for i in range(n):
        out[i] = bc3_decode_block(data[16 * i : 16 * i + 16])
    return out
