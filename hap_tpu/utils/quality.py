"""Quality metrics for codec validation (PSNR for LDR, relative RMSE for HDR)."""

from __future__ import annotations

import numpy as np


def psnr(a, b, peak: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(peak * peak / mse))


def relative_rmse(a, b, floor: float = 1e-3) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    rel = (a - b) / np.maximum(np.abs(b), floor)
    return float(np.sqrt(np.mean(rel * rel)))
