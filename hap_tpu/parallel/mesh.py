"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int) -> Tuple[int, int]:
    """Factor n into (data, space) as near-square as possible, data >= space.

    GOP batch parallelism scales perfectly (zero communication), spatial
    stripes need a gather at stitch time, so ties favour the data axis.
    """
    best = (n_devices, 1)
    for space in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % space == 0:
            best = (n_devices // space, space)
    return best


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "space"),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = mesh_shape_for(len(devices))
    arr = np.array(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, axis_names)
