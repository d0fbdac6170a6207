"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding semantics are validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path, and bench.py runs on the real TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
