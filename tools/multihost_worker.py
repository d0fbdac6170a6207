"""Worker process for the multi-host test/benchmark.

Usage: python tools/multihost_worker.py <coordinator> <nprocs> <pid> <ldc>
Prints one line: OK <n_devices> <sse>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, nprocs, pid, ldc = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ldc}"
).strip()

# Initialize the distributed runtime before importing any module that builds
# jnp constants at import time (which would initialise the XLA backend).
import jax

jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=nprocs, process_id=pid
)

from hap_tpu.parallel import multihost

shape, sse, ndev = multihost.run_multihost_step("hap_q")
flen, ok, crc = multihost.run_multihost_spatial("hap_q")
assert ok
print(f"OK {ndev} {sse:.1f} spatial {flen} {crc}", flush=True)
