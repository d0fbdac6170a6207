"""Real multi-process jax.distributed test: 2 'hosts' x 4 CPU devices.

This validates the cross-host sharding semantics (SURVEY.md §2.3: GOP batch
over the global data axis, stripes over space, collectives across process
boundaries) without TPU pod hardware — the standard JAX CPU-process stand-in.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_distributed(nprocs: int, local_devices: int, timeout: int = 280):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU tunnel in workers
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             coordinator, str(nprocs), str(pid), str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        outs.append(out.strip().splitlines()[-1])
    ndev = nprocs * local_devices
    # Every process saw the global mesh and agreed on the psum/frame CRC.
    for line in outs:
        assert line.startswith(f"OK {ndev} "), line
    assert len(set(outs)) == 1
    return outs


def test_two_process_distributed_step():
    _run_distributed(2, 4)


def test_four_process_distributed_step():
    """4 'hosts' x 2 CPU devices: collectives cross three process
    boundaries (BASELINE config 5's scaling story, more process edges than
    the 2-process case)."""
    _run_distributed(4, 2, timeout=420)
