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


def test_two_process_distributed_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU tunnel in workers
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             coordinator, "2", str(pid), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        outs.append(out.strip().splitlines()[-1])
    # Both processes saw the 8-device global mesh and agreed on the psum.
    for line in outs:
        assert line.startswith("OK 8 "), line
    assert outs[0] == outs[1]
