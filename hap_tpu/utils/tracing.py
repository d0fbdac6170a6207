"""Tracing and truthful on-device timing.

Two tools:

* ``trace(path)`` — context manager around jax.profiler for capturing a
  TensorBoard-viewable device trace of a pipeline section.
* ``device_timer(fn)`` — measures a jitted function's wall time with a
  host-synchronized scalar fold per iteration. This matters on runtimes
  with lazy/async dispatch (the axon tunnel used in this environment ACKs
  dispatches without executing them; ``block_until_ready`` on an unused
  output is NOT sufficient), and it is how bench.py and the tools/ scripts
  measure.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(path: str = "/tmp/hap_tpu_trace"):
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def _fold(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def device_timer(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> Tuple[float, float]:
    """Returns (seconds_per_call, checksum). Host-syncs every iteration."""
    folded = jax.jit(lambda *a: _fold(fn(*a)))
    checksum = 0.0
    for _ in range(warmup):
        checksum = float(folded(*args))
    t0 = time.time()
    for _ in range(iters):
        checksum = float(folded(*args))
    return (time.time() - t0) / iters, checksum
