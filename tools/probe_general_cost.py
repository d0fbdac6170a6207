"""Microbenchmark the per-iteration cost components of the general Snappy
kernel's chain step (snappy/pallas_general.py) on silicon.

Variants, each a while_loop of ITERS steps over the same (8, nin, 128)
VMEM blocks, 8 interleaved chains like the real kernel:

  base      — scalar carry arithmetic only (loop + bookkeeping floor)
  extract   — + 5 vector->scalar lane extracts per chain (tag parse)
  window    — + the 3-row dynamic window read + roll per chain
  winx      — window + extracts
  copysrc   — winx + second window read + 6-round period doubling
  store     — copysrc + merge store (the full real chain step shape)

Run alone (one TPU python process at a time — CLAUDE.md).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hap_tpu.snappy.pallas_general import _merge_store, _read_window

_I32 = jnp.int32
TC = 8
NIN = 128   # 16 KB stream window per chain
NOUT = 1015  # ~130 KB output per chain
ITERS = int(os.environ.get("PROBE_ITERS", "2000"))


def make_kernel(variant):
    def kernel(comp_ref, out_ref, ok_ref):
        lane256 = jax.lax.broadcasted_iota(_I32, (1, 256), 1)
        lane128 = jax.lax.broadcasted_iota(_I32, (1, 128), 1)

        def body(carry):
            i = carry[0]
            acc = []
            for j in range(TC):
                cur = carry[1 + j]
                nxt = cur
                if variant == "base":
                    nxt = cur + 7
                else:
                    win = _read_window(comp_ref, j, cur % (NIN * 100), NIN)
                    if variant == "window":
                        nxt = cur + win[0, 0] % 5 + 3
                    else:
                        b = [win[0, k] for k in range(5)]
                        nxt = cur + (b[0] & 3) + (b[1] & 1) + (b[2] & 1) + (
                            b[3] & 1) + (b[4] & 1) + 3
                        if variant in ("copysrc", "store"):
                            src = jnp.maximum(cur % (NOUT * 100) - 64, 0)
                            wsrc = _read_window(out_ref, j, src, NOUT)
                            v = wsrc[:, :256]
                            valid = jnp.clip(b[1] + 1, 1, 64)
                            for _ in range(6):
                                v = jnp.where(
                                    lane256 >= valid, pltpu.roll(v, valid, 1), v)
                                valid = jnp.minimum(valid * 2, 128)
                            if variant == "store":
                                v512 = jnp.concatenate(
                                    [v, jnp.zeros((1, 256), _I32)], axis=1)
                                _merge_store(
                                    out_ref, j, cur % (NOUT * 100), v512,
                                    (b[2] & 63) + 1, NOUT)
                            else:
                                nxt = nxt + v[0, 0]
                        elif variant == "copysrc_ro":
                            # same work, but source = read-only comp_ref:
                            # isolates the out_ref read-after-write chain.
                            src = jnp.maximum(cur % (NIN * 100) - 64, 0)
                            wsrc = _read_window(comp_ref, j, src, NIN)
                            v = wsrc[:, :256]
                            valid = jnp.clip(b[1] + 1, 1, 64)
                            for _ in range(6):
                                v = jnp.where(
                                    lane256 >= valid, pltpu.roll(v, valid, 1), v)
                                valid = jnp.minimum(valid * 2, 128)
                            nxt = nxt + v[0, 0]
                        elif variant == "dbl128":
                            # doubling on 128 lanes only (copies emit <= 64 B)
                            src = jnp.maximum(cur % (NOUT * 100) - 64, 0)
                            wsrc = _read_window(out_ref, j, src, NOUT)
                            v = wsrc[:, :128]
                            valid = jnp.clip(b[1] + 1, 1, 64)
                            for _ in range(6):
                                v = jnp.where(
                                    lane128 >= valid, pltpu.roll(v, valid, 1), v)
                                valid = jnp.minimum(valid * 2, 64)
                            nxt = nxt + v[0, 0]
                        elif variant == "nodbl":
                            # out_ref window read alone, no doubling rounds
                            src = jnp.maximum(cur % (NOUT * 100) - 64, 0)
                            wsrc = _read_window(out_ref, j, src, NOUT)
                            nxt = nxt + wsrc[0, 0]
                acc.append(nxt)
            return tuple([i + 1] + acc)

        carry = tuple([jnp.int32(0)] + [jnp.int32(j) for j in range(TC)])
        carry = jax.lax.while_loop(lambda c: c[0] < ITERS, body, carry)
        for j in range(TC):
            ok_ref[j, 0] = carry[1 + j]

    return kernel


def run(variant, comp, dev):
    f = pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[pl.BlockSpec((TC, NIN, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TC, NOUT, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((TC, NOUT, 128), _I32),
            jax.ShapeDtypeStruct((TC, 1), _I32),
        ),
    )
    g = jax.jit(f)
    out, ok = g(comp)
    _ = float(jnp.sum(ok))
    ts = []
    for _ in range(5):
        t0 = time.time()
        out, ok = g(comp)
        _ = float(jnp.sum(ok))
        ts.append(time.time() - t0)
    dt = sorted(ts)[2]
    per_iter = dt / ITERS
    per_chain = per_iter / TC
    print(f"{variant:8s}: {dt*1000:7.2f} ms  {per_iter*1e9:7.0f} ns/iter "
          f"{per_chain*1e9:6.0f} ns/chain-step")
    return dt


def main():
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    rng = np.random.default_rng(0)
    comp = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (TC, NIN, 128), np.int64), _I32), dev)
    variants = os.environ.get("PROBE_VARIANTS", "base,window,winx,copysrc,store")
    for v in variants.split(","):
        run(v, comp, dev)
    # sync-floor reference
    t0 = time.time()
    _ = float(jnp.sum(comp))
    print(f"(host-sync floor ~{(time.time()-t0)*1000:.0f} ms)")


if __name__ == "__main__":
    main()
