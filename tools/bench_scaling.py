"""Scaling benchmark: frames/s of the sharded GOP pipeline vs device count.

Run on real multi-chip hardware for the BASELINE.md config-5 metric, or on
virtual CPU devices to validate mechanics (virtual devices share host cores,
so virtual 'scaling' is about overhead, not speedup):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py

Prints one JSON line per device count.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu.parallel.mesh import make_mesh, mesh_shape_for
    from hap_tpu.parallel.sharded import make_train_step, sharded_frame_roundtrip

    devices = jax.devices()
    rng = np.random.default_rng(0)
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    frames_per_dev = 2
    nblocks = 32 * 16  # 512 blocks/frame (128x64 frame)
    H, W = 64, 128  # full-pipeline frame size (keep CPU-mesh runs fast)

    results = []
    for n in counts:
        dp, sp = mesh_shape_for(n)
        mesh = make_mesh(devices[:n], (dp, sp))
        step = make_train_step(mesh, "hap_q")
        batch = dp * frames_per_dev
        blocks = jnp.asarray(
            rng.integers(0, 256, (batch, nblocks, 16, 3), dtype=np.uint8)
        )
        words, sse = step(blocks)
        jax.block_until_ready(words)
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            words, sse = step(blocks)
            float(sse)  # host sync
        dt = (time.time() - t0) / iters
        fps = batch / dt

        # Full pipeline (pixels -> container bytes -> pixels), pure frame DP
        # over a flat n-device mesh.
        fmesh = make_mesh(devices[:n], (n, 1))
        rt = sharded_frame_roundtrip(fmesh, "hap_q", chunk_count=2)
        fbatch = n * frames_per_dev
        imgs = jnp.asarray(
            rng.integers(0, 256, (fbatch, H, W, 3), dtype=np.uint8)
        )
        out, flen, ok = rt(imgs)
        jax.block_until_ready(out)
        assert np.asarray(ok).all()
        t0 = time.time()
        for _ in range(iters):
            out, flen, ok = rt(imgs)
            float(jnp.sum(flen))  # host sync
        fdt = (time.time() - t0) / iters
        ffps = fbatch / fdt

        results.append({
            "devices": n, "mesh": [dp, sp],
            "frames_per_s": round(fps, 1),
            "full_pipeline_frames_per_s": round(ffps, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    if len(results) > 1:
        speedup = results[-1]["frames_per_s"] / results[0]["frames_per_s"]
        print(json.dumps({"scaling": f"{results[0]['devices']}->"
                          f"{results[-1]['devices']} devices",
                          "speedup": round(speedup, 2)}), flush=True)


if __name__ == "__main__":
    main()
