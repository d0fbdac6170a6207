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

    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from hap_tpu.parallel.sharded import _block_fns

    devices = jax.devices()
    rng = np.random.default_rng(0)
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    frames_per_dev = 2
    nblocks = 32 * 16  # 512 blocks/frame (128x64 frame)
    H, W = 64, 128  # full-pipeline frame size (keep CPU-mesh runs fast)

    def make_step_nocomm(mesh):
        """Identical per-device work to make_train_step, collectives
        REMOVED (sse stays local; words stay sharded). The delta against
        the real step isolates all_gather+psum overhead from compute —
        virtual CPU devices share 2 physical cores, so the with-comm vs
        without-comm ratio is the only meaningful scaling statement a
        virtual mesh can make."""
        enc, dec, _, wpb = _block_fns("hap_q")

        def local_step(local_blocks):
            b, nn = local_blocks.shape[0], local_blocks.shape[1]
            flat = local_blocks.reshape((b * nn,) + local_blocks.shape[2:])
            words = enc(flat)
            decoded = dec(words)
            err = decoded.astype(jnp.float32) - flat.astype(jnp.float32)
            return words.reshape(b, nn, wpb), jnp.sum(err * err)[None, None]

        return jax.jit(shard_map(
            local_step, mesh=mesh, in_specs=P("data", "space"),
            out_specs=(P("data", "space"), P("data", "space")),
            check_vma=False,
        ))

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
        step_nc = make_step_nocomm(mesh)
        wnc, ssenc = step_nc(blocks)
        jax.block_until_ready(wnc)

        # PAIRED, INTERLEAVED A/B (round-4 fix for the r3 artifact whose
        # 8-device row showed collectives making things *faster*): on a
        # virtual mesh the devices share 2 physical cores, so scheduler
        # drift between two separate timing loops swamps the collective
        # cost. Alternating the two variants within one loop puts both in
        # the same drift regime; the overhead estimate is the median of
        # per-round deltas.
        #
        # Round-5 (VERDICT r4 item 6): reps are ADAPTIVE — keep doubling
        # the paired rounds until the IQR of the deltas is below the
        # point estimate (or the rep cap is hit), and report a bootstrap
        # 95% CI of the median delta; a row is only marked credible when
        # that CI excludes zero. r4's fixed 25 reps left every row except
        # 8-device indistinguishable from zero.
        iters = 0
        t_c, t_nc = [], []
        max_reps = int(os.environ.get("SCALING_MAX_REPS", "200"))
        while True:
            add = 25 if iters == 0 else iters  # 25, 50, 100, 200
            for _ in range(add):
                t0 = time.time()
                words, sse = step(blocks)
                float(sse)  # host sync
                t_c.append(time.time() - t0)
                t0 = time.time()
                wnc, ssenc = step_nc(blocks)
                jax.block_until_ready(ssenc)
                t_nc.append(time.time() - t0)
            iters = len(t_c)
            deltas = np.asarray(t_c) - np.asarray(t_nc)
            med_delta = float(np.median(deltas))
            q1, q3 = np.percentile(deltas, [25, 75])
            if (q3 - q1) < abs(med_delta) or iters >= max_reps:
                break
        dt = float(np.median(t_c))
        dt_nc = float(np.median(t_nc))
        fps = batch / dt
        comm_overhead_pct = max(0.0, med_delta / dt * 100.0)
        comm_overhead_iqr_pct = float((q3 - q1) / dt * 100.0)
        # bootstrap 95% CI of the median paired delta
        bs = np.random.default_rng(1)
        meds = np.median(
            deltas[bs.integers(0, len(deltas), (2000, len(deltas)))], axis=1)
        ci_lo, ci_hi = np.percentile(meds, [2.5, 97.5])
        row_credible = bool(ci_lo > 0.0)

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
        ts = []
        for _ in range(iters):
            t0 = time.time()
            out, flen, ok = rt(imgs)
            float(jnp.sum(flen))  # host sync
            ts.append(time.time() - t0)
        fdt = sorted(ts)[iters // 2]
        ffps = fbatch / fdt

        results.append({
            "devices": n, "mesh": [dp, sp],
            "frames_per_s": round(fps, 1),
            "frames_per_s_nocomm": round(batch / dt_nc, 1),
            "comm_overhead_pct": round(comm_overhead_pct, 1),
            "comm_overhead_iqr_pct": round(comm_overhead_iqr_pct, 1),
            "comm_overhead_ci95_pct": [
                round(ci_lo / dt * 100.0, 1), round(ci_hi / dt * 100.0, 1)],
            "credible": row_credible,
            "reps": iters,
            "dispatches_per_step": 1,
            "full_pipeline_frames_per_s": round(ffps, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    summary = None
    if len(results) > 1:
        speedup = results[-1]["frames_per_s"] / results[0]["frames_per_s"]
        # The "real-chip speedup = N x (1 - overhead)" reading is only
        # printed when the overhead column supports it: every row's
        # measured overhead must exceed neither its own noise band wildly
        # nor break monotone plausibility (overhead at n devices should
        # not be dwarfed by the row below it while its IQR is tighter).
        ovs = [r["comm_overhead_pct"] for r in results]
        iqrs = [r["comm_overhead_iqr_pct"] for r in results]
        monotone_ok = all(
            ov + iqr >= prev_ov - prev_iqr
            for (ov, iqr, prev_ov, prev_iqr) in zip(
                ovs[1:], iqrs[1:], ovs[:-1], iqrs[:-1])
        )
        # the speedup formula is only claimed from rows whose bootstrap
        # CI excludes zero (per-row "credible"); others are reported but
        # carry no claim
        n_cred = sum(1 for r in results if r["credible"])
        credible = monotone_ok and n_cred >= 1
        summary = {
            "scaling": f"{results[0]['devices']}->"
                       f"{results[-1]['devices']} devices",
            "speedup": round(speedup, 2),
            "overhead_credible": credible,
            "credible_rows": n_cred,
            "interpretation": (
                "virtual CPU devices share physical cores, so frames/s "
                "cannot scale; the meaningful column is comm_overhead_pct "
                "(paired-interleaved A/B vs identical collective-free "
                "work, adaptive reps until IQR < estimate or cap, "
                "bootstrap 95% CI per row; rows whose CI includes zero "
                "are marked credible=false and claim nothing) — "
                + ("real-chip speedup = N x (1 - overhead) from the "
                   "credible rows, pending multi-chip hardware"
                   if credible else
                   "no row's CI excludes zero; no speedup formula is "
                   "claimed from this artifact")),
        }
        print(json.dumps(summary), flush=True)

    out_path = os.environ.get("SCALING_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"rows": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
