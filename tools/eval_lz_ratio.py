"""Ratio gate evaluation: device LZ planner vs google snappy on anchor DXT
payloads (VERDICT r4 job #1 'Done' criterion: device/ref <= 1.05 on the
natural and graphics 4K anchors).

Usage: JAX_PLATFORMS=cpu python tools/eval_lz_ratio.py [--hw 4k] [--seeds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_content import make_frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="4k", choices=["1080p", "4k"])
    ap.add_argument("--codec", default="hap_q")
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--emit", action="store_true",
                    help="also emit + verify streams (slow numpy loop)")
    args = ap.parse_args()
    H, W = (2160, 3840) if args.hw == "4k" else (1080, 1920)

    import jax.numpy as jnp

    from hap_tpu import oracle
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.snappy import pyref
    from hap_tpu.snappy.device_lz import emit_reference, plan_lz

    print(f"{'class':10s} {'seed':>4s} {'raw MB':>8s} {'ref MB':>8s} "
          f"{'lz MB':>8s} {'x ref':>7s} {'pieces':>8s} {'plan s':>7s}")
    agg = {}
    for cls in ("natural", "graphics", "noise"):
        for seed in range(args.seeds):
            img = make_frame(cls, seed, H, W)
            words = _encode_blocks(args.codec, jnp.asarray(img))
            payload = np.ascontiguousarray(
                np.asarray(words), dtype="<u4").tobytes()
            raw = len(payload)
            C = args.chunks
            S = raw // C
            data = np.frombuffer(payload, np.uint8).reshape(C, S)

            ref_total = 0
            for c in range(C):
                comp = oracle.snappy_compress(payload[c * S : (c + 1) * S])
                ref_total += min(len(comp), S)

            t0 = time.time()
            plan = plan_lz(jnp.asarray(data), S, 16, row_bytes=4 * W)
            comp_len = np.asarray(plan.comp_len)
            dt = time.time() - t0
            lz_total = int(np.minimum(comp_len, S).sum())
            pieces = int(np.asarray(plan.n_pieces)[comp_len < S].sum())
            print(f"{cls:10s} {seed:4d} {raw/1e6:8.2f} {ref_total/1e6:8.3f} "
                  f"{lz_total/1e6:8.3f} {lz_total/ref_total:7.3f} "
                  f"{pieces:8d} {dt:7.1f}")
            agg.setdefault(cls, []).append(lz_total / ref_total)

            if args.emit:
                streams = emit_reference(data, plan, S)
                for c, st in enumerate(streams):
                    if comp_len[c] < S:
                        assert pyref.decompress(st) == data[c].tobytes(), c
                print(f"  emitted + verified {C} chunks bit-exact")

    print()
    for cls, rs in agg.items():
        mark = "PASS" if max(rs) <= 1.05 else (
            "pass (not gated)" if cls == "noise" and max(rs) <= 1.15 else "FAIL")
        print(f"{cls:10s} worst x ref = {max(rs):.3f}  [{mark}]")


if __name__ == "__main__":
    main()
