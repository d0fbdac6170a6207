"""Serving warm-up: pre-compile the hot pipelines for a declared shape set.

A serving process that needs minutes of XLA compilation before its first
frame is not production-ready (BENCH_r03 recorded 185 s cold). This tool
populates the persistent JAX compilation cache (JAX_COMPILATION_CACHE_DIR,
default /root/.jax_cache) for every (codec, H, W, chunk_count, batch)
combination declared, so a serving process started afterwards hits the
cache and its first dispatch costs loading, not compiling.

Usage:
  python tools/warm_cache.py                      # default serving set
  python tools/warm_cache.py hap_q:2160:3840:64:16 hap:1080:1920:32:8

Prints one line per program with compile (cold) vs reload (warm) time;
the warm number is what a freshly started server pays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

DEFAULT = ["hap_q:2160:3840:64:16"]


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

    specs = sys.argv[1:] or DEFAULT
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    for spec in specs:
        codec, h, w, cc, b = spec.split(":")
        h, w, cc, b = int(h), int(w), int(cc), int(b)
        img = jnp.zeros((b, h, w, 3 if codec in ("hap", "hap_q") else 4),
                        jnp.uint8)
        img = jax.device_put(img, dev)

        @jax.jit
        def gop(frames):
            out, flen, ok = jax.lax.map(
                lambda f: roundtrip_pipeline(f, codec, cc), frames)
            return (jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen)
                    + jnp.sum(ok))

        t0 = time.time()
        float(gop(img))
        t_first = time.time() - t0
        # Same program text from a cleared in-process cache: the
        # persistent-cache reload cost a fresh server pays.
        gop.clear_cache()
        t0 = time.time()
        float(gop(img))
        t_reload = time.time() - t0
        print(f"{spec}: first(+maybe-compile) {t_first:.1f}s, "
              f"persistent-cache reload {t_reload:.1f}s", flush=True)


if __name__ == "__main__":
    main()
