"""Focused silicon probe: device-LZ DECODE walker cost per class at 4K.

Measures just plan+emit (to build real streams) then the decode kernel,
asserting bit-exactness — the minimal run to A/B a walker change without
paying the full probe_lz_tpu.py matrix. One TPU process at a time.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 2160, 3840
CHUNKS = 64


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import unpack_u32_to_u8
    from hap_tpu.snappy.device_lz import plan_lz
    from hap_tpu.snappy.pallas_lz import decode_lz_streams, emit_lz_streams
    from hap_tpu.utils.tracing import device_timer
    from tools.bench_content import make_frame

    print(f"device: {jax.devices()[0]}", flush=True)

    # tiny smoke first (fault safety, CLAUDE.md §4)
    rng = np.random.default_rng(0)
    tiny = np.tile(rng.integers(0, 255, (1, 1024), np.uint8), (8, 16))
    S0 = tiny.shape[1]
    p0 = plan_lz(jnp.asarray(tiny), S0, 16, 256)
    c0 = emit_lz_streams(jnp.asarray(tiny), p0.tables_lit, p0.tables_copy,
                         p0.counts, S0)
    o0, ok0 = decode_lz_streams(c0, p0.comp_len, S0)
    assert bool(np.asarray(ok0).all()), "tiny decode not ok"
    assert (np.asarray(o0) == tiny).all(), "tiny decode mismatch"
    print("tiny smoke ok", flush=True)

    for cls in ("graphics", "natural", "noise"):
        img = make_frame(cls, 0, H, W)
        jimg = jnp.asarray(img)
        words = _encode_blocks("hap_q", jimg)
        payload = np.asarray(
            unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1))
        S = len(payload) // CHUNKS
        data = jnp.asarray(payload.reshape(CHUNKS, S))
        rb = 4 * W

        @jax.jit
        def emit_fn(d):
            p = plan_lz(d, S, 16, rb)
            comp = emit_lz_streams(d, p.tables_lit, p.tables_copy, p.counts, S)
            return comp, p.comp_len

        t0 = time.time()
        comp, comp_len = emit_fn(data)
        comp = jax.block_until_ready(comp)
        cl = np.asarray(comp_len)
        print(f"{cls}: plan+emit warm [{time.time()-t0:.1f}s] "
              f"ratio {float(np.minimum(cl, S).sum())/(S*CHUNKS):.3f}",
              flush=True)

        @jax.jit
        def dec_fn(c, l):
            return decode_lz_streams(c, l, S)

        out, okc = dec_fn(comp, comp_len)
        outn = np.asarray(out)
        okn = np.asarray(okc)
        for c in range(CHUNKS):
            if cl[c] < S:
                assert okn[c], f"{cls} chunk {c} flagged"
                assert (outn[c] == payload.reshape(CHUNKS, S)[c]).all(), (
                    f"{cls} chunk {c} decode mismatch")
        dt, _ = device_timer(lambda c: dec_fn(c, comp_len)[0], comp, iters=6)
        print(f"{cls}: decode kernel {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
