"""Stage decomposition of the 16K Hap Q roundtrip (run on TPU).

Verdict r3 asked where 16K throughput goes relative to 4K (the missing
~372 Mpix/s). Times each stage group with a host-fetched checksum every
iteration (CLAUDE.md rule 3) and prints the 4K-equivalent cost (x16.0
pixels) next to each row so the scaling loss is attributable per stage.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, CHUNKS = 8640, 15360, 1024
H4, W4, CHUNKS4 = 2160, 3840, 64
SCALE = (H * W) / (H4 * W4)


def timeit(f, *a, n=4, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms  (checksum {s:.3e})", flush=True)
    return dt


def frame_for(h, w):
    yy = np.linspace(0, 4 * np.pi, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 6 * np.pi, w, dtype=np.float32)[None, :]
    img = np.stack([
        128 + 100 * np.sin(xx) * np.cos(yy),
        128 + 100 * np.broadcast_to(np.cos(xx * 0.7), (h, w)),
        128 + 100 * np.broadcast_to(np.sin(yy * 1.3), (h, w)),
    ], axis=-1)
    img[: h // 8] = 32.0
    return jax.device_put(
        jnp.asarray(np.clip(np.round(img), 0, 255).astype(np.uint8)))


from hap_tpu.pipeline.device_pipeline import (
    _encode_blocks, _decode_blocks, encode_pipeline, decode_pipeline)

print("device:", jax.devices()[0], flush=True)
floor = timeit(lambda x: x + 1, jnp.float32(0), n=8, name="sync floor")

for (h, w, cc, tag) in [(H4, W4, CHUNKS4, "4K"), (H, W, CHUNKS, "16K")]:
    img = frame_for(h, w)
    print(f"--- {tag} ({h}x{w}, {cc} chunks) ---", flush=True)
    t_eb = timeit(lambda x: _encode_blocks("hap_q", x), img,
                  name=f"{tag} encode_blocks (layout+YCoCg+BC3)")
    words = jax.jit(lambda x: _encode_blocks("hap_q", x))(img)
    words.block_until_ready()
    t_db = timeit(lambda v: _decode_blocks("hap_q", v, h, w), words,
                  name=f"{tag} decode_blocks (BC3+YCoCg+layout)")
    t_ep = timeit(lambda x: encode_pipeline(x, "hap_q", cc), img,
                  name=f"{tag} encode_pipeline (blocks+snappy+frame)")
    frame, flen = jax.jit(lambda x: encode_pipeline(x, "hap_q", cc))(img)
    frame.block_until_ready()
    t_dp = timeit(lambda f: decode_pipeline(f, h, w, "hap_q", cc), frame,
                  name=f"{tag} decode_pipeline (parse+snappy+blocks)")
    rows = [("encode_blocks", t_eb), ("decode_blocks", t_db),
            ("snappy+frame (enc_pipe - blocks)", t_ep - t_eb),
            ("parse+snappy (dec_pipe - blocks)", t_dp - t_db)]
    print(f"{tag} net of {floor*1000:.1f} ms floor:")
    for nm, t in rows:
        net = (t - floor) * 1000
        eq = net / SCALE if tag == "16K" else net
        extra = (f"  [4K-equiv {eq:.2f} ms]" if tag == "16K" else "")
        print(f"  {nm}: {net:.2f} ms{extra}", flush=True)
