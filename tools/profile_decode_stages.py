"""Decode-side stage costs for the 4K Hap Q path (host-synced GOP timing).

Stages are successive prefixes of decode_pipeline so the tunnel sync floor
cancels in consecutive deltas (see tools/profile_prefix.py for encode).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time, numpy as np, jax, jax.numpy as jnp

from hap_tpu.pipeline.device_pipeline import encode_pipeline, decode_pipeline
from hap_tpu.pipeline.device_frame import decode_frame_device
from hap_tpu.container.plan import dxt_payload_bytes
from hap_tpu.constants import TextureFormat, CONSTANT_TO_FORMAT_ID, bytes_per_block
from hap_tpu.kernels.bc3 import bc3_decode_blocks
from hap_tpu.kernels.ycocg import cocgsy_to_rgb
from hap_tpu.kernels.layout import blocks_to_image

H, W, CHUNKS, REP, ITERS = 2160, 3840, 64, 8, 5


def main():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([128 + 100 * np.sin(xx / 97.0) * np.cos(yy / 61.0),
                    128 + 100 * np.cos(xx / 53.0) * np.sin(yy / 83.0),
                    128 + 100 * np.sin((xx + yy) / 71.0)], axis=-1)
    img[: H // 4] = 64.0
    img[H // 2: H // 2 + H // 8] += rng.normal(0, 12, (H // 8, W, 3))
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    frame, _ = jax.jit(lambda im: encode_pipeline(im, "hap_q", CHUNKS))(jnp.asarray(img))
    frame = jax.block_until_ready(frame)
    fbatch = jnp.asarray(np.stack([np.asarray(frame)] * REP))
    fmt = TextureFormat.YCoCg_DXT5
    G = bytes_per_block(fmt)
    nbytes = dxt_payload_bytes(W, H, fmt)
    fid = CONSTANT_TO_FORMAT_ID[fmt]

    def t(f, name, prev=None):
        g = jax.jit(lambda xs: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(jax.lax.map(f, xs))))
        cs = float(g(fbatch))
        t0 = time.time()
        for _ in range(ITERS):
            cs = float(g(fbatch))
        dt = (time.time() - t0) / ITERS / REP * 1000
        delta = "" if prev is None else f"  (+{dt - prev:6.2f})"
        print(f"{name:38s} {dt:8.2f} ms/frame{delta}", flush=True)
        return dt

    def s1(f):
        return decode_frame_device(f, nbytes, CHUNKS, fid, G, out_words=True)

    def s2(f):
        w, ok = s1(f)
        return bc3_decode_blocks(w.reshape(-1, 4)), ok

    def s3(f):
        b, ok = s2(f)
        return blocks_to_image(cocgsy_to_rgb(b), H, W), ok

    p = t(lambda f: f[:128].astype(jnp.int32), "floor")
    p = t(s1, "decode_frame_device->words", p)
    p = t(s2, "+bc3_decode", p)
    p = t(s3, "+ycocg_inv+image", p)
    t(lambda f: decode_pipeline(f, H, W, "hap_q", CHUNKS), "decode_pipeline (full)", p)


if __name__ == "__main__":
    main()
