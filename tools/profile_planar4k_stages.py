"""Per-stage timing of the CURRENT (round-4 planar/MXU) 4K Hap Q chain.

The r3 profiler (profile_hapq_stages.py) predates the planar encode/decode
chain and the MXU word interleave; this one times the stages the pipeline
actually runs now, each in a 16-frame lax.map GOP dispatch (matching
bench.py's serving shape) so per-frame costs amortize the sync floor the
same way the headline does. Run on TPU.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, CHUNKS, B = 2160, 3840, 64, 16

from hap_tpu.kernels.layout import (
    image_to_block_planes, block_planes_to_image, interleave_words_mxu,
    deinterleave_words_mxu)
from hap_tpu.kernels.ycocg import rgb_to_cocgs_y_planes
from hap_tpu.kernels.bc1 import bc1_encode_planes_words
from hap_tpu.kernels.bc4 import bc4_encode_planes_words
from hap_tpu.pipeline.device_pipeline import (
    _encode_blocks, _decode_blocks, encode_pipeline, decode_pipeline,
    roundtrip_pipeline)
from tools.bench_content import make_frame


def timeit(f, *a, n=5, name=""):
    """f maps ONE frame('s stage input); timed as a 16-iteration lax.map
    over a leading batch dim, reported per frame."""
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        jax.lax.map(lambda xs: f(*xs), args), jnp.float32(0)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n / B
    print(f"{name}: {dt*1000:.3f} ms/frame (checksum {s:.3e})", flush=True)
    return dt


print("device:", jax.devices()[0], flush=True)
imgs = np.stack([make_frame(["natural", "graphics", "noise"][k % 3], k, H, W)
                 for k in range(B)])
imgs = jax.device_put(jnp.asarray(imgs))

# stage inputs, precomputed batched
jplanes = jax.jit(lambda b: jax.lax.map(
    lambda x: image_to_block_planes(x[..., :3]), b))
planes = jplanes(imgs); planes.block_until_ready()
jco = jax.jit(lambda b: jax.lax.map(rgb_to_cocgs_y_planes, b))
co = jco(planes)
jax.block_until_ready(co)
cocgs_p, y_p = co
jwords = jax.jit(lambda b: jax.lax.map(
    lambda x: _encode_blocks("hap_q", x), b))
words = jwords(imgs); words.block_until_ready()
jframe = jax.jit(lambda b: jax.lax.map(
    lambda x: encode_pipeline(x, "hap_q", CHUNKS), b))
frames, flens = jframe(imgs)
jax.block_until_ready(frames)

timeit(lambda x: x + 1, jnp.zeros((B, 8, 128), jnp.float32),
       name="floor (tiny map)")
timeit(lambda x: image_to_block_planes(x[..., :3]), imgs,
       name="image_to_block_planes")
timeit(rgb_to_cocgs_y_planes, planes, name="rgb_to_cocgs_y")
timeit(lambda c, y: bc4_encode_planes_words(y), cocgs_p, y_p,
       name="bc4 encode (Y)")
timeit(lambda c, y: bc1_encode_planes_words(c, refine_iters=2), cocgs_p, y_p,
       name="bc1 encode (CoCg, 2 refine)")
timeit(lambda c, y: interleave_words_mxu(
    bc4_encode_planes_words(y) + bc1_encode_planes_words(c, refine_iters=2)),
    cocgs_p, y_p, name="bc encode + interleave")
timeit(lambda x: _encode_blocks("hap_q", x), imgs, name="encode_blocks TOTAL")
timeit(lambda x: encode_pipeline(x, "hap_q", CHUNKS), imgs,
       name="encode_pipeline TOTAL (blocks+snappy+frame)")
timeit(lambda v: _decode_blocks("hap_q", v, H, W), words,
       name="decode_blocks TOTAL")
timeit(lambda f: decode_pipeline(f, H, W, "hap_q", CHUNKS), frames,
       name="decode_pipeline TOTAL (parse+snappy+blocks)")
timeit(lambda x: roundtrip_pipeline(x, "hap_q", CHUNKS), imgs,
       name="roundtrip TOTAL")
