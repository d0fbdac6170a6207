"""Per-stage timing of the CURRENT (planar) 4K Hap Q roundtrip on TPU.

Unlike profile_hapq_stages.py (round-2 interleaved path), this times the
stages the shipping pipeline actually runs (device_pipeline._encode_blocks
planar chain + split decode), and each stage is folded over a 16-frame
lax.map inside ONE dispatch — the same composition bench.py uses — so the
~28 ms host-sync floor is amortized 16x and per-frame stage costs are
readable to ~0.1 ms.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

H, W = 2160, 3840
CHUNKS = 64
B = 16

from tools.bench_content import make_gop  # noqa: E402

from hap_tpu.kernels.layout import (  # noqa: E402
    image_to_block_planes,
    words_to_payload,
    payload_to_words,
    blocks_to_image,
)
from hap_tpu.kernels.ycocg import rgb_to_cocgs_y_planes, cocgs_y_to_rgb  # noqa: E402
from hap_tpu.kernels.bc1 import bc1_encode_planes, bc1_decode_blocks  # noqa: E402
from hap_tpu.kernels.bc4 import bc4_encode_planes, bc4_decode_blocks  # noqa: E402
from hap_tpu.pipeline.device_frame import (  # noqa: E402
    encode_frame_device,
    decode_frame_device,
)


def timeit_map(f, x, n=5, name=""):
    """Time jax.lax.map(f, x) per element of the leading (B) axis."""
    g = jax.jit(
        lambda a: jax.tree.reduce(
            lambda acc, y: acc
            + jnp.sum(y.astype(jnp.float32)).astype(jnp.float32),
            jax.lax.map(f, a),
            jnp.float32(0),
        )
    )
    s = float(g(x))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(g(x))
        ts.append(time.time() - t0)
    dt = sorted(ts)[n // 2]
    per = (dt - FLOOR) / B * 1000
    print(f"{name}: {per:.2f} ms/frame  (dispatch {dt*1000:.1f} ms, "
          f"checksum {s:.3e})", flush=True)
    return per


def sync_floor(n=10):
    g = jax.jit(lambda x: x + 1)
    float(g(jnp.float32(0)))
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(g(jnp.float32(0)))
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


def main():
    global FLOOR
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    FLOOR = sync_floor()
    print(f"sync floor: {FLOOR*1000:.1f} ms", flush=True)

    imgs = jax.device_put(jnp.asarray(make_gop(B, H, W)), dev)

    # ---- encode stages --------------------------------------------------
    timeit_map(lambda im: image_to_block_planes(im[..., :3]), imgs,
               name="image_to_block_planes")
    planes = jax.jit(jax.lax.map, static_argnums=0)(
        lambda im: image_to_block_planes(im[..., :3]), imgs)
    planes = jax.block_until_ready(planes)

    timeit_map(rgb_to_cocgs_y_planes, planes, name="rgb_to_cocgs_y_planes")
    cocgs_p, y_p = jax.jit(lambda p: jax.lax.map(rgb_to_cocgs_y_planes, p))(
        planes)
    cocgs_p = jax.block_until_ready(cocgs_p)
    y_p = jax.block_until_ready(y_p)

    timeit_map(bc4_encode_planes, y_p, name="bc4_encode_planes (Y)")
    timeit_map(partial(bc1_encode_planes, refine_iters=2), cocgs_p,
               name="bc1_encode_planes (CoCgS, 2 rounds)")

    def enc_both(args):
        cp, yp = args
        return jnp.concatenate(
            [bc4_encode_planes(yp), bc1_encode_planes(cp, refine_iters=2)],
            axis=1)

    timeit_map(enc_both, (cocgs_p, y_p), name="bc4+bc1 encode (+concat)")
    words = jax.jit(lambda a: jax.lax.map(enc_both, a))((cocgs_p, y_p))
    words = jax.block_until_ready(words)

    timeit_map(words_to_payload, words, name="words_to_payload")
    payloads = jax.jit(lambda ws: jax.lax.map(words_to_payload, ws))(words)
    payloads = jax.block_until_ready(payloads)

    f_fe = partial(encode_frame_device, chunk_count=CHUNKS, fmt_id=0xF, G=16)
    timeit_map(lambda p: f_fe(p), payloads,
               name="encode_frame_device (snappy+container)")
    frames, flens = jax.jit(lambda ps: jax.lax.map(f_fe, ps))(payloads)
    frames = jax.block_until_ready(frames)

    # ---- decode stages --------------------------------------------------
    nbytes = payloads.shape[1]
    f_fd = partial(decode_frame_device, input_bytes=nbytes,
                   chunk_count=CHUNKS, fmt_id=0xF, G=16, out_words=True)
    timeit_map(lambda f: f_fd(f), frames,
               name="decode_frame_device (container+snappy)")
    wdec, ok = jax.jit(lambda fs: jax.lax.map(f_fd, fs))(frames)
    wdec = jax.block_until_ready(wdec)
    print("decode ok:", np.asarray(ok).all(), flush=True)

    def bcn_dec(wflat):
        wq = wflat.reshape(-1, 4)
        cocgs, _ = bc1_decode_blocks(wq[:, 2:4], dxt1_punchthrough=False)
        y = bc4_decode_blocks(wq[:, 0:2])
        return cocgs, y

    timeit_map(bcn_dec, wdec, name="bc1+bc4 decode (split)")
    cocgs_d, y_d = jax.jit(lambda ws: jax.lax.map(bcn_dec, ws))(wdec)
    cocgs_d = jax.block_until_ready(cocgs_d)

    timeit_map(lambda a: cocgs_y_to_rgb(a[0], a[1]), (cocgs_d, y_d),
               name="cocgs_y_to_rgb")
    rgbs = jax.jit(
        lambda a: jax.lax.map(lambda t: cocgs_y_to_rgb(t[0], t[1]), a)
    )((cocgs_d, y_d))
    rgbs = jax.block_until_ready(rgbs)

    timeit_map(partial(blocks_to_image, height=H, width=W), rgbs,
               name="blocks_to_image")

    # ---- composed -------------------------------------------------------
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline

    timeit_map(partial(roundtrip_pipeline, codec="hap_q", chunk_count=CHUNKS),
               imgs, name="FULL roundtrip_pipeline")


if __name__ == "__main__":
    main()
