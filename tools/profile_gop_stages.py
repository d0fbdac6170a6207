"""Per-stage timing of the GOP-batched 4K Hap Q roundtrip vs the per-frame
lax.map formulation (run on TPU). Host-synced every iteration."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

H, W = 2160, 3840
CHUNKS = 64
B = 16


def timeit(f, *a, n=4, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    t0 = time.time()
    for _ in range(n):
        float(g(*a))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms total, {dt*1000/B:.2f} ms/frame (cs {s:.3e})",
          flush=True)
    return dt


floor = timeit(lambda x: x + 1, jnp.float32(0), n=10, name="sync floor")

rng = np.random.default_rng(7)
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
img_np = np.stack([
    128 + 100 * np.sin(xx / 97.0) * np.cos(yy / 61.0),
    128 + 100 * np.cos(xx / 53.0) * np.sin(yy / 83.0),
    128 + 100 * np.sin((xx + yy) / 71.0)], axis=-1)
img_np[: H // 4] = 64.0
img_np[H // 2: H // 2 + H // 8] += rng.normal(0, 12, (H // 8, W, 3))
img_np = np.clip(np.round(img_np), 0, 255).astype(np.uint8)
imgs = jax.device_put(jnp.asarray(np.stack([img_np] * B)))

from hap_tpu.pipeline.device_pipeline import (
    _encode_blocks_gop, roundtrip_pipeline, roundtrip_pipeline_gop,
    encode_pipeline_gop, decode_pipeline_gop,
)
from hap_tpu.pipeline.device_frame import (
    encode_frames_device, decode_frames_device,
)
from hap_tpu.kernels.layout import unpack_u32_to_u8
from hap_tpu.snappy.device import snappy_encode_chunks

# --- encode stages -----------------------------------------------------
timeit(partial(_encode_blocks_gop, "hap_q"), imgs, name="bcn encode (gop)")
words = jax.jit(partial(_encode_blocks_gop, "hap_q"))(imgs)
payloads = jax.jit(lambda w: unpack_u32_to_u8(w.reshape(B, -1)))(words)
timeit(lambda w: unpack_u32_to_u8(w.reshape(B, -1)), words, name="words->bytes (gop)")
S = payloads.shape[1] // CHUNKS
timeit(partial(snappy_encode_chunks, S=S, G=16),
       payloads.reshape(B * CHUNKS, S), name=f"snappy_encode C={B*CHUNKS}")
f_enc = partial(encode_frames_device, chunk_count=CHUNKS, fmt_id=0xF, G=16)
timeit(f_enc, payloads, name="encode_frames_device (snappy+container)")
frames, flens = jax.jit(f_enc)(payloads)
timeit(partial(encode_pipeline_gop, codec="hap_q", chunk_count=CHUNKS), imgs,
       name="encode_pipeline_gop (full)")

# --- decode stages -----------------------------------------------------
f_dec = partial(decode_frames_device, input_bytes=int(payloads.shape[1]),
                chunk_count=CHUNKS, fmt_id=0xF, G=16, out_words=True)
wdec, ok = jax.jit(f_dec)(frames)
print("decode ok:", np.asarray(ok).tolist(), flush=True)
timeit(f_dec, frames, name="decode_frames_device (out_words)")
timeit(partial(decode_pipeline_gop, height=H, width=W, codec="hap_q",
               chunk_count=CHUNKS), frames, name="decode_pipeline_gop (full)")

# --- end to end --------------------------------------------------------
timeit(partial(roundtrip_pipeline_gop, codec="hap_q", chunk_count=CHUNKS), imgs,
       name="roundtrip GOP")
timeit(lambda fs: jax.lax.map(lambda f: roundtrip_pipeline(f, "hap_q", CHUNKS), fs),
       imgs, name="roundtrip lax.map")
print(f"(subtract ~{floor*1000:.1f} ms sync floor from each total)", flush=True)
