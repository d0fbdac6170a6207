"""Decompose bench.py's 4K Hap Q roundtrip into stage costs.

Times successive PREFIXES of the pipeline (each as a 4-frame lax.map GOP
dispatch, host-synced like bench.py), so the ~30 ms tunnel sync floor
cancels in consecutive differences. Prints ms/frame per prefix and the
per-stage delta.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time, numpy as np, jax, jax.numpy as jnp

H, W = 2160, 3840
CHUNKS = 64
BATCH = 4
ITERS = 6

from hap_tpu.kernels.layout import image_to_blocks, blocks_to_image, unpack_u32_to_u8, pack_u8_to_u32
from hap_tpu.kernels.ycocg import rgb_to_cocgsy, cocgsy_to_rgb
from hap_tpu.kernels.bc3 import bc3_encode_blocks, bc3_decode_blocks
from hap_tpu.pipeline.device_frame import encode_frame_device, decode_frame_device
from hap_tpu.pipeline.device_pipeline import plan_chunks
from hap_tpu.constants import TextureFormat, CONSTANT_TO_FORMAT_ID, bytes_per_block
from hap_tpu.container.plan import dxt_payload_bytes

fmt = TextureFormat.YCoCg_DXT5
G = bytes_per_block(fmt)
nbytes = dxt_payload_bytes(W, H, fmt)
cc = plan_chunks(H, W, fmt, CHUNKS)
fid = CONSTANT_TO_FORMAT_ID[fmt]

def stage_fns():
    def s_layout(img):
        return image_to_blocks(img)
    def s_ycocg(img):
        return rgb_to_cocgsy(image_to_blocks(img))
    def s_bc3(img):
        return bc3_encode_blocks(rgb_to_cocgsy(image_to_blocks(img)))
    def s_bytes(img):
        w = s_bc3(img)
        return unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1)
    def s_frame(img):
        return encode_frame_device(s_bytes(img), cc, fid, G)
    def s_fdec(img):
        f, fl = s_frame(img)
        return decode_frame_device(f, nbytes, cc, fid, G)
    def s_words(img):
        p, ok = s_fdec(img)
        return pack_u8_to_u32(p.reshape(-1, 16)), ok
    def s_bc3dec(img):
        w, ok = s_words(img)
        return bc3_decode_blocks(w), ok
    def s_full(img):
        b, ok = s_bc3dec(img)
        return blocks_to_image(cocgsy_to_rgb(b), H, W), ok
    return [
        ("layout", s_layout),
        ("+ycocg", s_ycocg),
        ("+bc3_enc", s_bc3),
        ("+words->bytes", s_bytes),
        ("+frame_enc(snappy+container)", s_frame),
        ("+frame_dec(snappy+parse)", s_fdec),
        ("+bytes->words", s_words),
        ("+bc3_dec", s_bc3dec),
        ("+ycocg_inv+image", s_full),
    ]

def fold(x):
    if isinstance(x, tuple):
        return sum(fold(v) for v in x)
    return jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.uint8 else x.astype(jnp.int32)).astype(jnp.float32)

def main():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([128 + 100*np.sin(xx/97.0)*np.cos(yy/61.0),
                    128 + 100*np.cos(xx/53.0)*np.sin(yy/83.0),
                    128 + 100*np.sin((xx+yy)/71.0)], axis=-1)
    img[: H // 4] = 64.0
    img[H//2:H//2+H//8] += rng.normal(0, 12, (H//8, W, 3))
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    batch = jax.device_put(jnp.asarray(np.stack([img]*BATCH)))

    prev = None
    for name, fn in stage_fns():
        g = jax.jit(lambda frames, fn=fn: fold(jax.lax.map(fn, frames)))
        cs = float(g(batch))  # compile + warm
        t0 = time.time()
        for _ in range(ITERS):
            cs = float(g(batch))
        dt = (time.time() - t0) / (ITERS * BATCH) * 1000
        delta = "" if prev is None else f"  (+{dt - prev:7.2f} ms)"
        print(f"{name:32s} {dt:8.2f} ms/frame{delta}", flush=True)
        prev = dt

if __name__ == "__main__":
    main()
