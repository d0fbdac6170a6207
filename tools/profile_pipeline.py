import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

from hap_tpu.utils.tracing import device_timer

H, W = 2160, 3840
CH = 64
rng = np.random.default_rng(7)
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
img_np = np.clip(np.stack([
    128 + 100*np.sin(xx/97.0)*np.cos(yy/61.0),
    128 + 100*np.cos(xx/53.0)*np.sin(yy/83.0),
    128 + 100*np.sin((xx+yy)/71.0)], axis=-1), 0, 255).astype(np.uint8)
img_np[:H//4] = 64
img = jax.device_put(jnp.asarray(img_np))

def t(name, fn, *a, **kw):
    dt, _ = device_timer(fn, *a, iters=5)
    print(f"{name}: {dt*1000:.2f} ms", flush=True)

# sync floor
t("sync floor", lambda x: x * 2, jnp.ones((8, 128)))

from hap_tpu.pipeline.device_pipeline import (
    encode_pipeline, decode_pipeline, roundtrip_pipeline, _encode_blocks, _decode_blocks)
from hap_tpu.pipeline.device_frame import encode_frame_device, decode_frame_device, frame_layout
from hap_tpu.kernels.layout import unpack_u32_to_u8, pack_u8_to_u32, image_to_blocks
from hap_tpu.container.plan import dxt_payload_bytes, legalize_chunk_count
from hap_tpu.constants import TextureFormat, bytes_per_block

t("roundtrip (1 frame)", partial(roundtrip_pipeline, codec="hap_q", chunk_count=CH), img)
t("encode_pipeline", partial(encode_pipeline, codec="hap_q", chunk_count=CH), img)
frame_buf, flen = jax.jit(partial(encode_pipeline, codec="hap_q", chunk_count=CH))(img)
frame_buf = jax.block_until_ready(frame_buf)
t("decode_pipeline", partial(decode_pipeline, height=H, width=W, codec="hap_q", chunk_count=CH), frame_buf)

t("enc blocks (ycocg+bc3)", partial(_encode_blocks, "hap_q"), img)
words = jax.jit(partial(_encode_blocks, "hap_q"))(img)
words = jax.block_until_ready(words)
t("words->bytes", lambda w: unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1), words)
payload = jax.jit(lambda w: unpack_u32_to_u8(w.reshape(1, -1)).reshape(-1))(words)
payload = jax.block_until_ready(payload)

fmt = TextureFormat.YCoCg_DXT5
nbytes = dxt_payload_bytes(W, H, fmt)
cc = legalize_chunk_count(nbytes, fmt, CH)
g = bytes_per_block(fmt)
t("frame_enc (snappy+container)", partial(encode_frame_device, chunk_count=cc, fmt_id=0xF, G=g), payload)
fr, fl = jax.jit(partial(encode_frame_device, chunk_count=cc, fmt_id=0xF, G=g))(payload)
fr = jax.block_until_ready(fr)
t("frame_dec (parse+snappy)", partial(decode_frame_device, input_bytes=nbytes, chunk_count=cc, fmt_id=0xF, G=g), fr)
pay2, ok = jax.jit(partial(decode_frame_device, input_bytes=nbytes, chunk_count=cc, fmt_id=0xF, G=g))(fr)
pay2 = jax.block_until_ready(pay2)
t("bytes->words", lambda p: pack_u8_to_u32(p.reshape(-1, 16)), pay2)
w2 = jax.jit(lambda p: pack_u8_to_u32(p.reshape(-1, 16)))(pay2)
w2 = jax.block_until_ready(w2)
t("dec blocks (bc3+ycocg)", partial(_decode_blocks, "hap_q", h=H, w=W), w2)

# bitcast variants for byte conversion
t("words->bytes bitcast", lambda w: jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(-1), words)
t("bytes->words bitcast", lambda p: jax.lax.bitcast_convert_type(p.reshape(-1, 4, 4), jnp.uint32)[..., 0], pay2)
