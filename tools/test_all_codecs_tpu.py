"""Silicon conformance sweep: every codec's device pipeline, on TPU.

For each codec x frame size (even + odd dims) x content kind: run the
on-device encode pipeline, decode the emitted container with the host/native
path (independent implementation), and roundtrip on device. Asserts the
device decode equals the host decode of the same bytes.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from hap_tpu.pipeline.codecs import decode_frame
from hap_tpu.pipeline.device_pipeline import encode_pipeline, decode_pipeline

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(11)

CODECS = [
    ("hap", 3), ("hap_alpha", 4), ("hap_q", 3), ("hap_alpha_only", 1),
    ("hap_r", 4), ("hap_hdr", 3), ("hap_q_alpha", 4),
]
SIZES = [(128, 256), (37, 53)]


def content(kind, h, w, ch):
    if kind == "structured":
        img = np.broadcast_to(
            np.linspace(0, 255, w, dtype=np.uint8)[None, :, None], (h, w, ch)
        ).copy()
        img[: h // 4] = 200
        return img
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


for codec, ch in CODECS:
    for (h, w) in SIZES:
        for kind in ("structured", "noise"):
            img_np = content(kind, h, w, ch)
            if codec == "hap_alpha_only":
                img_in = img_np[..., 0]
            elif codec == "hap_hdr":
                img_in = (img_np[..., :3].astype(np.float32) / 255.0) * 4.0
            else:
                img_in = img_np
            img = jnp.asarray(img_in)
            buf, flen = jax.jit(
                lambda x: encode_pipeline(x, codec, 4)
            )(img)
            flen_i = int(flen)
            fb = bytes(np.asarray(buf)[:flen_i])
            out_dev, ok = jax.jit(
                lambda f: decode_pipeline(f, h, w, codec, 4)
            )(buf)
            assert bool(ok), (codec, h, w, kind, "device ok flag")
            out_host = decode_frame(fb, h, w)
            np.testing.assert_array_equal(
                np.asarray(out_dev), np.asarray(out_host),
                err_msg=f"{codec} {h}x{w} {kind}",
            )
            print(f"{codec:>14} {h}x{w} {kind:>10}: OK "
                  f"({flen_i/1024:.1f} KB, nibble 0x{fb[3]:02x})", flush=True)
print("ALL CODECS OK ON SILICON", flush=True)
