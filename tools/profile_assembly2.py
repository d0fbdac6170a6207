"""Assembly variants: scan-in-cond (current) vs cond-free (run on TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, B, CHUNKS = 2160, 3840, 16, 64


def timeit(f, *a, n=5, name=""):
    g = jax.jit(lambda *args: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)).astype(jnp.float32),
        f(*args), jnp.float32(0)))
    s = float(g(*a))
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(g(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000/B:.2f} ms/frame (cs {s:.3e})", flush=True)


timeit(lambda x: x + 1, jnp.float32(0), n=8, name="sync floor/16")

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

from hap_tpu.pipeline.device_pipeline import _encode_blocks
from hap_tpu.pipeline.device_frame import (
    _assemble_frame, _header4, frame_layout, _u32le,
)
from hap_tpu.constants import (
    CHUNK_COMPRESSOR_NONE, CHUNK_COMPRESSOR_SNAPPY, COMPRESSOR_COMPLEX,
    SECTION_CHUNK_COMPRESSOR_TABLE, SECTION_CHUNK_SIZE_TABLE,
    SECTION_DECODE_INSTRUCTIONS,
)
from hap_tpu.kernels.layout import words_to_payload
from hap_tpu.snappy.device import snappy_encode_chunks

M = lambda f: (lambda xs: jax.lax.map(f, xs))
payloads = jax.jit(M(lambda im: words_to_payload(_encode_blocks("hap_q", im))))(imgs)
S = payloads.shape[1] // CHUNKS
comp, clen = jax.jit(M(lambda p: snappy_encode_chunks(p.reshape(CHUNKS, S), S, 16)))(payloads)
_I32, _U8 = jnp.int32, jnp.uint8


def assemble_nocond(args):
    """Complex-only assembly, scan OUTSIDE any cond."""
    payload, comp_b, comp_len_b = args
    input_bytes = payload.shape[0]
    C = CHUNKS
    S_, dil, top_hdr, bound, payload_off, fmax = frame_layout(input_bytes, C, 16)
    chunks = payload.reshape(C, S_)
    is_comp = comp_len_b < S_
    emit_len = jnp.where(is_comp, comp_len_b, S_)
    comp_byte = jnp.where(is_comp, CHUNK_COMPRESSOR_SNAPPY, CHUNK_COMPRESSOR_NONE).astype(_U8)
    positions = jnp.concatenate([jnp.zeros(1, _I32), jnp.cumsum(emit_len[:-1])])
    total_payload = positions[-1] + emit_len[-1]
    top_section_length = 4 + dil + total_payload

    frame = jnp.zeros(fmax, _U8)
    type_byte = (COMPRESSOR_COMPLEX << 4) | 0xF
    frame = jax.lax.dynamic_update_slice(frame, _header4(top_section_length, type_byte), (0,))
    frame = jax.lax.dynamic_update_slice(
        frame, _header4(jnp.asarray(dil, _I32), SECTION_DECODE_INSTRUCTIONS), (top_hdr,))
    frame = jax.lax.dynamic_update_slice(
        frame, _header4(jnp.asarray(C, _I32), SECTION_CHUNK_COMPRESSOR_TABLE), (top_hdr + 4,))
    frame = jax.lax.dynamic_update_slice(frame, comp_byte, (top_hdr + 8,))
    frame = jax.lax.dynamic_update_slice(
        frame, _header4(jnp.asarray(4 * C, _I32), SECTION_CHUNK_SIZE_TABLE), (top_hdr + 8 + C,))
    frame = jax.lax.dynamic_update_slice(frame, _u32le(emit_len).reshape(-1), (top_hdr + 12 + C,))

    def body(fr, c):
        stream_c = jnp.where(is_comp[c], comp_b[c, :bound], jnp.pad(chunks[c], (0, bound - S_)))
        return jax.lax.dynamic_update_slice(fr, stream_c, (payload_off + positions[c],)), None

    frame, _ = jax.lax.scan(body, frame, jnp.arange(C, dtype=_I32))
    return frame, top_hdr + top_section_length


timeit(M(lambda args: _assemble_frame(args[0], args[1], args[2], CHUNKS, 0xF, 16)),
       (payloads, comp, clen), name="assembly current (scan in cond)")
timeit(M(assemble_nocond), (payloads, comp, clen), name="assembly no-cond")
