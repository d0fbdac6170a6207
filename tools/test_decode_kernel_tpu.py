"""Silicon smoke test for decode_streams_from_frame (bytes + words paths).

Builds frames the way encode_frame_device lays them out (packed streams with
raw-fallback chunks mixed in) and checks bit-exact decode for several
(C, S, G) shapes. Run this after ANY decode-kernel change, before bench.py.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp

print(jax.devices(), flush=True)

from hap_tpu.snappy.device import snappy_encode_chunks
from hap_tpu.snappy.pallas_kernels import decode_streams_from_frame

rng = np.random.default_rng(0)
for C0, S, G in [(5, 1024, 8), (16, 4096, 16), (64, 129600, 16), (2025, 4096, 16)]:
    data = rng.integers(0, 256, (C0, S), dtype=np.uint8)
    data[: C0 // 2] = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
    comp, clen = snappy_encode_chunks(jnp.asarray(data), S, G)
    comp, clen = np.asarray(comp), np.asarray(clen)
    payload_off = 64
    is_comp = clen < S
    emit_len = np.where(is_comp, clen, S)
    positions = payload_off + np.concatenate([[0], np.cumsum(emit_len[:-1])]).astype(np.int32)
    frame = np.zeros(payload_off + int(emit_len.sum()) + 8, np.uint8)
    for c in range(C0):
        blob = comp[c, : clen[c]] if is_comp[c] else data[c]
        frame[positions[c] : positions[c] + emit_len[c]] = blob
    out, ok = decode_streams_from_frame(
        jnp.asarray(frame), jnp.asarray(positions),
        jnp.asarray(emit_len.astype(np.int32)), jnp.asarray(is_comp), S, G)
    assert np.asarray(ok).all(), f"C={C0}: not ok"
    assert (np.asarray(out) == data).all(), f"C={C0}: byte mismatch"
    outw, okw = decode_streams_from_frame(
        jnp.asarray(frame), jnp.asarray(positions),
        jnp.asarray(emit_len.astype(np.int32)), jnp.asarray(is_comp), S, G,
        out_words=True)
    ref = data.reshape(C0, -1, 4).astype(np.uint32)
    refw = ref[..., 0] | (ref[..., 1] << 8) | (ref[..., 2] << 16) | (ref[..., 3] << 24)
    assert np.asarray(okw).all() and (np.asarray(outw) == refw).all(), f"C={C0}: word mismatch"
    print(f"C={C0} S={S} G={G}: OK bytes+words (ratio {S*C0/emit_len.sum():.2f})", flush=True)
print("ALL OK", flush=True)
