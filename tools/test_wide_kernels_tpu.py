"""Silicon validation of the wide-unit byte-plane kernels (run on TPU).

Covers: structured encode (compact_streams) + decode (frame-direct kernel)
across shapes/content kinds, agreement with the portable XLA impl and the
pure-Python general decoder, and full device frame roundtrips.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from hap_tpu.snappy import pyref
from hap_tpu.snappy.device import snappy_decode_chunks, snappy_encode_chunks
from hap_tpu.pipeline.device_frame import decode_frame_device, encode_frame_device

rng = np.random.default_rng(42)
print("device:", jax.devices()[0], flush=True)


def mixed(n, g):
    out = np.empty(n, np.uint8)
    half = n // 2
    out[:half] = np.tile(rng.integers(0, 256, g, dtype=np.uint8), half // g + 1)[:half]
    out[half:] = rng.integers(0, 256, n - half, dtype=np.uint8)
    return out


def check_streams(S, G, C=8):
    data = np.empty((C, S), np.uint8)
    kinds = ["flat0", "periodic", "random", "mixed", "ramp", "flat255", "halfper", "tailper"]
    data[0] = 0
    data[1 % C] = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
    data[2 % C] = rng.integers(0, 256, S, dtype=np.uint8)
    data[3 % C] = mixed(S, G)
    data[4 % C] = np.arange(S, dtype=np.uint8)
    data[5 % C] = 255
    data[6 % C] = mixed(S, G)[::-1].copy()
    d = rng.integers(0, 256, S, dtype=np.uint8)
    d[-min(S, 2048):] = np.tile(
        rng.integers(0, 256, G, dtype=np.uint8), min(S, 2048) // G
    )
    data[7 % C] = d

    comp, clen = jax.jit(
        lambda x: snappy_encode_chunks(x, S, G), backend=None
    )(jnp.asarray(data))
    comp, clen = np.asarray(comp), np.asarray(clen)
    cx, lx = snappy_encode_chunks(jnp.asarray(data), S, G, impl="xla")
    cx, lx = np.asarray(cx), np.asarray(lx)
    assert (clen == lx).all(), (S, G, "len mismatch pallas vs xla")
    for c in range(C):
        assert (comp[c, : clen[c]] == cx[c, : clen[c]]).all(), (S, G, c, "bytes")
        got = pyref.decompress(comp[c, : clen[c]].tobytes(), expected_length=S)
        assert got == data[c].tobytes(), (S, G, c, kinds[c % len(kinds)], "conformance")
    dec, ok = snappy_decode_chunks(jnp.asarray(comp), jnp.asarray(clen), S, G)
    dec, ok = np.asarray(dec), np.asarray(ok)
    assert ok.all(), (S, G, "decode ok", ok)
    assert (dec == data).all(), (S, G, "decode bytes")
    ratio = S * C / clen.sum()
    print(f"streams S={S} G={G}: OK (ratio {ratio:.1f}x)", flush=True)


def check_frame(nbytes, chunks, G, fmt_id):
    payload = mixed(nbytes, G)
    fb, flen = encode_frame_device(jnp.asarray(payload), chunks, fmt_id, G)
    fb, flen = np.asarray(fb), int(flen)
    frame = fb[:flen].tobytes()
    from hap_tpu.pipeline.codecs import _decode_texture_python

    assert _decode_texture_python(frame, 0) == payload.tobytes(), "host decode"
    dec, ok = decode_frame_device(
        jnp.asarray(np.frombuffer(frame, np.uint8)), nbytes, chunks, fmt_id, G
    )
    assert bool(np.asarray(ok)), "device decode ok"
    assert (np.asarray(dec) == payload).all(), "device decode bytes"
    print(f"frame nbytes={nbytes} chunks={chunks} G={G}: OK ({flen/1e3:.1f} KB)", flush=True)


# Small shapes first (cheap compiles), then 4K-chunk shapes.
for S, G in [(512, 8), (1024, 16), (1032, 8), (2096, 16), (4096, 16), (8192, 8)]:
    check_streams(S, G)
check_streams(129600, 16, C=8)  # 4K hap_q chunk shape

check_frame(16 * 1024, 8, 16, 0xE)
check_frame(64 * 1024, 16, 8, 0xB)
H, W = 2160, 3840
check_frame(H * W, 64, 16, 0xF)  # 4K hap_q payload size
print("ALL OK", flush=True)
