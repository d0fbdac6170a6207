"""On-device byte plane: structured Snappy, container assembly, pipelines.

Conformance matrix: device-encoded frames must decode bit-exactly via
(a) the pure-Python oracle, (b) the native C++ runtime, (c) the device
decoder — three independent implementations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu import Compressor, TextureFormat
from hap_tpu import native
from hap_tpu.constants import CONSTANT_TO_FORMAT_ID, bytes_per_block
from hap_tpu.container.parse import frame_texture_chunk_count, parse_frame
from hap_tpu.container.serialize import serialize_texture
from hap_tpu.pipeline.codecs import _decode_texture_python
from hap_tpu.pipeline.device_frame import decode_frame_device, encode_frame_device
from hap_tpu.pipeline.device_pipeline import (
    decode_pipeline,
    encode_pipeline,
    roundtrip_pipeline,
)
from hap_tpu.snappy import pyref
from hap_tpu.snappy.device import snappy_decode_chunks, snappy_encode_chunks


def mixed_payload(rng, nbytes, g):
    """Half flat (repeated g-byte blocks), half random — exercises both

    copy and literal units and the per-chunk raw fallback."""
    out = np.empty(nbytes, np.uint8)
    half = nbytes // 2
    out[:half] = np.tile(rng.integers(0, 256, g, dtype=np.uint8), half // g + 1)[:half]
    out[half:] = rng.integers(0, 256, nbytes - half, dtype=np.uint8)
    return out


# ---------------------------------------------------------------------------
# Device snappy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("S,G", [(512, 8), (4096, 8), (4096, 16), (1032, 8), (2096, 16)])
def test_device_snappy_conformance(rng, S, G):
    C = 6
    data = np.empty((C, S), np.uint8)
    data[0] = 0
    data[1] = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
    data[2] = rng.integers(0, 256, S, dtype=np.uint8)
    data[3] = mixed_payload(rng, S, G)
    data[4] = np.arange(S, dtype=np.uint8)
    data[5] = 255
    comp, clen = snappy_encode_chunks(jnp.asarray(data), S, G)
    comp, clen = np.asarray(comp), np.asarray(clen)
    for c in range(C):
        # General snappy decoders accept our structured streams bit-exactly.
        assert pyref.decompress(comp[c, : clen[c]].tobytes(), expected_length=S) == data[c].tobytes()
        assert native.snappy_uncompress(comp[c, : clen[c]].tobytes()) == data[c].tobytes()
    dec, ok = snappy_decode_chunks(jnp.asarray(comp), jnp.asarray(clen), S, G)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_device_snappy_flags_foreign_stream(rng):
    # Period-3 content: a general encoder emits offset-3 copies, which are
    # legal Snappy but outside the structured profile -> flagged not-ok.
    S, G = 1024, 8
    data = np.tile(rng.integers(0, 256, 3, dtype=np.uint8), S // 3 + 1)[:S]
    foreign = pyref.compress(data.tobytes())
    buf = np.zeros((1, 2048), np.uint8)
    buf[0, : len(foreign)] = np.frombuffer(foreign, np.uint8)
    dec, ok = snappy_decode_chunks(
        jnp.asarray(buf), jnp.asarray([len(foreign)]), S, G
    )
    assert not bool(np.asarray(ok)[0])


def test_device_snappy_accepts_coinciding_foreign_stream(rng):
    # For G-periodic content, general encoders (pyref here) happen to emit
    # exactly the structured profile's seeded flavor (seed literal +
    # offset-G copy2 run) — the device fast path decodes it bit-exactly.
    S, G = 1024, 8
    data = np.tile(rng.integers(0, 256, G, dtype=np.uint8), S // G)
    foreign = pyref.compress(data.tobytes())
    buf = np.zeros((1, 2048), np.uint8)
    buf[0, : len(foreign)] = np.frombuffer(foreign, np.uint8)
    dec, ok = snappy_decode_chunks(
        jnp.asarray(buf), jnp.asarray([len(foreign)]), S, G
    )
    assert bool(np.asarray(ok)[0])
    np.testing.assert_array_equal(np.asarray(dec)[0], data)


def test_device_snappy_compresses_flat():
    S, G = 4096, 16
    data = np.zeros((1, S), np.uint8)
    comp, clen = snappy_encode_chunks(jnp.asarray(data), S, G)
    assert int(clen[0]) < S // 10  # ~16x on flat content


# ---------------------------------------------------------------------------
# Device container
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt,blocks,chunks", [
    (TextureFormat.RGB_DXT1, 2048, 32),
    (TextureFormat.RGBA_DXT5, 2048, 32),
    (TextureFormat.YCoCg_DXT5, 1000, 8),
    (TextureFormat.A_RGTC1, 4096, 64),
])
def test_device_frame_three_way_conformance(rng, fmt, blocks, chunks):
    g = bytes_per_block(fmt)
    payload = mixed_payload(rng, blocks * g, g)
    fmt_id = CONSTANT_TO_FORMAT_ID[fmt]
    frame_buf, flen = encode_frame_device(jnp.asarray(payload), chunks, fmt_id, g)
    frame = np.asarray(frame_buf)[: int(flen)].tobytes()
    # (a) python oracle, (b) native, (c) device
    assert _decode_texture_python(frame, 0) == payload.tobytes()
    out, got_fmt = native.decode(frame)
    assert out == payload.tobytes() and got_fmt == fmt
    dec, ok = decode_frame_device(
        jnp.asarray(np.frombuffer(frame, np.uint8)), len(payload), chunks, fmt_id, g
    )
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(dec), payload)
    assert frame_texture_chunk_count(frame) == chunks


def test_device_frame_whole_frame_fallback(rng):
    # Pure random payload: nothing compresses -> stored uncompressed (0xA),
    # identical to the host serializer's output bytes.
    g = 8
    payload = rng.integers(0, 256, 1024 * g, dtype=np.uint8)
    frame_buf, flen = encode_frame_device(jnp.asarray(payload), 16, 0xB, g)
    frame = np.asarray(frame_buf)[: int(flen)].tobytes()
    plan = parse_frame(frame)
    assert plan.textures[0].stored_compressor == 0xA
    assert _decode_texture_python(frame, 0) == payload.tobytes()
    # Device decode handles the raw layout too.
    dec, ok = decode_frame_device(
        jnp.asarray(np.frombuffer(frame, np.uint8)), len(payload), 16, 0xB, g
    )
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(dec), payload)


def test_device_frame_container_bytes_match_host(rng):
    """Around identical snappy streams, device container bytes == host

    serializer bytes (and so == reference encoder bytes)."""
    g = 16
    chunks = 8
    payload = mixed_payload(rng, 1024 * g, g)
    S = len(payload) // chunks
    comp, clen = snappy_encode_chunks(jnp.asarray(payload.reshape(chunks, S)), S, g)
    comp, clen = np.asarray(comp), np.asarray(clen)
    streams = [comp[c, : clen[c]].tobytes() for c in range(chunks)]
    host_frame = serialize_texture(
        payload.tobytes(), TextureFormat.RGBA_DXT5, Compressor.SNAPPY, chunks,
        precompressed=streams,
    )
    dev_buf, flen = encode_frame_device(jnp.asarray(payload), chunks, 0xE, g)
    dev_frame = np.asarray(dev_buf)[: int(flen)].tobytes()
    assert dev_frame == host_frame


def test_device_decode_foreign_compressed_exact_or_flagged(rng):
    # Foreign-encoded (native hash-matcher) frames through the device
    # decoder: with the r5 LZ walker, streams whose elements stay inside
    # the device profile (copy-2, offsets >= 8) decode BIT-EXACTLY; any
    # out-of-profile element flags not-ok (host fallback). The invariant
    # under test: the device decoder never returns ok with wrong bytes.
    # (The r4 structured decoder rejected all of these; HAP_TPU_DEVICE_LZ=0
    # restores that behavior.)
    from hap_tpu.snappy.device import _UNIT

    g = 16
    payload = mixed_payload(rng, 2 * _UNIT * 8, g)
    f_native = native.encode([payload.tobytes()], [TextureFormat.RGBA_DXT5], [1], [8])
    if parse_frame(f_native).textures[0].stored_compressor == 0xC:
        dec, ok = decode_frame_device(
            jnp.asarray(np.frombuffer(f_native, np.uint8)), len(payload), 8, 0xE, g
        )
        if bool(np.asarray(ok)):
            np.testing.assert_array_equal(np.asarray(dec), payload)


