"""16K foreign-frame decode through the GOP session (real HapEncode bytes).

16K frames carry ~132 MB payloads in 1024 chunks with 8-byte headers —
the scale story of the reference's 16K test pack (README.md:25). One
frame per dispatch (a multi-frame fused GOP would exceed HBM at this
size; dispatch overhead is negligible at ~quarter-second decodes).
Run alone (one TPU python process at a time — CLAUDE.md).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu import oracle
    from hap_tpu.constants import TextureFormat
    from hap_tpu.pipeline.any_frame import ForeignGopSession
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import unpack_u32_to_u8
    from tools.bench_content import make_frame

    H, W, CHUNKS, N = 8640, 15360, 1024, 2
    frames = []
    for k in range(N):
        img = make_frame("natural", k, H, W)
        words = _encode_blocks("hap_q", jnp.asarray(img))
        pay = np.asarray(
            unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)).tobytes()
        frames.append(oracle.encode(
            [pay], [int(TextureFormat.YCoCg_DXT5)], [1], [CHUNKS]))
        print(f"frame {k}: {len(frames[-1])/1e6:.1f} MB", flush=True)
    sess = ForeignGopSession(H, W)
    t0 = time.time()
    staged = [sess.stage(f) for f in frames]
    print(f"staged in {time.time()-t0:.1f}s", flush=True)
    pix, ok = sess.decode_gop(staged[:1])
    _ = float(jnp.sum(pix.astype(jnp.int32)) + jnp.sum(ok))
    assert np.asarray(ok).all()
    ts = []
    for _ in range(4):
        t0 = time.time()
        for k in range(N):
            pix, ok = sess.decode_gop([staged[k]])
            _ = float(jnp.sum(pix.astype(jnp.int32)) + jnp.sum(ok))
        ts.append(time.time() - t0)
    dt = sorted(ts)[2] / N
    print(f"16K foreign decode: {dt*1000:.0f} ms/frame -> "
          f"{H*W/dt/1e6:.1f} Mpix/s "
          f"({[f'{t*1000:.0f}' for t in sorted(ts)]})")

    # Streamed serving: decode-only residency (~1.1 GB/frame: rebuilt
    # rows + payload + pixels) fits TWO frames, unlike the roundtrip —
    # so hide the ~28 ms sync floor by keeping one dispatch in flight
    # and syncing frame k while k+1 is enqueued.
    M = 8
    t0 = time.time()
    pend = None
    for i in range(M):
        pix, ok = sess.decode_gop([staged[i % N]])
        nxt = jnp.sum(pix.astype(jnp.int32)) + jnp.sum(ok)
        if pend is not None:
            float(pend)
        pend = nxt
    float(pend)
    sdt = (time.time() - t0) / M
    print(f"16K foreign streamed (double-buffered): {sdt*1000:.0f} ms/frame "
          f"-> {H*W/sdt/1e6:.1f} Mpix/s over {M} frames", flush=True)
    from hap_tpu.pipeline.codecs import decode_frame

    want = decode_frame(frames[0], H, W)
    pix0, ok0 = sess.decode_gop([staged[0]])
    assert np.asarray(ok0).all()
    assert np.array_equal(np.asarray(pix0)[0], want)
    print("bit-exact vs host decode")


if __name__ == "__main__":
    main()
