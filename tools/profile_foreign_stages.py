"""Stage-by-stage timing of the table-route foreign decode (graphics 4K).

Separates: host op-table compile / ops+lit upload / executor kernel /
stitch / BCn texture decode — so optimization effort goes where the
milliseconds are. Run alone (one TPU python process — CLAUDE.md).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

H, W = 2160, 3840
CHUNKS = 64
ITERS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, sync, label):
    fn(); sync()
    ts = []
    for _ in range(ITERS):
        t0 = time.time()
        fn()
        sync()
        ts.append(time.time() - t0)
    dt = sorted(ts)[ITERS // 2]
    log(f"{label:28s}: {dt*1000:7.2f} ms  (times {[f'{t*1000:.0f}' for t in sorted(ts)]})")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu import oracle
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY, TextureFormat
    from hap_tpu.container.parse import parse_frame
    from hap_tpu.pipeline.any_frame import _stitch_payload
    from hap_tpu.pipeline.codecs import _DECODERS
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import pack_u8_to_u32, unpack_u32_to_u8
    from hap_tpu.snappy.optable import pack_tables
    from hap_tpu.snappy.pallas_exec import execute_op_tables
    from tools.bench_content import make_frame

    dev = jax.devices()[0]
    log(f"device: {dev}")
    cls = os.environ.get("PROFILE_CLS", "graphics")
    img = make_frame(cls, 0, H, W)
    words = _encode_blocks("hap_q", jnp.asarray(img))
    payload = np.asarray(unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)).tobytes()
    frame = oracle.encode([payload], [int(TextureFormat.YCoCg_DXT5)], [1], [CHUNKS])
    plan = parse_frame(frame)
    tex = plan.textures[0]
    frame_np = np.frombuffer(frame, np.uint8)
    csizes = np.asarray(tex.chunk_compressed_sizes, np.int64)
    usizes = np.asarray(tex.chunk_uncompressed_sizes, np.int64)
    is_comp = np.asarray(tex.chunk_compressors) == CHUNK_COMPRESSOR_SNAPPY
    S_max = int(usizes.max())
    log(f"{cls}: {int(is_comp.sum())}/{CHUNKS} snappy chunks, S_max {S_max}")

    streams = []
    exp = []
    for i in range(CHUNKS):
        if is_comp[i]:
            o = int(tex.chunk_compressed_offsets[i])
            streams.append(frame_np[o: o + int(csizes[i])].tobytes())
            exp.append(int(usizes[i]))
        else:
            streams.append(b"")
            exp.append(0)

    # (a) host compile
    t0 = time.time()
    for _ in range(ITERS):
        p = pack_tables(streams, exp)
    log(f"host op-table compile        : {(time.time()-t0)/ITERS*1000:7.2f} ms "
        f"({p.ops.shape[0]}x{p.ops.shape[1]} pieces, lit {p.lit.shape[1]} B -> "
        f"{(p.ops.nbytes + p.lit.nbytes)/1e6:.2f} MB tables)")

    # (b) upload
    def upload():
        global _bufs
        _bufs = (jax.device_put(p.ops, dev), jax.device_put(p.n_ops, dev),
                 jax.device_put(p.lit, dev), jax.device_put(p.out_len, dev))
        return _bufs

    timed(lambda: upload(), lambda: jax.block_until_ready(_bufs), "ops+lit upload")
    ops_d, nops_d, lit_d, olen_d = _bufs
    frame_dev = jax.device_put(jnp.asarray(frame_np), dev)

    # (c) executor kernel
    import functools
    fn_t = jax.jit(functools.partial(execute_op_tables, S_max=S_max))
    out_holder = {}

    def kern():
        out_holder["dec"] = fn_t(ops_d, nops_d, lit_d, olen_d)

    timed(kern, lambda: float(jnp.sum(out_holder["dec"].astype(jnp.int32))), "executor kernel")
    dec = out_holder["dec"]

    # (d) stitch
    need = int(np.asarray(tex.chunk_compressed_offsets).max()) + S_max
    fpad = jnp.pad(frame_dev, (0, max(0, need - frame_dev.shape[0])))
    co = jnp.asarray(np.asarray(tex.chunk_compressed_offsets), jnp.int32)
    uo = jnp.asarray(np.asarray(tex.chunk_uncompressed_offsets), jnp.int32)
    ic = jnp.asarray(is_comp)
    hold = {}

    def stitch():
        hold["pay"] = _stitch_payload(fpad, dec, co, uo, ic, S_max,
                                      int(tex.decoded_bytes))

    timed(stitch, lambda: float(jnp.sum(hold["pay"].astype(jnp.int32))), "stitch")
    pay = hold["pay"]

    # (e) BCn decode (+ u8->u32 pack)
    decfn, wpb = _DECODERS[TextureFormat.YCoCg_DXT5]

    @jax.jit
    def bcn(payload):
        w = pack_u8_to_u32(payload.reshape(-1, 4)).reshape(-1, wpb)
        return decfn(w, H, W)

    hold2 = {}

    def tex_dec():
        hold2["img"] = bcn(pay)

    timed(tex_dec, lambda: float(jnp.sum(hold2["img"].astype(jnp.int32))), "BCn decode (+pack)")


if __name__ == "__main__":
    main()
