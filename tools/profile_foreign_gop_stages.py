"""Decompose foreign-GOP serving (VERDICT r4 item 2): split the
~16-18 ms/frame resident-GOP decode into rebuild / executor kernel /
payload fold / BCn decode / dispatch overhead.

Replicates decode_gop's internal staging (same arrays, same statics) and
times each stage as its own jitted function over the staged graphics GOP
(the piece-count-heavy class). Numbers carry the ~29 ms tunnel sync floor
once per dispatch; stages are also amplified K-fold inside one dispatch so
the floor amortizes (report /K).

Run alone: python tools/profile_foreign_gop_stages.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 2160, 3840
CHUNKS = 64
GOP = 8


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu import oracle
    from hap_tpu.constants import TextureFormat
    from hap_tpu.kernels.layout import unpack_u32_to_u8
    from hap_tpu.pipeline.any_frame import ForeignGopSession, _ceil
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.utils.tracing import device_timer
    from tools.bench_content import make_frame

    frames = []
    for k in range(GOP):
        img = make_frame("graphics", k, H, W)
        words = _encode_blocks("hap_q", jnp.asarray(img))
        pay = np.asarray(unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
                         ).tobytes()
        frames.append(oracle.encode(
            [pay], [int(TextureFormat.YCoCg_DXT5)], [1], [CHUNKS]))
    sess = ForeignGopSession(H, W)
    staged = [sess.stage(f) for f in frames]
    log = print

    # replicate decode_gop's per-texture data prep (texture 0)
    t0 = staged[0].per_texture[0]
    S_max, total = t0[7], t0[8]
    C = t0[4].shape[0]
    nmax_g = _ceil(max(s.per_texture[0][12] for s in staged), 512)
    lmax_g = _ceil(max(s.per_texture[0][13] for s in staged), 8192)
    ops_l = [s.per_texture[0][0] for s in staged]
    n_l = [s.per_texture[0][1] for s in staged]
    lit_l = [s.per_texture[0][2] for s in staged]
    ol_l = [s.per_texture[0][3] for s in staged]
    co_l = [s.per_texture[0][4] for s in staged]
    uo_l = [s.per_texture[0][5] for s in staged]
    ic_l = [s.per_texture[0][6] for s in staged]
    oo_l = [s.per_texture[0][10] for s in staged]
    lo_l = [s.per_texture[0][11] for s in staged]
    n_pieces = int(sum(int(np.asarray(x).sum()) for x in n_l))
    log(f"graphics GOP: {GOP} frames, {n_pieces} executor pieces total "
        f"({n_pieces // GOP}/frame), S_max {S_max}, nmax_g {nmax_g}, "
        f"lmax_g {lmax_g}")

    def rebuild(packed_l, off_l, width, twod):
        pmax = max(x.shape[0] for x in packed_l)
        pad2 = ((0, 0),) if twod else ()
        pk = jnp.stack([
            jnp.pad(x, ((0, pmax + width - x.shape[0]),) + pad2)
            for x in packed_l])
        offs = jnp.stack(off_l)

        def per_frame(args):
            p, off = args

            def body(_, o):
                idx = (o,) + ((0,) if twod else ())
                sz = (width,) + ((2,) if twod else ())
                return None, jax.lax.dynamic_slice(p, idx, sz)

            _, rows = jax.lax.scan(body, None, off)
            return rows

        rows = jax.lax.map(per_frame, (pk, offs))
        return rows.reshape((-1,) + rows.shape[2:])

    pk_ops = jnp.stack([
        jnp.pad(x, ((0, max(y.shape[0] for y in ops_l) + nmax_g
                     - x.shape[0]), (0, 0))) for x in ops_l])
    n_ops = jnp.concatenate(n_l)
    out_len = jnp.concatenate(ol_l)

    # stage 1: dense rebuild (ops + lit DMAs)
    @jax.jit
    def f_rebuild(_x):
        ops = rebuild(ops_l, oo_l, nmax_g, True)
        lit = rebuild(lit_l, lo_l, lmax_g, False)
        return jnp.sum(ops) + jnp.sum(lit.astype(jnp.int32))

    dt, _ = device_timer(f_rebuild, jnp.zeros(1), iters=4)
    log(f"rebuild (dense ops+lit layouts): {dt*1000:7.2f} ms/GOP "
        f"({dt*1000/GOP:.2f} ms/frame)")

    ops_d = rebuild(ops_l, oo_l, nmax_g, True)
    lit_d = rebuild(lit_l, lo_l, lmax_g, False)
    ops_d = jax.block_until_ready(ops_d)
    lit_d = jax.block_until_ready(lit_d)

    # stage 2: executor kernel alone
    from hap_tpu.snappy.pallas_exec import execute_op_tables

    @jax.jit
    def f_exec(o, l):
        dec = execute_op_tables(o, n_ops, l, out_len, S_max)
        return jnp.sum(dec.astype(jnp.int32))

    dt, _ = device_timer(f_exec, ops_d, lit_d, iters=4)
    ns_piece = dt / max(n_pieces, 1) * 1e9
    log(f"executor kernel:               {dt*1000:7.2f} ms/GOP "
        f"({dt*1000/GOP:.2f} ms/frame; ~{ns_piece:.0f} ns/piece incl. "
        f"sync floor)")

    # stage 3: payload fold (uniform all-snappy graphics: pure reshape)
    @jax.jit
    def f_fold(o, l):
        dec = execute_op_tables(o, n_ops, l, out_len, S_max)
        dec = dec.reshape(GOP, C, S_max)
        return jnp.sum(dec.reshape(GOP, C * S_max)[:, :total]
                       .astype(jnp.int32))

    dt_f, _ = device_timer(f_fold, ops_d, lit_d, iters=4)
    log(f"executor + fold:               {dt_f*1000:7.2f} ms/GOP")

    # stage 4: BCn decode alone on a precomputed payload
    from hap_tpu.kernels.layout import payload_to_words
    from hap_tpu.pipeline.device_pipeline import _decode_blocks

    payload = jnp.zeros((GOP, total), jnp.uint8)

    @jax.jit
    def f_bcn(pay):
        def one(p):
            words = payload_to_words(p).reshape(-1, 4)
            return _decode_blocks("hap_q", words, H, W)

        return jnp.sum(jax.lax.map(one, pay).astype(jnp.int32))

    dt, _ = device_timer(f_bcn, payload, iters=4)
    log(f"BCn decode (hap_q planar):     {dt*1000:7.2f} ms/GOP "
        f"({dt*1000/GOP:.2f} ms/frame)")

    # stage 5: the real full fused decode_gop
    pix, ok = sess.decode_gop(staged)
    _ = float(jnp.sum(pix.astype(jnp.int32)))
    ts = []
    for _ in range(5):
        t_ = time.time()
        pix, ok = sess.decode_gop(staged)
        _ = float(jnp.sum(pix.astype(jnp.int32)))
        ts.append(time.time() - t_)
    full = sorted(ts)[2]
    log(f"full decode_gop:               {full*1000:7.2f} ms/GOP "
        f"({full*1000/GOP:.2f} ms/frame -> "
        f"{H*W*GOP/full/1e6:.0f} Mpix/s)")
    log("interpretation: per-dispatch sync floor on this tunnel is "
        "~25-29 ms — subtract once per number above; the stage split is "
        "(rebuild) + (executor) + (fold) + (BCn) vs the composed total.")


if __name__ == "__main__":
    main()
