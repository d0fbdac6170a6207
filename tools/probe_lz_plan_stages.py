"""Decompose plan_lz cost on silicon: masks / levels / selection / scans /
ext+sizing / tables. Each stage timed as its own jitted function over the
same (64, S) 4K-chunk batch (device_timer; numbers carry the ~29 ms sync
floor — compare deltas)."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu.snappy import device_lz as dl
    from hap_tpu.utils.tracing import device_timer
    from tools.bench_content import make_frame
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import unpack_u32_to_u8

    H, W, C = 2160, 3840, 64
    img = make_frame("graphics", 0, H, W)
    words = _encode_blocks("hap_q", jnp.asarray(img))
    payload = np.asarray(unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1))
    S = len(payload) // C
    data = jnp.asarray(payload.reshape(C, S))
    cands = dl.candidate_distances(S, 4 * W, 16)
    N = S // 4
    NSEG = -(-N // dl.SEG_WORDS)
    Np = NSEG * dl.SEG_WORDS
    print(f"S={S} N={N} cands={len(cands)}")

    def words_of(d):
        b4 = d.reshape(C, N, 4).astype(jnp.int32)
        w = (b4[:, :, 0] | (b4[:, :, 1] << 8) | (b4[:, :, 2] << 16)
             | (b4[:, :, 3] << 24))
        return jnp.pad(w, ((0, 0), (0, Np - N)))

    def masks(d):
        w = words_of(d)
        M = jnp.zeros((C, Np), jnp.int32)
        for ci, db in enumerate(cands):
            c = db // 4
            eq = jnp.pad(w[:, c:] == w[:, :-c], ((0, 0), (c, 0)))
            M = M | (eq.astype(jnp.int32) << ci)
        return M

    def levels_sel(d):
        M = masks(d)
        levels = [M]
        k = 1
        while k < 256:
            levels.append(levels[-1] & dl._shl(levels[-1], k))
            k *= 2
        bits = levels[0]
        l = 2
        for P in levels[1:]:
            R = dl._or_spread(P, l)
            bits = jnp.where(R != 0, R, bits)
            l *= 2
        low = bits & (-bits)
        w = words_of(d)
        dw = jnp.zeros((C, Np), jnp.int32)
        selw = jnp.zeros((C, Np), jnp.int32)
        for ci, db in enumerate(cands):
            c = db // 4
            hit = (low >> ci) & 1
            dw = dw + hit * c
            selw = selw + hit * dl._shl(w, c)
        return jnp.where(bits != 0, dw, 0) + (selw & 1)

    def scan_probe(d):
        w = words_of(d)
        x = w & 0xFF
        a = jax.lax.cummax(x, axis=1)
        b = jnp.flip(jax.lax.cummin(jnp.flip(x, axis=1), axis=1), axis=1)
        c2 = jnp.cumsum(x, axis=1)
        return a[:, -1] + b[:, 0] + c2[:, -1]

    def full_plan(d):
        p = dl.plan_lz(d, S, 16, 4 * W)
        return p.comp_len

    # amplify inside ONE dispatch: K dependent evaluations (the input is
    # perturbed by the running scalar so XLA cannot CSE them); the sync
    # floor amortizes over K.
    K = 8

    def amp(fn):
        def run(d):
            def body(i, acc):
                r = fn(jnp.bitwise_xor(d, (acc & 1).astype(jnp.uint8)))
                return acc + jnp.sum(r).astype(jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    for name, fn in [("words only", lambda d: words_of(d).sum()),
                     ("masks (28 cands)", lambda d: masks(d).sum()),
                     ("levels+selection", lambda d: levels_sel(d).sum()),
                     ("3 scans (cummax/cummin/cumsum)", scan_probe),
                     ("full plan_lz", full_plan)]:
        f = jax.jit(amp(fn))
        dt, _ = device_timer(f, data, iters=4)
        print(f"{name:34s} {dt*1000/K:8.2f} ms/eval  ({dt*1000:7.1f} total)")


if __name__ == "__main__":
    main()
