"""Fused whole-plane Pallas kernels (kernels/fused_hapq.py).

These are the measured-alternative route to the XLA planar chain (kept
for environments where Mosaic codegen beats XLA fusions; on the current
v5e toolchain it does NOT — see the module docstring). Interpret-mode
parity: the kernels inline the same *_core jaxprs, so encode words and
decode planes must match the XLA path exactly here (same backend, same
op order)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_fused_encode_matches_xla_core(rng, monkeypatch):
    import hap_tpu.kernels.fused_hapq as fh
    from hap_tpu.kernels.bc1 import bc1_encode_planes_core
    from hap_tpu.kernels.bc4 import bc4_encode_planes_core
    from hap_tpu.kernels.ycocg import rgb_to_cocgs_y_planes

    monkeypatch.setattr(fh, "_NT", 512)
    n = 700  # non-multiple of the tile: exercises padding
    planes = jnp.asarray(rng.integers(0, 256, (3, 16, n), dtype=np.uint8))

    @jax.jit
    def ref(p):
        cocgs, y = rgb_to_cocgs_y_planes(p)
        wy = bc4_encode_planes_core(y, 1)
        wc = bc1_encode_planes_core(cocgs, 2)
        return jnp.stack([wy[:, 0], wy[:, 1], wc[:, 0], wc[:, 1]])

    got = np.asarray(fh.hapq_encode_fused(planes))
    want = np.asarray(ref(planes))
    assert (got == want).mean() > 0.999  # f32 tie-flips only


def test_fused_decode_bit_exact(rng, monkeypatch):
    import hap_tpu.kernels.fused_hapq as fh
    from hap_tpu.kernels.bc1 import bc1_decode_planes
    from hap_tpu.kernels.bc4 import bc4_decode_planes
    from hap_tpu.kernels.ycocg import cocgs_y_to_rgb_planes

    monkeypatch.setattr(fh, "_NT", 512)
    n = 700
    words = jnp.asarray(rng.integers(0, 2**32, (4, n), dtype=np.uint32))

    @jax.jit
    def ref(w):
        y = bc4_decode_planes(w[0], w[1])
        cocgs, _ = bc1_decode_planes(w[2], w[3], dxt1_punchthrough=False)
        return cocgs_y_to_rgb_planes(cocgs, y)

    got = np.asarray(fh.hapq_decode_fused(words))
    want = np.asarray(ref(words))
    np.testing.assert_array_equal(got, want)


def test_mxu_interleave_exact(rng):
    from hap_tpu.kernels.layout import (
        deinterleave_words_mxu,
        interleave_words_mxu,
    )

    for k in (2, 4):
        for n in (128, 700):
            ws = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
                  for _ in range(k)]
            flat = np.asarray(interleave_words_mxu(ws))
            want = np.stack([np.asarray(w) for w in ws], axis=1).reshape(-1)
            np.testing.assert_array_equal(flat, want)
            back = deinterleave_words_mxu(jnp.asarray(want), k)
            for j in range(k):
                np.testing.assert_array_equal(
                    np.asarray(back[j]), np.asarray(ws[j]))
