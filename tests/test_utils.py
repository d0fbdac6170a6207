"""Config, tracing and quality utilities."""

import numpy as np
import pytest

import jax.numpy as jnp

from hap_tpu.utils import EncodeConfig, device_timer, psnr, relative_rmse


def test_encode_config_legalization():
    cfg = EncodeConfig(codec="hap", chunk_count=7)
    # 1920x1080 BC1: 480*270 = 129600 blocks; legalized count divides it.
    cc = cfg.legalized_chunk_count(1080, 1920)
    assert cc <= 7 and 129600 % cc == 0


def test_encode_config_validation():
    with pytest.raises(ValueError):
        EncodeConfig(codec="nope")
    with pytest.raises(ValueError):
        EncodeConfig(chunk_count=0)
    with pytest.raises(ValueError):
        EncodeConfig(byte_plane="gpu")


def test_encode_config_multi_texture():
    cfg = EncodeConfig(codec="hap_q_alpha", chunk_count=16)
    assert len(cfg.texture_formats) == 2
    assert cfg.legalized_chunk_count(64, 64, 0) >= 1
    assert cfg.legalized_chunk_count(64, 64, 1) >= 1


def test_device_timer_forces_execution():
    calls = []

    def fn(x):
        return x * 2.0

    dt, checksum = device_timer(fn, jnp.ones((64, 64)), iters=3)
    assert dt >= 0
    assert checksum == 2.0 * 64 * 64


def test_quality_metrics():
    a = np.zeros((8, 8))
    assert psnr(a, a) == float("inf")
    b = a + 1
    assert 45 < psnr(a, b) < 50  # 20*log10(255) ~ 48.13
    assert relative_rmse(np.full(4, 1.1), np.ones(4)) == pytest.approx(0.1, rel=1e-6)
