"""Fused Pallas log-mel vs the jnp composition (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
from hifigan_tpu.ops.pallas.logmel import fused_log_mel, supports_fused_log_mel


def test_supports_gate():
    assert supports_fused_log_mel(MelConfig())
    assert not supports_fused_log_mel(MelConfig(hop_size=200))
    assert not supports_fused_log_mel(MelConfig(power=1.0))


@pytest.mark.parametrize("t", [8192, 8192 + 256 * 5])
def test_fused_log_mel_matches_jnp(t):
    cfg = MelConfig()
    y = jnp.asarray(
        (np.random.default_rng(0).standard_normal((2, t)) * 0.3).clip(-1, 1).astype(np.float32)
    )
    ref = np.asarray(log_mel_spectrogram(y, cfg))
    got = np.asarray(fused_log_mel(y, cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused_log_mel_arbitrary_length():
    """T not a hop multiple must work (fallback-free) and match jnp."""
    cfg = MelConfig()
    t = 8192 + 113
    y = jnp.asarray(
        (np.random.default_rng(1).standard_normal((1, t)) * 0.3).astype(np.float32)
    )
    ref = np.asarray(log_mel_spectrogram(y, cfg))
    got = np.asarray(fused_log_mel(y, cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused_log_mel_gradcheck():
    """Custom VJP gradients match the jnp matmul path exactly."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(MelConfig(), method="matmul")
    y = jnp.asarray(
        (np.random.default_rng(2).standard_normal((1, 4096)) * 0.3).astype(np.float32)
    )

    def loss_pallas(yy):
        return jnp.sum(jnp.sin(fused_log_mel(yy, cfg, interpret=True)))

    def loss_jnp(yy):
        return jnp.sum(jnp.sin(log_mel_spectrogram(yy, cfg)))

    g_pallas = np.asarray(jax.grad(loss_pallas)(y))
    g_jnp = np.asarray(jax.grad(loss_jnp)(y))
    np.testing.assert_allclose(g_pallas, g_jnp, atol=1e-5, rtol=1e-4)
