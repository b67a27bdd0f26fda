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
