"""Numerical-parity tests for the log-mel pipeline.

Oracle: an independent torch implementation of the reference's pipeline
(src/meldataset.py:56-85) — torch.stft + torchaudio-convention HTK mel
filterbank — written here from the published torchaudio formulas
(torchaudio itself is not installed in this environment).
"""

import math

import numpy as np
import pytest

from tests.conftest import requires_torch

import jax.numpy as jnp

from hifigan_tpu.audio import mel_spectrogram
from hifigan_tpu.audio.mel import mel_filterbank
from hifigan_tpu.audio.stft import hann_window, stft_power


def _torch_melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate, mel_scale="htk"):
    """Oracle filterbank, torchaudio.functional.melscale_fbanks semantics."""
    import torch

    def hz_to_mel(f):
        if mel_scale == "htk":
            return 2595.0 * math.log10(1.0 + f / 700.0)
        f_sp = 200.0 / 3
        mels = f / f_sp
        if f >= 1000.0:
            mels = (1000.0 / f_sp) + math.log(f / 1000.0) / (math.log(6.4) / 27.0)
        return mels

    def mel_to_hz(m):
        if mel_scale == "htk":
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        f_sp = 200.0 / 3
        min_log_mel = 1000.0 / f_sp
        if m >= min_log_mel:
            return 1000.0 * math.exp(math.log(6.4) / 27.0 * (m - min_log_mel))
        return f_sp * m

    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_pts = torch.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = torch.tensor([mel_to_hz(float(m)) for m in m_pts])
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    return torch.max(torch.zeros(1), torch.min(down_slopes, up_slopes))


def _torch_mel_oracle(y, n_fft, num_mels, sr, hop, win, fmin, fmax, power=2.0):
    """The fork's mel pipeline re-derived with torch.stft (independent oracle)."""
    import torch

    y = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(win, periodic=True)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win, window=window,
        center=False, onesided=True, return_complex=True,
    )
    spec = spec.abs() ** power  # (B, bins, frames)
    fb = _torch_melscale_fbanks(n_fft // 2 + 1, fmin, fmax, num_mels, sr)
    mel = torch.matmul(fb.T, spec)  # (B, mels, frames)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


@requires_torch
@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_mel_matches_torch_oracle(rng, method):
    sr, n_fft, hop, win, n_mels = 22050, 1024, 256, 1024, 80
    y = (rng.standard_normal((2, 8192)) * 0.3).clip(-1, 1).astype(np.float32)
    ref = _torch_mel_oracle(y, n_fft, n_mels, sr, hop, win, 0.0, 8000.0)
    got = np.asarray(
        mel_spectrogram(jnp.asarray(y), n_fft, n_mels, sr, hop, win, 0.0, 8000.0, method=method)
    )
    assert got.shape == ref.shape == (2, 80, 32)
    # log-domain absolute tolerance; BASELINE requires mel-L1 within 1e-3.
    assert np.mean(np.abs(got - ref)) < 1e-4
    np.testing.assert_allclose(got, ref, atol=5e-3)


@requires_torch
def test_mel_fmax_none_and_win_lt_nfft(rng):
    sr, n_fft, hop, win, n_mels = 16000, 1024, 256, 512, 80
    y = (rng.standard_normal((1, 4096)) * 0.2).astype(np.float32)
    # fmax=None on our side -> sr/2, matching torchaudio's default f_max.
    ref = _torch_mel_oracle(y, n_fft, n_mels, sr, hop, win, 0.0, sr / 2)
    got = np.asarray(
        mel_spectrogram(jnp.asarray(y), n_fft, n_mels, sr, hop, win, 0.0, None)
    )
    assert np.mean(np.abs(got - ref)) < 1e-4


def test_mel_filterbank_slaney_properties():
    """Slaney-normed filterbank sanity (librosa convention): triangle areas
    equalised by 2/(f_hi - f_lo); every interior bin is covered."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0, mel_scale="slaney", norm="slaney")
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # All mel channels have support.
    assert (fb.sum(axis=0) > 0).all()


def test_stft_power_frame_count():
    y = jnp.zeros((1, 1024 + 256 * 9))
    s = stft_power(y, 1024, 256, 1024)
    assert s.shape == (1, 10, 513)


def test_hann_window_periodic():
    w = hann_window(16)
    assert w[0] == 0.0
    assert abs(w[8] - 1.0) < 1e-7  # periodic window peaks at N/2


def test_mel_filterbank_slaney_matches_independent_construction():
    """Cross-check the Slaney filterbank against a from-scratch loop
    implementation of librosa's published algorithm (independent of the
    vectorised slope construction in audio/mel.py)."""
    import math

    sr, n_fft, n_mels, fmin, fmax = 22050, 512, 20, 0.0, 8000.0

    def hz_to_mel(f):
        if f >= 1000.0:
            return 15.0 + math.log(f / 1000.0) / (math.log(6.4) / 27.0)
        return f / (200.0 / 3)

    def mel_to_hz(m):
        if m >= 15.0:
            return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - 15.0))
        return m * (200.0 / 3)

    mel_pts = [
        mel_to_hz(hz_to_mel(fmin) + (hz_to_mel(fmax) - hz_to_mel(fmin)) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]
    n_freqs = n_fft // 2 + 1
    freqs = [sr / 2 * i / (n_freqs - 1) for i in range(n_freqs)]
    expected = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        enorm = 2.0 / (hi - lo)
        for i, f in enumerate(freqs):
            if lo < f < hi:
                w = (f - lo) / (ctr - lo) if f <= ctr else (hi - f) / (hi - ctr)
                expected[i, m] = max(0.0, w) * enorm

    got = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, mel_scale="slaney", norm="slaney")
    np.testing.assert_allclose(got, expected, atol=1e-6)
