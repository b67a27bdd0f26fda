"""Native C++ host-DSP library vs the numpy implementations."""

import numpy as np
import pytest

from hifigan_tpu.data import native
from hifigan_tpu.data.augmentation import (
    mu_law_roundtrip,
    sox_one_pole_highpass,
    sox_one_pole_lowpass,
)

requires_native = pytest.mark.skipif(
    not native.available(), reason="native/libhost_dsp.so not built"
)


@requires_native
def test_one_pole_filters_match_numpy(rng):
    x = (0.3 * rng.standard_normal(4096)).astype(np.float32)
    np.testing.assert_allclose(
        native.one_pole_lowpass(x, 400.0, 16000), sox_one_pole_lowpass(x, 400.0, 16000),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        native.one_pole_highpass(x, 1000.0, 16000), sox_one_pole_highpass(x, 1000.0, 16000),
        atol=1e-5,
    )


@requires_native
def test_mu_law_matches_numpy(rng):
    x = (0.5 * rng.standard_normal(2048)).astype(np.float32)
    np.testing.assert_allclose(native.mu_law_roundtrip(x), mu_law_roundtrip(x), atol=1e-6)


@requires_native
def test_fir_apply_matches_scipy(rng):
    from scipy import signal

    x = rng.standard_normal(512).astype(np.float32)
    h = rng.standard_normal(33).astype(np.float32)
    offset = 16
    got = native.fir_apply(x, h, offset)
    full = signal.correlate(x, h, mode="full")
    ref = full[len(h) - 1 - offset : len(h) - 1 - offset + len(x)]
    np.testing.assert_allclose(got, ref, atol=1e-4)


@requires_native
def test_peak_normalize_rows(rng):
    x = rng.standard_normal((3, 100)).astype(np.float32) * [[0.1], [2.0], [0.5]]
    y = native.peak_normalize_rows(x, peak=0.95)
    np.testing.assert_allclose(np.abs(y).max(axis=1), 0.95, atol=1e-5)


@requires_native
def test_gsm0610_roundtrip_artifacts():
    """Known-vector artifact checks for the GSM 06.10 codec
    (reference augmentation_methods.py:72-95 'gsm' path): codec-class SNR on
    a speech-like harmonic signal, determinism, bounded output, and the
    13-sample/40 RPE decimation noise floor (output != input)."""
    assert native.gsm0610_available()
    sr = 8000
    t = np.arange(sr * 2) / sr
    sig = sum(np.sin(2 * np.pi * 120.0 * k * t + 0.7 * k) / (1 + 0.3 * k)
              for k in range(1, 12))
    sig = (0.3 * sig / np.abs(sig).max()).astype(np.float32)
    out = native.gsm0610_roundtrip_8k(sig)
    assert out.shape == sig.shape and np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0
    # deterministic
    np.testing.assert_array_equal(out, native.gsm0610_roundtrip_8k(sig))
    # codec-class SNR after filter warmup: lossy (below 35 dB) but intelligible
    # (above 8 dB)
    a, b = sig[320:], out[320:]
    snr = 10 * np.log10((a**2).mean() / ((a - b) ** 2).mean())
    assert 8.0 < snr < 35.0, snr
    # silence stays silence (offset compensation + APCM zero code)
    z = native.gsm0610_roundtrip_8k(np.zeros(1600, np.float32))
    assert np.abs(z).max() < 1e-3


@requires_native
def test_gsm_augmentor_resamples_and_band_limits():
    """At 16 kHz input, the GSM path must kill content above the codec's
    4 kHz Nyquist (real-resample artifact the old band-limit simulation
    couldn't produce exactly)."""
    from hifigan_tpu.data.augmentation import gsm_roundtrip

    sr = 16000
    t = np.arange(sr) / sr
    hi = (0.3 * np.sin(2 * np.pi * 6000.0 * t)).astype(np.float32)  # > 4 kHz
    out = gsm_roundtrip(hi, sr)
    assert out.shape == hi.shape
    spec_in = np.abs(np.fft.rfft(hi))
    spec_out = np.abs(np.fft.rfft(out))
    band = np.fft.rfftfreq(sr, 1 / sr) > 4500
    assert spec_out[band].max() < 0.01 * spec_in[band].max()


def test_mdct_codec_roundtrip_artifacts():
    """MDCT transform codec (mp3/vorbis stand-in): perfect reconstruction at
    high bits, codec-class SNR + band kill at codec settings."""
    from hifigan_tpu.data.augmentation import mdct_codec_roundtrip

    sr = 16000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    lossless = mdct_codec_roundtrip(x, sr, mant_bits=16, cutoff_frac=1.0)
    assert np.abs(lossless[512:-512] - x[512:-512]).max() < 1e-3
    y = mdct_codec_roundtrip(x, sr)
    assert y.shape == x.shape
    a, b = x[1024:-1024], y[1024:-1024]
    snr = 10 * np.log10((a**2).mean() / ((a - b) ** 2).mean())
    assert 10.0 < snr < 60.0, snr  # lossy but far from destroyed
    f = np.fft.rfftfreq(len(b), 1 / sr)
    spec = np.abs(np.fft.rfft(b))
    assert spec[f > 0.45 * sr / 2].max() < 0.01 * spec.max()  # band kill


def test_gsm0610_matches_libgsm_oracle():
    """Cross-validate the from-spec float GSM 06.10 adaptation
    (native/gsm0610.cpp) against the CANONICAL libgsm fixed-point
    implementation (codecs.gsm_roundtrip_libgsm_8k): the float adaptation
    must track the oracle closely (corr > 0.94 — the residual is the
    fixed-point quantisation the float form smooths over), and the
    CodecAugmentor must prefer the canonical library when present."""
    import pytest

    from hifigan_tpu.data import codecs, native

    if not codecs.libgsm_available():
        pytest.skip("libgsm not present")

    rng = np.random.default_rng(0)
    n = 160 * 25  # whole GSM frames
    x = (0.4 * np.sin(2 * np.pi * 300 * np.arange(n) / 8000)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)

    oracle = codecs.gsm_roundtrip_libgsm_8k(x)
    assert oracle.shape == x.shape and np.all(np.isfinite(oracle))
    # the codec transforms but preserves the signal (GSM SNR ~8-12 dB here)
    num = float(np.dot(oracle, x))
    den = float(np.linalg.norm(oracle) * np.linalg.norm(x)) + 1e-12
    assert num / den > 0.8

    if native.gsm0610_available():
        ours = native.gsm0610_roundtrip_8k(x)
        num = float(np.dot(ours, oracle))
        den = float(np.linalg.norm(ours) * np.linalg.norm(oracle)) + 1e-12
        assert num / den > 0.94, f"float adaptation diverged: corr {num/den}"
