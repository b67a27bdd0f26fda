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
