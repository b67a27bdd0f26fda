// Native host-side DSP for the data pipeline.
//
// The reference's augmentation pipeline runs on native C libraries (sox
// effects / codecs via torchaudio, reference augmentation_methods.py:10-14);
// this module is the TPU framework's equivalent native layer: the recurrence
// filters that can't vectorise in numpy (IIR one-poles), mu-law round trips,
// and FIR convolution, exposed over a minimal C ABI consumed via ctypes
// (hifigan_tpu/data/native.py) with a pure-numpy fallback when the shared
// library hasn't been built.
//
// Build: make -C native    (produces native/libhost_dsp.so)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// sox `lowpass -1 f`: y[n] = b0 * x[n] - a1 * y[n-1], a1 = -exp(-w0), b0 = 1 + a1
void one_pole_lowpass(const float* x, float* y, int64_t n, float freq, float sr) {
    const double w0 = 2.0 * M_PI * freq / sr;
    const double a1 = -std::exp(-w0);
    const double b0 = 1.0 + a1;
    double prev = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        prev = b0 * (double)x[i] - a1 * prev;
        y[i] = (float)prev;
    }
}

// sox `highpass -1 f`: p = exp(-w0); b0 = (1+p)/2, b1 = -(1+p)/2, a1 = -p
void one_pole_highpass(const float* x, float* y, int64_t n, float freq, float sr) {
    const double w0 = 2.0 * M_PI * freq / sr;
    const double p = std::exp(-w0);
    const double b0 = (1.0 + p) / 2.0;
    double prev_x = 0.0, prev_y = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        prev_y = b0 * (double)x[i] - b0 * prev_x + p * prev_y;
        prev_x = (double)x[i];
        y[i] = (float)prev_y;
    }
}

// 8-bit mu-law encode/decode round trip (the 'wav' ULAW codec path)
void mu_law_roundtrip(const float* x, float* y, int64_t n, float mu) {
    const double log1p_mu = std::log1p((double)mu);
    for (int64_t i = 0; i < n; ++i) {
        double v = x[i];
        v = v < -1.0 ? -1.0 : (v > 1.0 ? 1.0 : v);
        const double sign = v < 0 ? -1.0 : 1.0;
        double enc = sign * std::log1p(mu * std::fabs(v)) / log1p_mu;
        double q = std::round((enc + 1.0) / 2.0 * mu) / mu * 2.0 - 1.0;
        const double qsign = q < 0 ? -1.0 : 1.0;
        y[i] = (float)(qsign * std::expm1(std::fabs(q) * log1p_mu) / mu);
    }
}

// direct-form FIR convolution, 'same'-aligned with a given left offset:
// y[i] = sum_j x[i + j - offset] * h[j]  (zero outside bounds)
void fir_apply(const float* x, int64_t n, const float* h, int64_t k,
               int64_t offset, float* y) {
    for (int64_t i = 0; i < n; ++i) {
        double acc = 0.0;
        const int64_t j_lo = offset - i > 0 ? offset - i : 0;
        const int64_t j_hi_excl = (n - i + offset) < k ? (n - i + offset) : k;
        for (int64_t j = j_lo; j < j_hi_excl; ++j) {
            acc += (double)x[i + j - offset] * (double)h[j];
        }
        y[i] = (float)acc;
    }
}

// batched peak-normalise: scale each row of (rows, n) so max |x| == peak
void peak_normalize_rows(float* x, int64_t rows, int64_t n, float peak) {
    for (int64_t r = 0; r < rows; ++r) {
        float* row = x + r * n;
        float m = 0.0f;
        for (int64_t i = 0; i < n; ++i) {
            const float a = std::fabs(row[i]);
            if (a > m) m = a;
        }
        if (m > 1e-10f) {
            const float s = peak / m;
            for (int64_t i = 0; i < n; ++i) row[i] *= s;
        }
    }
}

}  // extern "C"
