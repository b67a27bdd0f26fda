"""Label-aware waveform augmentors (host-side, feeding the TPU input pipeline).

Capability parity with reference
speech_distillation/augmentation/augmentation_methods.py — seven augmentors
with the same label protocol ``augment(rng, labels, cut_labels, wav, value,
disable) -> (labels, wav, value)``. The reference shells out to sox/codec C
libraries via torchaudio; neither sox nor ffmpeg exists in this image, so
the DSP is implemented natively (numpy/scipy):

- Noise: mic-brand-matched additive noise at NSR in [0.05, 0.2], circular
  padding (ref :17-48) — file-based, identical logic.
- RIR: convolution with the flipped, L2-normalised room impulse response
  truncated at its peak (ref :51-69) — scipy fftconvolve.
- Lowpass/Highpass: sox's single-pole filters (`lowpass -1 f`) implemented
  with the exact sox one-pole recurrences.
- Reverb: sox's `reverb -w` is freeverb; natively a Schroeder/freeverb-style
  comb+allpass network with freeverb's stereo-spread constants.
- Hilbert: FIR Hilbert transformer (odd length, Blackman window) like sox.
- Codec: 'wav' = 8-bit mu-law round trip (native); 'gsm' = the from-spec
  GSM 06.10 codec (native/gsm0610.cpp); 'mp3'/'vorbis' = REAL round trips
  through the system codec libraries (lame->mpg123, vorbisenc/ogg ->
  vorbis synthesis; data/codecs.py ctypes bindings — same parameters as
  the reference's apply_codec calls, ref :72-95). Each codec degrades to a
  documented stand-in only when its library is missing (the reference's
  own degrade-gracefully precedent is NoiseAugmentor's 'disabled',
  ref :32-33).
"""

from __future__ import annotations

import functools
import random as random_module
from pathlib import Path

import numpy as np
from scipy import signal

from hifigan_tpu.audio.io import load_wav


# ---------------------------------------------------------------------------
# native DSP primitives
# ---------------------------------------------------------------------------


def sox_one_pole_lowpass(wav: np.ndarray, freq: float, sr: int) -> np.ndarray:
    """sox `lowpass -1 f`: y[n] = b0 x[n] - a1 y[n-1], b0=1+a1, a1=-exp(-w0)."""
    w0 = 2.0 * np.pi * freq / sr
    a1 = -np.exp(-w0)
    b0 = 1.0 + a1
    return signal.lfilter([b0], [1.0, a1], wav).astype(np.float32)


def sox_one_pole_highpass(wav: np.ndarray, freq: float, sr: int) -> np.ndarray:
    """sox `highpass -1 f`: one-pole highpass, p=exp(-w0):
    b0=(1+p)/2, b1=-(1+p)/2, a1=-p."""
    w0 = 2.0 * np.pi * freq / sr
    p = np.exp(-w0)
    b0 = (1.0 + p) / 2.0
    return signal.lfilter([b0, -b0], [1.0, -p], wav).astype(np.float32)


def hilbert_fir(wav: np.ndarray, num_taps: int = 257) -> np.ndarray:
    """FIR Hilbert transform (odd taps, Blackman window), sox-style."""
    if num_taps % 2 == 0:
        num_taps += 1
    mid = num_taps // 2
    n = np.arange(num_taps) - mid
    h = np.zeros(num_taps)
    odd = n % 2 != 0
    h[odd] = 2.0 / (np.pi * n[odd])
    h *= np.blackman(num_taps)
    out = signal.fftconvolve(wav, h, mode="full")[mid : mid + len(wav)]
    return out.astype(np.float32)


_FREEVERB_COMBS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
_FREEVERB_ALLPASSES = (556, 441, 341, 225)


def freeverb(wav: np.ndarray, sr: int, wet_only: bool = True,
             room_scale: float = 0.84, damping: float = 0.5) -> np.ndarray:
    """Freeverb-style reverb (sox `reverb -w` equivalent capability)."""
    scale = sr / 44100.0
    out = np.zeros_like(wav, dtype=np.float64)
    x = wav.astype(np.float64)
    for delay in _FREEVERB_COMBS:
        d = max(1, int(delay * scale))
        # lowpass-feedback comb filter: y[n] = x[n-d] + room * lp(y[n-d])
        b = np.zeros(d + 1)
        b[d] = 1.0
        a = np.zeros(d + 1)
        a[0] = 1.0
        a[d] = -room_scale * (1 - damping)
        out += signal.lfilter(b, a, x)
    out /= len(_FREEVERB_COMBS)
    for delay in _FREEVERB_ALLPASSES:
        d = max(1, int(delay * scale))
        b = np.zeros(d + 1)
        a = np.zeros(d + 1)
        b[0], b[d] = -0.5, 1.0
        a[0], a[d] = 1.0, -0.5
        out = signal.lfilter(b, a, out)
    out = out.astype(np.float32)
    if wet_only:
        return out
    return wav + out


def mu_law_roundtrip(wav: np.ndarray, mu: float = 255.0) -> np.ndarray:
    """8-bit mu-law encode/decode (the 'wav' ULAW codec path)."""
    x = np.clip(wav, -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    q = np.round((y + 1) / 2 * mu) / mu * 2 - 1
    return (np.sign(q) * (np.expm1(np.abs(q) * np.log1p(mu))) / mu).astype(np.float32)


def band_limit(wav: np.ndarray, sr: int, cutoff: float) -> np.ndarray:
    sos = signal.butter(6, cutoff / (sr / 2), btype="low", output="sos")
    return signal.sosfilt(sos, wav).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _mdct_basis(n: int) -> np.ndarray:
    half = n // 2
    k = np.arange(half)[None, :]
    t = np.arange(n)[:, None]
    return np.cos(np.pi / half * (t + 0.5 + half / 2) * (k + 0.5)) * (2.0 / n)


def mdct_codec_roundtrip(wav: np.ndarray, sr: int, n: int = 1024,
                         bands: int = 32, mant_bits: int = 4,
                         cutoff_frac: float = 0.4) -> np.ndarray:
    """MDCT transform-codec round trip — the honest 'mp3'/'vorbis' stand-in
    (no lame/ffmpeg exists on this host, reference augmentation_methods.py:72-95
    uses real codecs). Sine-windowed 50%-overlap MDCT, per-band scalefactor +
    uniform mantissa quantisation, low-bitrate band cut, TDAC overlap-add —
    reproduces the codec-class artifacts (quantisation smearing, pre-echo,
    high-band kill) rather than just a Butterworth roll-off."""
    half = n // 2
    x = np.asarray(wav, np.float64)
    t_orig = len(x)
    pad = (-len(x)) % half
    x = np.pad(x, (half, half + pad))
    window = np.sin(np.pi * (np.arange(n) + 0.5) / n)  # MPEG/Vorbis sine window
    frames = np.lib.stride_tricks.sliding_window_view(x, n)[::half]
    basis = _mdct_basis(n)
    spec = (frames * window) @ basis  # (F, half)

    # per-band scalefactor quantisation
    band_edges = np.linspace(0, half, bands + 1).astype(int)
    q = np.zeros_like(spec)
    levels = 2 ** (mant_bits - 1)
    cutoff_bin = int(half * cutoff_frac)  # MDCT bin k covers ~k/half * nyquist
    for b in range(bands):
        lo, hi = band_edges[b], band_edges[b + 1]
        if lo >= cutoff_bin:
            continue  # low-bitrate band kill
        seg = spec[:, lo:hi]
        scale = np.abs(seg).max(axis=1, keepdims=True)
        step = np.maximum(scale / levels, 1e-10)
        q[:, lo:hi] = np.round(seg / step) * step

    recon = (q @ basis.T * n) * window  # IMDCT (Princen-Bradley TDAC scale)
    out = np.zeros(len(x))
    idx = np.arange(len(frames)) * half
    for i, s in enumerate(idx):
        out[s : s + n] += recon[i]
    return out[half : half + t_orig].astype(np.float32)


# ---------------------------------------------------------------------------
# augmentors (same protocol as the reference)
# ---------------------------------------------------------------------------


class NoiseAugmentor:
    def __init__(self, dir, label_options, min_nsr=0.05, max_nsr=0.2):
        self.min_nsr = min_nsr
        self.nsr_range = max_nsr - min_nsr
        mic_brands = Path(dir).glob("libriadapt/noise/*")
        self.noise_paths = {
            mic_brand.stem: {
                noise_type.stem: list(noise_type.glob("**/*.wav"))
                for noise_type in mic_brand.glob("*")
            }
            for mic_brand in mic_brands
        }
        self.label_options = label_options

    def augment(self, rng, labels, cut_labels, wav, noise_type, disable_wav_augmentation=False):
        mic_brand = self.label_options["mic-brand"][int(cut_labels["style"]["mic-brand"][0])]
        if mic_brand not in self.noise_paths or noise_type not in self.noise_paths[mic_brand]:
            noise_type = "disabled"
        elif not disable_wav_augmentation:
            noise_path = rng.choice(self.noise_paths[mic_brand][noise_type])
            noise, _sr = load_wav(noise_path)
            noise = noise[0]
            nsr = self.min_nsr + rng.random() * self.nsr_range
            wav = wav * (1 - nsr)
            if noise.shape[0] > wav.shape[0]:
                noise = noise[: wav.shape[0]]
            else:
                reps = int(np.ceil(wav.shape[0] / noise.shape[0]))
                noise = np.tile(noise, reps)[: wav.shape[0]]  # circular pad
            wav = wav + noise * nsr
        return labels, wav, noise_type


class RirAugmentor:
    def __init__(self, dir):
        rir_options = Path(dir).glob("RIRS_NOISES/simulated_rirs/*")
        self.rir_paths = {opt.stem: list(opt.glob("**/*.wav")) for opt in rir_options}

    def augment(self, rng, labels, cut_labels, wav, aug_parameter, disable_wav_augmentation=False):
        if not disable_wav_augmentation:
            rir_path = rng.choice(self.rir_paths[aug_parameter])
            rir, _sr = load_wav(rir_path)
            rir = rir[0]
            rir = rir / (np.linalg.norm(rir) + 1e-12)
            rir = rir[::-1]
            max_idx = int(np.argmax(rir))
            rir = rir[max_idx:] if max_idx > 0 else rir
            full = signal.fftconvolve(wav, rir, mode="full")
            wav = full[len(rir) - 1 : len(rir) - 1 + len(wav)].astype(np.float32)
        return labels, wav, aug_parameter


def gsm_roundtrip(wav: np.ndarray, sr: int, impl=None) -> np.ndarray:
    """Real GSM 06.10 (RPE-LTP) round trip, with the codec's native 8 kHz
    rate handled by polyphase resampling (what sox does under torchaudio's
    apply_codec, reference augmentation_methods.py:72-95). ``impl``: the
    8 kHz codec function — the canonical libgsm binding
    (codecs.gsm_roundtrip_libgsm_8k) or the from-spec float adaptation
    (native.gsm0610_roundtrip_8k, default)."""
    from math import gcd

    from hifigan_tpu.data import native

    if impl is None:
        impl = native.gsm0610_roundtrip_8k
    n = len(wav)
    if sr != 8000:
        g = gcd(sr, 8000)
        x8 = signal.resample_poly(wav, 8000 // g, sr // g).astype(np.float32)
    else:
        x8 = np.asarray(wav, np.float32)
    y8 = impl(x8)
    if sr != 8000:
        out = signal.resample_poly(y8, sr // g, 8000 // g).astype(np.float32)
    else:
        out = y8
    if len(out) < n:
        out = np.pad(out, (0, n - len(out)))
    return out[:n]


class CodecAugmentor:
    def __init__(self, sample_rate):
        self.sample_rate = sample_rate

    def augment(self, rng, labels, cut_labels, wav, aug_parameter, disable_wav_augmentation=False):
        if not disable_wav_augmentation:
            from hifigan_tpu.data import native

            n = len(wav)
            if aug_parameter == "wav":  # ULAW 8-bit
                wav = mu_law_roundtrip(wav)
            elif aug_parameter == "gsm":
                from hifigan_tpu.data import codecs

                if codecs.libgsm_available():
                    # canonical ETSI fixed-point libgsm (what sox uses)
                    wav = gsm_roundtrip(wav, self.sample_rate,
                                        impl=codecs.gsm_roundtrip_libgsm_8k)
                elif native.gsm0610_available():
                    # from-spec float adaptation (native/gsm0610.cpp)
                    wav = gsm_roundtrip(wav, self.sample_rate)
                else:  # lib not built: telephone band + mu-law approximation
                    wav = band_limit(wav, self.sample_rate, 3400.0)
                    wav = mu_law_roundtrip(wav)
            elif aug_parameter == "mp3":
                # REAL lame->mpg123 round trip when the system libs exist
                # (reference: apply_codec(format='mp3', compression=-9) ==
                # lame VBR q9); MDCT transform-codec stand-in otherwise
                from hifigan_tpu.data import codecs

                if codecs.mp3_available():
                    wav = codecs.mp3_roundtrip(wav, self.sample_rate, vbr_quality=9)
                else:
                    wav = mdct_codec_roundtrip(wav, self.sample_rate, n=1024)
            elif aug_parameter == "vorbis":
                # REAL vorbisenc/ogg round trip (reference compression=-1 ==
                # vorbis base quality -0.1); MDCT stand-in otherwise
                from hifigan_tpu.data import codecs

                if codecs.vorbis_available():
                    wav = codecs.vorbis_roundtrip(wav, self.sample_rate, quality=-0.1)
                else:
                    wav = mdct_codec_roundtrip(wav, self.sample_rate, n=2048)
            wav = wav[:n]
        return labels, wav, aug_parameter


class LowpassAugmentor:
    def __init__(self, sample_rate):
        self.sample_rate = sample_rate

    def augment(self, rng, labels, cut_labels, wav, aug_parameter, disable_wav_augmentation=False):
        if not disable_wav_augmentation:
            from hifigan_tpu.data import native

            wav = native.one_pole_lowpass(wav, float(aug_parameter), self.sample_rate)
        return labels, wav, aug_parameter


class HighpassAugmentor:
    def __init__(self, sample_rate):
        self.sample_rate = sample_rate

    def augment(self, rng, labels, cut_labels, wav, aug_parameter, disable_wav_augmentation=False):
        if not disable_wav_augmentation:
            from hifigan_tpu.data import native

            wav = native.one_pole_highpass(wav, float(aug_parameter), self.sample_rate)
        return labels, wav, aug_parameter


class ReverbAugmentor:
    def __init__(self, sample_rate):
        self.sample_rate = sample_rate

    def augment(self, rng, labels, cut_labels, wav, aug_parameter, disable_wav_augmentation=False):
        if not disable_wav_augmentation:
            wav = freeverb(wav, self.sample_rate, wet_only=True)
        return labels, wav, aug_parameter


class HilbertAugmentor:
    def __init__(self, sample_rate):
        self.sample_rate = sample_rate

    def augment(self, rng, labels, cut_labels, wav, aug_parameter, disable_wav_augmentation=False):
        if not disable_wav_augmentation:
            wav = hilbert_fir(wav)
        return labels, wav, aug_parameter
