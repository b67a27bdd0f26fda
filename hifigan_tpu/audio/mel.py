"""Log-mel spectrogram pipeline.

Capability parity with the reference's `mel_spectrogram`
(reference: src/meldataset.py:56-85), which is: reflect-pad the waveform by
(n_fft - hop)/2 on both sides, center=False power-2 STFT (periodic Hann),
HTK-scale un-normalized mel filterbank (torchaudio MelSpectrogram defaults),
then log(clamp(x, 1e-5)).

Upstream jik876/hifi-gan instead used a magnitude (power=1) STFT with a
librosa Slaney-scale / slaney-normalized filterbank; both conventions are
supported via ``MelConfig(power, mel_scale, norm)`` so that pretrained
upstream checkpoints (LJ_V1/V2/V3 etc., reference README.md:49-60) and this
fork's pipeline are both reproducible bit-for-bit in float32.

TPU-first: the whole chain is (frame -> window -> DFT-matmul -> power ->
mel-matmul -> log) — two MXU matmuls plus fused elementwise, compiled as one
XLA fusion group. A fused Pallas kernel lives in ops/pallas/logmel.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.audio.stft import hann_window, stft_power

MAX_WAV_VALUE = 32768.0


# ---------------------------------------------------------------------------
# Mel filterbanks (host-side numpy; cached)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray | float, scale: str) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray, scale: str) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    num_mels: int,
    fmin: float,
    fmax: float | None,
    mel_scale: str = "htk",
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_fft//2 + 1, num_mels).

    ``mel_scale='htk', norm=None`` matches torchaudio.functional.melscale_fbanks
    defaults (what the reference fork uses); ``mel_scale='slaney',
    norm='slaney'`` matches librosa.filters.mel defaults (upstream hifi-gan).
    """
    if fmax is None:
        fmax = sampling_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sampling_rate / 2.0, n_freqs)

    m_min = _hz_to_mel(fmin, mel_scale)
    m_max = _hz_to_mel(fmax, mel_scale)
    m_pts = np.linspace(m_min, m_max, num_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    # Triangular filters via slopes (same construction as torchaudio/librosa).
    f_diff = f_pts[1:] - f_pts[:-1]  # (num_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, num_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, num_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : num_mels + 2] - f_pts[:num_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown filterbank norm: {norm}")
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# Dynamic range compression (reference: src/meldataset.py:24-47)
# ---------------------------------------------------------------------------


def dynamic_range_compression(x: jax.Array, C: float = 1.0, clip_val: float = 1e-5) -> jax.Array:
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jax.Array, C: float = 1.0) -> jax.Array:
    return jnp.exp(x) / C


# ---------------------------------------------------------------------------
# Public mel API
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Static mel parameters (hashable -> usable as a jit static arg)."""

    n_fft: int = 1024
    num_mels: int = 80
    sampling_rate: int = 22050
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float | None = 8000.0
    power: float = 2.0  # torchaudio default (the fork); upstream used 1.0
    mel_scale: str = "htk"  # fork: 'htk'; upstream: 'slaney'
    norm: str | None = None  # fork: None; upstream: 'slaney'
    center: bool = False
    # 'auto' resolves per backend: framed matmul-DFT on TPU (MXU; an rFFT
    # would leave the MXU idle) but real rFFT on CPU where the (F, n_fft)
    # DFT matmul is ~4x slower than pocketfft. 'matmul'/'fft'/'pallas' force.
    method: str = "auto"

    @classmethod
    def from_hparams(cls, h, fmax_key: str = "fmax", **over) -> "MelConfig":
        return cls(
            n_fft=h["n_fft"],
            num_mels=h["num_mels"],
            sampling_rate=h["sampling_rate"],
            hop_size=h["hop_size"],
            win_size=h["win_size"],
            fmin=h["fmin"],
            fmax=h.get(fmax_key, None),
            **over,
        )


def _resolve_method(cfg: MelConfig) -> MelConfig:
    if cfg.method == "auto":
        m = "fft" if jax.default_backend() == "cpu" else "matmul"
        return dataclasses.replace(cfg, method=m)
    return cfg


@functools.partial(jax.jit, static_argnums=(1,))
def _mel_impl(y: jax.Array, cfg: MelConfig) -> jax.Array:
    if cfg.method == "pallas":
        # fused Pallas kernel (custom VJP: backward recomputes via the
        # matmul path) with jnp fallback for unsupported geometries
        from hifigan_tpu.ops.pallas.logmel import fused_log_mel, supports_fused_log_mel

        if supports_fused_log_mel(cfg):
            return fused_log_mel(y, cfg)
        cfg = dataclasses.replace(cfg, method="matmul")
    pad = int((cfg.n_fft - cfg.hop_size) / 2)
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    spec = stft_power(
        y, cfg.n_fft, cfg.hop_size, cfg.win_size, power=cfg.power, method=cfg.method
    )  # (B, F, bins)
    fb = jnp.asarray(
        mel_filterbank(
            cfg.sampling_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax, cfg.mel_scale, cfg.norm
        )
    )
    mel = jax.lax.dot_general(
        spec,
        fb,
        dimension_numbers=(((spec.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (B, F, num_mels)
    mel = dynamic_range_compression(mel)
    return jnp.swapaxes(mel, -1, -2)  # (B, num_mels, F) — reference layout


def mel_spectrogram(
    y: jax.Array,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float | None = 8000.0,
    center: bool = False,
    power: float = 2.0,
    mel_scale: str = "htk",
    norm: str | None = None,
    method: str = "matmul",
) -> jax.Array:
    """Log-mel spectrogram, (B, T) -> (B, num_mels, frames).

    Drop-in functional equivalent of the reference `mel_spectrogram`
    (src/meldataset.py:56-85): reflect-pad (n_fft-hop)/2 both sides,
    center=False STFT, mel projection, log(clamp(x, 1e-5)).
    """
    if center:
        raise NotImplementedError("center=True is never used by the reference pipeline")
    cfg = MelConfig(
        n_fft=n_fft,
        num_mels=num_mels,
        sampling_rate=sampling_rate,
        hop_size=hop_size,
        win_size=win_size,
        fmin=fmin,
        fmax=fmax,
        power=power,
        mel_scale=mel_scale,
        norm=norm,
        method=method,
    )
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    out = _mel_impl(y, _resolve_method(cfg))
    return out[0] if squeeze else out


def log_mel_spectrogram(y: jax.Array, cfg: MelConfig) -> jax.Array:
    """Config-object form of :func:`mel_spectrogram` (same output layout)."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    out = _mel_impl(y, _resolve_method(cfg))
    return out[0] if squeeze else out
