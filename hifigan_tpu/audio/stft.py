"""STFT building blocks, TPU-first.

Two spectrogram paths with identical numerics:

- ``method='matmul'`` (default on TPU): frames @ real-DFT basis — one large
  (win, 2*(n_fft//2+1)) matmul that maps straight onto the MXU and lets XLA
  fuse the window multiply, the power/abs, and the downstream mel matmul.
- ``method='fft'``: ``jnp.fft.rfft`` fallback/oracle.

Numerics follow torch.stft conventions (periodic Hann, centered zero-pad of
the window up to n_fft, onesided), which is what the reference's mel pipeline
uses via torchaudio (reference: src/meldataset.py:56-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_size: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window — matches torch.hann_window(periodic=True)."""
    n = np.arange(win_size, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_size))
    return w.astype(dtype)


@functools.lru_cache(maxsize=None)
def _rdft_basis(n_fft: int, win_size: int) -> np.ndarray:
    """Real-DFT basis of shape (win_size, 2*n_bins): [cos | -sin] columns.

    frames @ basis yields [Re | Im] of the onesided DFT. The window (length
    ``win_size``) is conceptually centre-padded to ``n_fft`` as torch.stft
    does; equivalently we evaluate the DFT phases at the padded offsets so the
    matmul contracts only over the ``win_size`` support.
    """
    n_bins = n_fft // 2 + 1
    offset = (n_fft - win_size) // 2  # window centre-padding offset
    t = np.arange(win_size, dtype=np.float64) + offset
    k = np.arange(n_bins, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(t, k) / n_fft  # (win, bins)
    basis = np.concatenate([np.cos(phase), -np.sin(phase)], axis=1)
    return basis.astype(np.float32)


def frame_signal(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(B, T) -> (B, F, n_fft) frames, torch.stft center=False framing.

    F = 1 + (T - n_fft) // hop. Uses a gather over a static index grid so XLA
    sees a single fused dynamic-slice-free op (static shapes).
    """
    T = y.shape[-1]
    num_frames = 1 + (T - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[..., idx]


def stft_real_imag(
    y: jax.Array,
    n_fft: int,
    hop: int,
    win_size: int,
    window: jax.Array | None = None,
    method: str = "matmul",
) -> tuple[jax.Array, jax.Array]:
    """Onesided STFT -> (real, imag), each (B, F, n_bins). center=False."""
    if window is None:
        window = jnp.asarray(hann_window(win_size))
    frames = frame_signal(y, n_fft, hop)
    if win_size < n_fft:
        # torch.stft centre-pads the window to n_fft; equivalently crop the
        # frame to the window support at the same offset.
        off = (n_fft - win_size) // 2
        frames = frames[..., off : off + win_size]
    frames = frames * window
    n_bins = n_fft // 2 + 1
    if method == "matmul":
        basis = jnp.asarray(_rdft_basis(n_fft, win_size))
        out = jax.lax.dot_general(
            frames,
            basis,
            dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return out[..., :n_bins], out[..., n_bins:]
    elif method == "fft":
        if win_size < n_fft:
            off = (n_fft - win_size) // 2
            frames = jnp.pad(
                frames, [(0, 0)] * (frames.ndim - 1) + [(off, n_fft - win_size - off)]
            )
        z = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        return jnp.real(z).astype(jnp.float32), jnp.imag(z).astype(jnp.float32)
    else:
        raise ValueError(f"unknown stft method: {method}")


def stft_power(
    y: jax.Array,
    n_fft: int,
    hop: int,
    win_size: int,
    power: float = 2.0,
    window: jax.Array | None = None,
    method: str = "matmul",
) -> jax.Array:
    """|STFT|^power, shape (B, F, n_bins)."""
    re, im = stft_real_imag(y, n_fft, hop, win_size, window=window, method=method)
    p2 = re * re + im * im
    if power == 2.0:
        return p2
    if power == 1.0:
        return jnp.sqrt(p2)
    return jnp.power(p2, power / 2.0)


def stft_magnitude(
    y: jax.Array, n_fft: int, hop: int, win_size: int, method: str = "matmul"
) -> jax.Array:
    return stft_power(y, n_fft, hop, win_size, power=1.0, method=method)
