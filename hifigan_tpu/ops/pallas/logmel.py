"""Fused log-mel Pallas kernel.

One VMEM-resident pass per frame-block: DMA a contiguous signal slice from
HBM -> static-slice restitch of overlapping frames -> Hann window (folded
into the DFT basis) -> real-DFT matmul (MXU) -> power -> mel-filterbank
matmul (MXU) -> log clamp. The XLA composition (hifigan_tpu.audio.mel)
materialises the (B, F, n_fft) frame tensor and the (B, F, bins)
spectrogram in HBM; this kernel keeps both in VMEM, writing only the
(B, F, mels) result.

Applicability: n_fft == win_size == 4 * hop (the HiFi-GAN standard
1024/1024/256) — frame f is then the concatenation of 4 consecutive
hop-sized sample blocks, so frames assemble from a contiguous signal block
with static slices (no gathers). Overlapping reads can't be expressed as a
BlockSpec, so the signal stays in HBM (`pltpu.ANY`) and each grid step DMAs
its slice into VMEM scratch. `supports_fused_log_mel` gates dispatch; other
geometries fall back to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hifigan_tpu.audio.mel import MelConfig, mel_filterbank
from hifigan_tpu.audio.stft import _rdft_basis, hann_window


def supports_fused_log_mel(cfg: MelConfig) -> bool:
    return (
        cfg.n_fft == cfg.win_size
        and cfg.n_fft == 4 * cfg.hop_size
        and cfg.power == 2.0
        and cfg.method != "fft"
    )


def _kernel(sig_hbm, basis_ref, fb_ref, out_ref, sig_vmem, sem, *, tile_f, hop, n_bins):
    # sig_hbm: (B, n_blocks, hop). Frame f = blocks[f : f + 4] concatenated;
    # rather than concatenating vectors (Mosaic rejects offset-slice concats)
    # the window matmul is decomposed into 4 accumulated partial matmuls:
    #   frames @ basis = sum_j blocks[f + j] @ basis[j*hop:(j+1)*hop].
    # One tile-aligned DMA brings tile_f + 8 rows (DMA row offsets must be
    # sublane-aligned); the j-offset row windows are VMEM slices.
    bi = pl.program_id(0)
    fi = pl.program_id(1)
    dma = pltpu.make_async_copy(
        sig_hbm.at[bi, pl.ds(fi * tile_f, tile_f + 8), :],
        sig_vmem,
        sem,
    )
    dma.start()
    dma.wait()
    spec = jnp.zeros((tile_f, 2 * n_bins), jnp.float32)
    for j in range(4):
        spec += jnp.dot(
            sig_vmem[j : tile_f + j, :],
            basis_ref[j * hop : (j + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    power = re * re + im * im
    mel = jnp.dot(
        power, fb_ref[:, :], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0, :, :] = jnp.log(jnp.clip(mel, 1e-5, None))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _fused_log_mel_padded(
    y_padded: jax.Array, cfg: MelConfig, num_frames: int, interpret: bool = False
) -> jax.Array:
    """y_padded: (B, num_frames*hop + 3*hop) reflect-padded signal."""
    hop = cfg.hop_size
    n_bins = cfg.n_fft // 2 + 1
    tile_f = min(128, num_frames)
    f_pad = -num_frames % tile_f
    total_f = num_frames + f_pad
    if f_pad:
        y_padded = jnp.pad(y_padded, ((0, 0), (0, f_pad * hop)))
    b = y_padded.shape[0]

    window = hann_window(cfg.win_size).astype(np.float32)
    basis = (_rdft_basis(cfg.n_fft, cfg.win_size) * window[:, None]).astype(np.float32)
    fb = mel_filterbank(
        cfg.sampling_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax, cfg.mel_scale, cfg.norm
    )

    # (B, n_blocks, hop) view so row-offset DMAs express the overlap; pad
    # 5 extra rows so every tile's (tile_f + 8)-row aligned DMA is in bounds
    sig_blocks = jnp.pad(y_padded.reshape(b, -1, hop), ((0, 0), (0, 5), (0, 0)))

    kernel = functools.partial(_kernel, tile_f=tile_f, hop=hop, n_bins=n_bins)
    out = pl.pallas_call(
        kernel,
        grid=(b, total_f // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # signal stays in HBM
            pl.BlockSpec((cfg.n_fft, 2 * n_bins), lambda bi, fi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, cfg.num_mels), lambda bi, fi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_f, cfg.num_mels), lambda bi, fi: (bi, fi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, total_f, cfg.num_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_f + 8, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig_blocks, jnp.asarray(basis), jnp.asarray(fb))
    out = out[:, :num_frames, :]
    return jnp.swapaxes(out, -1, -2)  # (B, mels, F)


def _fused_log_mel_fwd_impl(y: jax.Array, cfg: MelConfig, interpret: bool) -> jax.Array:
    pad = (cfg.n_fft - cfg.hop_size) // 2  # = 1.5*hop for the 4x geometry
    y_padded = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (y_padded.shape[-1] - cfg.n_fft) // cfg.hop_size
    # crop to an exact hop multiple: the last frame ends at
    # num_frames*hop + 3*hop, so nothing beyond it is ever read — this makes
    # the (B, -1, hop) block reshape valid for arbitrary-length audio
    y_padded = y_padded[:, : (num_frames + 3) * cfg.hop_size]
    return _fused_log_mel_padded(y_padded, cfg, num_frames, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_log_mel(y: jax.Array, cfg: MelConfig, interpret: bool = False) -> jax.Array:
    """(B, T) -> (B, num_mels, frames); numerics match
    hifigan_tpu.audio.log_mel_spectrogram for supported geometries.

    Differentiable: the backward pass recomputes the chain with the XLA
    matmul composition and pulls the cotangent through it (jax.vjp), saving
    only ``y``. Honest cost note: at vocoder TRAINING shapes (segment 8192
    -> 32 frames) the whole mel chain is a negligible slice of the step, so
    the fused forward buys nothing there — the kernel's win is large-batch
    inference-side mel extraction; see docs/OPERATIONS.md."""
    assert supports_fused_log_mel(cfg), "unsupported mel geometry for the fused kernel"
    return _fused_log_mel_fwd_impl(y, cfg, interpret)


def _fused_log_mel_fwd(y, cfg, interpret):
    return _fused_log_mel_fwd_impl(y, cfg, interpret), y


def _fused_log_mel_bwd(cfg, interpret, y, g):
    # gradcheck-exact wrt the jnp path: same padding, clip mask, and HIGHEST
    # precision matmuls (tests/test_pallas_logmel.py)
    import dataclasses as _dc

    from hifigan_tpu.audio import mel as _mel

    jnp_cfg = _dc.replace(cfg, method="matmul")
    _, vjp = jax.vjp(lambda yy: _mel.log_mel_spectrogram(yy, jnp_cfg), y)
    return vjp(g)


fused_log_mel.defvjp(_fused_log_mel_fwd, _fused_log_mel_bwd)
