"""HiFi-GAN generator family (V1/V2/V3), TPU-native.

Architecture parity with the reference (src/models.py:11-125):
- ResBlock1 (:11): three (dilated conv, plain conv) pairs with 0.1-leaky
  pre-activations and additive residuals.
- ResBlock2 (:51): two dilated convs with residuals.
- Generator (:75): conv_pre k7 -> per-stage [lrelu -> ConvTranspose1d
  upsample -> mean of num_kernels ResBlocks] -> lrelu(0.01 slope, torch
  default at :112) -> conv_post k7 -> tanh.

TPU-first: all compute is (N, W, C) channels-last, convs lower to MXU
matmuls; the public __call__ keeps the reference's (N, mels, T) layout at
the boundary. ``folded=True`` applies with plain kernels produced by
:func:`hifigan_tpu.models.layers.fold_weight_norm` (the reference's
`remove_weight_norm` equivalent for inference).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.layers import NormConv1d, NormConvTranspose1d
from hifigan_tpu.ops.conv import LRELU_SLOPE, leaky_relu, torch_same_padding


class ResBlock1(nn.Module):
    """MRF block, 3 dilated + 3 plain convs (reference src/models.py:11-48)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    norm: str = "weight"
    time_block: int = 1
    precision: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = NormConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding=torch_same_padding(self.kernel_size, d),
                dilation=d,
                norm=self.norm,
                time_block=self.time_block,
                precision=self.precision,
                name=f"convs1_{i}",
            )(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = NormConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding=torch_same_padding(self.kernel_size, 1),
                dilation=1,
                norm=self.norm,
                time_block=self.time_block,
                precision=self.precision,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2-conv residual variant (reference src/models.py:51-68)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    norm: str = "weight"
    time_block: int = 1
    precision: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = NormConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding=torch_same_padding(self.kernel_size, d),
                dilation=d,
                norm=self.norm,
                time_block=self.time_block,
                precision=self.precision,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel (N, num_mels, T) -> waveform (N, 1, T * prod(upsample_rates)).

    ``h`` carries the reconstructed config_v1/v2/v3 schema (resblock,
    upsample_rates/kernel_sizes, upsample_initial_channel,
    resblock_kernel_sizes/dilation_sizes); reference src/models.py:75-116.
    """

    h: Any
    folded: bool = False  # True after fold_weight_norm (inference)
    dtype: Any = jnp.float32  # compute dtype (bfloat16 for speed)
    narrow_channel_block: int = 0  # >0: time-block narrow resblock convs
    # (exact; see ops.conv.conv1d_time_blocked). Measured SLOWER on v5e for
    # V1 inference (222 vs 144 ms at batch 128) — the tail is not MAC-bound
    # there — kept as an option for other shapes/backends.
    precision: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, channels_last: bool = False) -> jax.Array:
        h = self.h
        norm = "none" if self.folded else "weight"
        num_kernels = len(h["resblock_kernel_sizes"])
        resblock_cls = ResBlock1 if str(h["resblock"]) == "1" else ResBlock2

        if not channels_last:
            x = jnp.swapaxes(x, -1, -2)  # (N, T, mels)
        x = x.astype(self.dtype)

        x = NormConv1d(
            features=h["upsample_initial_channel"],
            kernel_size=7,
            padding=3,
            norm=norm,
            precision=self.precision,
            name="conv_pre",
        )(x)

        for i, (u, k) in enumerate(zip(h["upsample_rates"], h["upsample_kernel_sizes"])):
            ch = h["upsample_initial_channel"] // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = NormConvTranspose1d(
                features=ch,
                kernel_size=k,
                stride=u,
                padding=(k - u) // 2,
                norm=norm,
                precision=self.precision,
                name=f"ups_{i}",
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"])
            ):
                # widest block that fills the 128 lanes for this stage
                tb = max(1, min(self.narrow_channel_block, 128 // ch))
                out = resblock_cls(
                    channels=ch,
                    kernel_size=rk,
                    dilation=tuple(rd),
                    norm=norm,
                    time_block=tb,
                    precision=self.precision,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels

        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope (ref :112)
        x = NormConv1d(
            features=1,
            kernel_size=7,
            padding=3,
            norm=norm,
            precision=self.precision,
            name="conv_post",
        )(x)
        x = jnp.tanh(x)
        x = x.astype(jnp.float32)
        if not channels_last:
            x = jnp.swapaxes(x, -1, -2)  # (N, 1, T)
        return x
