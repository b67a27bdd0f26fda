"""Multi-period and multi-scale discriminators, TPU-native.

Parity with reference src/models.py:128-248:
- DiscriminatorP (:128): reflect-pad the waveform to a multiple of the
  period, reshape (B, T) -> (B, T/p, p, 1) [NHWC], 5x (5,1)-kernel
  (3,1)-stride conv2d stack 1->32->128->512->1024->1024, conv_post (3,1)->1;
  returns flattened logits + per-layer feature maps.
- MultiPeriodDiscriminator (:164): periods (2, 3, 5, 7, 11).
- DiscriminatorS (:191): 7 grouped conv1d stages + conv_post.
- MultiScaleDiscriminator (:219): 3 scales, AvgPool1d(4, 2, pad=2) between,
  spectral norm on scale 0 (:223).

Layout: waveforms are (B, T) here (the reference carries (B, 1, T)); the
channel axis is materialised channels-last internally. Feature maps are
returned channels-last — loss functions are layout-agnostic (elementwise).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.layers import NormConv1d, NormConv2d
from hifigan_tpu.ops.conv import LRELU_SLOPE, avg_pool1d, leaky_relu


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    channels: Sequence[int] = (32, 128, 512, 1024)  # reference widths
    precision: Any = None
    dtype: Any = None  # compute dtype for the conv stack (e.g. bf16 on TPU)

    @nn.compact
    def __call__(
        self, x: jax.Array, update_spectral: bool = False
    ) -> tuple[jax.Array, list[jax.Array]]:
        norm = "spectral" if self.use_spectral_norm else "weight"
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        fmap = []
        for i, ch in enumerate(self.channels):
            x = NormConv2d(
                features=ch,
                kernel_size=(self.kernel_size, 1),
                stride=(self.stride, 1),
                padding=(2, 0),  # get_padding(5, 1) == 2 (ref src/models.py:134)
                norm=norm,
                precision=self.precision,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x, update_spectral)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = NormConv2d(
            features=self.channels[-1],
            kernel_size=(self.kernel_size, 1),
            stride=(1, 1),
            padding=(2, 0),
            norm=norm,
            precision=self.precision,
            dtype=self.dtype,
            name="convs_4",
        )(x, update_spectral)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = NormConv2d(
            features=1,
            kernel_size=(3, 1),
            stride=(1, 1),
            padding=(1, 0),
            norm=norm,
            precision=self.precision,
            dtype=self.dtype,
            name="conv_post",
        )(x, update_spectral)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    use_spectral_norm: bool = False
    width: int = 128  # base width; reference stack is 128/128/256/512/1024...
    precision: Any = None
    dtype: Any = None
    # conv backend: 'xla' (NormConv1d's lowering incl. block-dense g<=4),
    # 'pallas' (ops/pallas/msd_conv.py fused conv+lrelu tap-loop kernels),
    # or 'auto'. MEASURED (v5e, B16x8192 bf16, real+fake pair): per-conv
    # pallas fwd 15.9 ms vs XLA 12.8, fwd+bwd 40.7 vs 36.9 — the per-layer
    # fold/transpose glue eats the kernel win, so 'auto' resolves to XLA
    # for now (numerics match; see /tmp-era notes in docs/OPERATIONS.md).
    conv_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jax.Array, update_spectral: bool = False
    ) -> tuple[jax.Array, list[jax.Array]]:
        norm = "spectral" if self.use_spectral_norm else "weight"
        pallas = self.conv_impl == "pallas"  # 'auto' -> XLA (measured faster)
        b = x.shape[0]
        x = x[..., None]  # (B, T, 1)
        # (features, kernel, stride, groups, padding) — ref src/models.py:195-203
        w = self.width
        specs = [
            (w, 15, 1, 1, 7),
            (w, 41, 2, 4, 20),
            (w * 2, 41, 2, 16, 20),
            (w * 4, 41, 4, 16, 20),
            (w * 8, 41, 4, 16, 20),
            (w * 8, 41, 1, 16, 20),
            (w * 8, 5, 1, 1, 2),
        ]
        fmap = []
        for i, (ch, k, s, g, p) in enumerate(specs):
            x = NormConv1d(
                features=ch,
                kernel_size=k,
                stride=s,
                groups=g,
                padding=p,
                norm=norm,
                precision=self.precision,
                dtype=self.dtype,
                fused_impl="pallas_msd" if pallas else None,
                fused_slope=LRELU_SLOPE if pallas else 1.0,
                name=f"convs_{i}",
            )(x, update_spectral)
            if not pallas:
                x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = NormConv1d(
            features=1,
            kernel_size=3,
            padding=1,
            norm=norm,
            precision=self.precision,
            dtype=self.dtype,
            fused_impl="pallas_msd" if pallas else None,
            name="conv_post",
        )(x, update_spectral)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods 2/3/5/7/11 (reference src/models.py:164-188). ``fused=True``
    runs real+fake as one batched 2B call per sub-discriminator (exact for
    the weight-normed paths) — measured far slower in training on v5e; see
    the attribute note."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Sequence[int] = (32, 128, 512, 1024)
    precision: Any = None
    dtype: Any = None
    # real+fake as one batched 2B pass per sub-discriminator. MEASURED
    # PESSIMIZATION on v5e training: the D/G-pass backward through the
    # concat+slice graph blows the step from 117 ms to 26 s (B16x8192, V1) —
    # XLA schedules the split-cotangent scatter terribly. Keep False.
    fused: bool = False

    @nn.compact
    def __call__(
        self, y: jax.Array, y_hat: jax.Array, update_spectral: bool = False
    ) -> tuple[list, list, list, list]:
        b = y.shape[0]
        yy = jnp.concatenate([y, y_hat], axis=0) if self.fused else None
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(
                period=p,
                channels=self.channels,
                precision=self.precision,
                dtype=self.dtype,
                name=f"discriminators_{i}",
            )
            if self.fused:
                logits, fmap = d(yy, update_spectral)
                y_d_rs.append(logits[:b])
                y_d_gs.append(logits[b:])
                fmap_rs.append([f[:b] for f in fmap])
                fmap_gs.append([f[b:] for f in fmap])
            else:
                y_d_r, fmap_r = d(y, update_spectral)
                y_d_g, fmap_g = d(y_hat, update_spectral)
                y_d_rs.append(y_d_r)
                y_d_gs.append(y_d_g)
                fmap_rs.append(fmap_r)
                fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiScaleDiscriminator(nn.Module):
    width: int = 128
    num_scales: int = 3
    precision: Any = None
    dtype: Any = None
    fused: bool = False  # see MultiPeriodDiscriminator.fused
    conv_impl: str = "auto"  # see DiscriminatorS.conv_impl

    @nn.compact
    def __call__(
        self, y: jax.Array, y_hat: jax.Array, update_spectral: bool = False
    ) -> tuple[list, list, list, list]:
        b = y.shape[0]
        yy = jnp.concatenate([y, y_hat], axis=0) if self.fused else None
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(self.num_scales):
            if i != 0:
                if self.fused:
                    yy = avg_pool1d(yy[..., None], 4, 2, padding=2)[..., 0]
                else:
                    y = avg_pool1d(y[..., None], 4, 2, padding=2)[..., 0]
                    y_hat = avg_pool1d(y_hat[..., None], 4, 2, padding=2)[..., 0]
            d = DiscriminatorS(
                use_spectral_norm=(i == 0),
                width=self.width,
                precision=self.precision,
                dtype=self.dtype,
                conv_impl=self.conv_impl,
                name=f"discriminators_{i}",
            )
            if self.fused:
                logits, fmap = d(yy, update_spectral)
                y_d_rs.append(logits[:b])
                y_d_gs.append(logits[b:])
                fmap_rs.append([f[:b] for f in fmap])
                fmap_gs.append([f[b:] for f in fmap])
            else:
                y_d_r, fmap_r = d(y, update_spectral)
                y_d_g, fmap_g = d(y_hat, update_spectral)
                y_d_rs.append(y_d_r)
                y_d_gs.append(y_d_g)
                fmap_rs.append(fmap_r)
                fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
