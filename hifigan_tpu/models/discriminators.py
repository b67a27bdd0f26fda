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
    # 'pallas' (ops/pallas/msd_conv.py per-LAYER fused conv+lrelu kernels),
    # 'fused_stack' (ops/pallas/conv_stack.py: the WHOLE 7-layer stack +
    # conv_post in 1-2 Pallas kernels, activations VMEM-resident, fused
    # custom-VJP backward), 'fused_zoned' (fused_stack + group time-fold
    # zones for the grouped layers: each group presents exactly 128 lanes
    # with time folded in, killing the group-densification FLOP pad), or
    # 'auto'. MEASURED (v5e, B16x8192 bf16, real+fake pair, all-leaf grad
    # sums): XLA fwd 12.9 ms / fwd+bwd 37.4; per-conv pallas fwd 15.9 /
    # fwd+bwd 40.7 (the per-layer fold glue eats the kernel win);
    # fused_stack fwd 10.7 / fwd+bwd 31.0; fused_zoned fwd 8.2 / fwd+bwd
    # 23.4 at zone_min_groups=8 (full V1 train step 64.9 ms vs 79.9 stack
    # / 82.0 XLA). 'auto' resolves to fused_zoned on accelerators when the
    # geometry allows, XLA otherwise/on CPU.
    conv_impl: str = "auto"
    conv_interpret: bool = False  # interpret the fused-stack kernels (tests)
    # Device mesh for the fused-stack kernels: when set, the Pallas calls
    # run under jax.shard_map with the batch split over ``mesh_batch_axis``
    # (weights replicated, weight-grad psum from the shard_map transpose) —
    # without it GSPMD would replicate the opaque Mosaic calls and defeat
    # data parallelism. 'auto' only selects a fused form on multi-device
    # when a mesh is provided and the batch divides its data axis.
    mesh: Any = None
    mesh_batch_axis: str = "data"
    # Minimum group count for the time-fold zone form under 'fused_zoned'.
    # MEASURED (v5e xplane trace, B16x8192 bf16): zoning the g=4 layer 1
    # saves ~0.3 ms of kernel time over its block-dense std form (gpb=4,
    # x4 FLOP pad) but forces full-time-resolution fold/unfold lane
    # permutations (bf16[16,2048,4,4,32]-shaped copies at ~80 GB/s) that
    # XLA cannot fuse into the opaque Mosaic calls — several ms/step
    # across scales x real/fake x D/G passes. g>=8 zones only the g=16
    # chain (layers 2-5), whose densification pad (x8-16) is the one worth
    # paying a fold for. Tests lower this to cover g4 zone geometry.
    zone_min_groups: int = 8

    @nn.compact
    def __call__(
        self, x: jax.Array, update_spectral: bool = False,
        weight_grads: bool = True, pair: jax.Array | None = None,
    ):
        """Returns (logits, fmaps); with ``pair`` (a same-shape second
        waveform — the GAN's real/fake traversals share one weight set per
        optimizer half-step), returns ((logits, fmaps), (logits2, fmaps2))
        with the banded weight tables of the fused paths packed ONCE for
        both traversals (the duplicate pack + its backward transpose is
        ~2.7 ms/step at B16x8192 that XLA's CSE only partially removes).
        Numerics are identical to two separate calls for the weight-normed
        scales; spectral-norm power iteration updates once per __call__,
        so the spectral scale 0 should keep per-traversal calls when
        update_spectral=True (MultiScaleDiscriminator does)."""
        norm = "spectral" if self.use_spectral_norm else "weight"
        b = x.shape[0]
        xs = [x[..., None]] if pair is None else [x[..., None], pair[..., None]]
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
        impl = self.conv_impl
        if impl == "auto":
            # fused_zoned wins on accelerators (measured above); the Mosaic
            # kernels need a TPU backend and 128-aligned stack width. On a
            # multi-device mesh the fused form needs the shard_map wiring
            # (``mesh`` attr) — without it GSPMD treats a Mosaic call as
            # opaque and would replicate its operands (docs/OPERATIONS.md).
            n_data = (
                self.mesh.shape.get(self.mesh_batch_axis, 1)
                if self.mesh is not None
                else 1
            )
            multi_ok = len(jax.devices()) == 1 or (
                n_data > 1 and b % n_data == 0
            )
            impl = (
                "fused_zoned"
                if jax.default_backend() != "cpu"
                and self.width % 128 == 0
                and multi_ok
                else "xla"
            )
        if impl in ("fused_stack", "fused_zoned"):
            results = self._fused_stack(
                xs, specs, norm, update_spectral, b,
                zoned=impl == "fused_zoned", weight_grads=weight_grads,
            )
            return results[0] if pair is None else tuple(results)
        pallas = impl == "pallas"
        convs = [
            NormConv1d(
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
            )
            for i, (ch, k, s, g, p) in enumerate(specs)
        ]
        conv_post = NormConv1d(
            features=1,
            kernel_size=3,
            padding=1,
            norm=norm,
            precision=self.precision,
            dtype=self.dtype,
            fused_impl="pallas_msd" if pallas else None,
            name="conv_post",
        )
        results = []
        for h in xs:
            fmap = []
            for conv in convs:
                h = conv(h, update_spectral)
                if not pallas:
                    h = leaky_relu(h, LRELU_SLOPE)
                fmap.append(h)
            h = conv_post(h, update_spectral)
            fmap.append(h)
            results.append((h.reshape(b, -1), fmap))
        return results[0] if pair is None else tuple(results)

    def _fused_stack(self, xs, specs, norm, update_spectral, b, zoned=False,
                     weight_grads=True):
        """Whole-stack path: conv_0 in XLA (1->width: sub-lane input), then
        layers 1..6 + conv_post as fused Pallas conv-stack kernels. ``xs``
        is a list of same-shape inputs (one, or real+fake paired — the
        weight tables are packed once across them); returns one
        (logits, fmaps) tuple per input.

        ``zoned=True`` additionally runs the grouped layers (1..5) through
        the group time-fold transform (conv_stack.zone_grouped_layer): each
        group presents exactly 128 lanes with time folded in, so the kernels
        run with NO group-densification FLOP pad (vs gpb 2-8x in the plain
        fused_stack form). Chain layers share the zone layout; the fold /
        unfold at chain boundaries are cheap XLA transposes. Zone-chain
        fmaps are in zone layout — an exact permutation of the reference
        layout (plus zeroed fold-padding lanes when the length does not
        divide the fold, i.e. the odd-length scales), so the elementwise
        feature-matching loss matches up to the mean's divisor counting
        those <1% padding zeros."""
        from hifigan_tpu.ops.pallas.conv_stack import (
            LayerSpec,
            fold_group_zones,
            fused_conv_stack,
            unfold_group_zones,
            zone_grouped_layer,
        )

        assert self.width % 128 == 0, "fused_stack needs width % 128 == 0"
        ch0, k0, _, _, p0 = specs[0]
        conv0 = NormConv1d(
            features=ch0, kernel_size=k0, padding=p0, norm=norm,
            precision=self.precision, dtype=self.dtype, name="convs_0",
        )
        hs = [leaky_relu(conv0(x, update_spectral), LRELU_SLOPE) for x in xs]
        fmaps = [[h] for h in hs]
        layers = []  # (kernel, bias, c_in, ch, k, s, g, p, slope)
        c_in = ch0
        for i, (ch, k, s, g, p) in enumerate(specs[1:], start=1):
            kb = NormConv1d(
                features=ch, kernel_size=k, stride=s, groups=g, padding=p,
                norm=norm, precision=self.precision, dtype=self.dtype,
                weights_only=True, name=f"convs_{i}",
            )(jnp.zeros((1, 1, c_in), hs[0].dtype), update_spectral)
            layers.append((kb[0], kb[1], c_in, ch, k, s, g, p, LRELU_SLOPE))
            c_in = ch
        kb = NormConv1d(
            features=1, kernel_size=3, padding=1, norm=norm,
            precision=self.precision, dtype=self.dtype, weights_only=True,
            name="conv_post",
        )(jnp.zeros((1, 1, c_in), hs[0].dtype), update_spectral)
        layers.append((kb[0], kb[1], c_in, 1, 3, 1, 1, 1, 1.0))

        # partition into runs: zone chains (stable grouped geometry; odd
        # lengths — the scale-1/2 inputs are 4097/2049 under the reference
        # AvgPool1d(4,2,pad 2) semantics — fold into partial rows that the
        # kernel lane-masks exactly) vs standard fused-stack chains
        runs = []  # (("zone", g) | ("std", None), [layer tuples])
        for ent in layers:
            _, _, ci, ch, k, s, g, p, _ = ent
            ci_g, co_g = ci // g, ch // g
            zonable = (
                zoned and g >= self.zone_min_groups
                and 128 % ci_g == 0 and 128 % co_g == 0
                and ((128 // co_g) * s) % (128 // ci_g) == 0
            )
            kind = ("zone", g) if zonable else ("std", None)
            if runs and runs[-1][0] == kind:
                runs[-1][1].append(ent)
            else:
                runs.append((kind, [ent]))

        outs = hs
        for (kind, g), ents in runs:
            t = outs[0].shape[1]
            if kind == "zone":
                zks, zbs, zspecs = [], [], []
                for kern, bias, ci, ch, k, s, gg, p, slope in ents:
                    fi, fo = 128 // (ci // gg), 128 // (ch // gg)
                    zk, zb, spec = zone_grouped_layer(
                        kern, bias, s, p, fi, fo, gg, slope, t
                    )
                    zks.append(zk)
                    zbs.append(zb)
                    zspecs.append(spec)
                    t = (t + 2 * p - k) // s + 1
                f_entry = 128 // (ents[0][2] // g)
                zs = [fold_group_zones(o, g, f_entry) for o in outs]
                ys_multi = fused_conv_stack(
                    zs, zks, zbs, zspecs, interpret=self.conv_interpret,
                    mesh=self.mesh, batch_axis=self.mesh_batch_axis,
                    weight_grads=weight_grads,
                )
                f_exit = 128 // (ents[-1][3] // g)
                for j, ys in enumerate(ys_multi):
                    fmaps[j].extend(ys)
                outs = [
                    unfold_group_zones(ys[-1], g, f_exit, t_out=t)
                    for ys in ys_multi
                ]
            else:
                kerns = [e[0] for e in ents]
                bs = [e[1] for e in ents]
                sspecs = [
                    LayerSpec(ch, k, s, gg, p, p, slope)
                    for _, _, _, ch, k, s, gg, p, slope in ents
                ]
                ys_multi = fused_conv_stack(
                    outs, kerns, bs, sspecs, interpret=self.conv_interpret,
                    mesh=self.mesh, batch_axis=self.mesh_batch_axis,
                    weight_grads=weight_grads,
                )
                for j, ys in enumerate(ys_multi):
                    fmaps[j].extend(ys)
                outs = [ys[-1] for ys in ys_multi]
        return [
            (o.reshape(b, -1), fm) for o, fm in zip(outs, fmaps)
        ]


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
    conv_interpret: bool = False
    mesh: Any = None  # see DiscriminatorS.mesh
    mesh_batch_axis: str = "data"
    zone_min_groups: int = 8  # see DiscriminatorS.zone_min_groups

    @nn.compact
    def __call__(
        self, y: jax.Array, y_hat: jax.Array, update_spectral: bool = False,
        weight_grads: bool = True,
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
                conv_interpret=self.conv_interpret,
                mesh=self.mesh,
                mesh_batch_axis=self.mesh_batch_axis,
                zone_min_groups=self.zone_min_groups,
                name=f"discriminators_{i}",
            )
            if self.fused:
                logits, fmap = d(yy, update_spectral, weight_grads)
                y_d_rs.append(logits[:b])
                y_d_gs.append(logits[b:])
                fmap_rs.append([f[:b] for f in fmap])
                fmap_gs.append([f[b:] for f in fmap])
            elif i == 0 and update_spectral:
                # spectral-norm scale: the power iteration advances once per
                # traversal (reference parity — torch's hook iterates on
                # every forward), so the fake traversal must see the
                # once-more-iterated u; no weight-table sharing here.
                y_d_r, fmap_r = d(y, update_spectral, weight_grads)
                y_d_g, fmap_g = d(y_hat, update_spectral, weight_grads)
                y_d_rs.append(y_d_r)
                y_d_gs.append(y_d_g)
                fmap_rs.append(fmap_r)
                fmap_gs.append(fmap_g)
            else:
                # weight-normed scales (and frozen-spectral eval): real+fake
                # share one weight set — the paired call packs the fused
                # paths' banded weight tables once for both traversals.
                (y_d_r, fmap_r), (y_d_g, fmap_g) = d(
                    y, update_spectral, weight_grads, pair=y_hat
                )
                y_d_rs.append(y_d_r)
                y_d_gs.append(y_d_g)
                fmap_rs.append(fmap_r)
                fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
