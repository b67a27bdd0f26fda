"""Declarative module-config interpreter (the framework's model-builder DSL).

Capability parity with reference speech_distillation/configurable_module.py
(the tuple/list module language, ~35 node types) + custom_layers.py +
custom_blocks.py + custom_discriminator.py + ensemble.py + generator.py —
re-designed for functional JAX:

- One flax module (:class:`ConfigurableModule`) interprets the whole config
  tree inside ``__call__``; sub-parameters are created inline with
  path-derived names, so the param pytree mirrors the config structure.
- **Feature capture is explicit dataflow**, not forward hooks (the
  reference's FeatureBlock hook trick, custom_blocks.py:159-179, cannot
  exist in functional JAX): every node evaluation returns
  ``(y, [(tags, value), ...])`` and ``fmap``/``pfmap`` nodes consume the
  entries whose tags match.
- Valve ratios (schedule-decayed by callbacks, custom_blocks.py:139-145)
  live in a mutable ``'valves'`` variable collection — updating them is a
  pytree edit, not a recompile.
- Noise nodes draw from the flax ``'noise'`` RNG stream (explicit PRNG
  instead of torch global RNG, custom_layers.py:164-171).

Layout: activations are **channels-last** (B, T, C) on the inside (TPU
lanes = channels); the reference's dim-1-channel semantics (split/chunk/
merge/softmax/one_hot) map to axis=-1 here. Waveform inputs are (B, T, 1).

Node vocabulary (== reference configurable_module.py:51-309):
  tanh sigmoid avg_ch merge merge_dict softmax
  conv conv_rech conv_shuffle conv2 trans trans_shuffle trans2
  up pool poold roll unroll repl shuffle unshuffle mel fusion sum chunk
  one_hot split list dict recursive res valve noise sub_res lrelu fmap
  pfmap ensemble all_in_one_block all_in_one_discriminator encoder decoder
"""

from __future__ import annotations

import ast
from collections.abc import Mapping

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
from hifigan_tpu.dsl.normalize import RLIST, SEQ, is_normalized, normalize_config
from hifigan_tpu.models.layers import NormConv1d, NormConv2d, NormConvTranspose1d
from hifigan_tpu.ops.conv import avg_pool1d, leaky_relu


# ---------------------------------------------------------------------------
# padding helpers (reference speech_distillation/extra_utils.py)
# ---------------------------------------------------------------------------


def dsl_padding(kernel: int, stride: int = 1, dilation: int = 1) -> int:
    """extra_utils.get_1d_padding: ((k-1)*d + 1) // 2."""
    return ((kernel - 1) * dilation + 1) // 2


def dsl_padding_trans(kernel: int, stride: int = 1, dilation: int = 1) -> tuple[int, int]:
    """extra_utils.get_1d_padding_trans -> (padding, output_padding)."""
    total = (kernel - 1) * dilation + 1 - stride
    return total // 2 + total % 2, total % 2


def padding_period(length: int, period: int) -> tuple[int, int]:
    """extra_utils.get_1d_padding_period: centre-pad to a period multiple."""
    total = int(math.ceil(length / period) * period - length)
    return total // 2, total // 2 + total % 2


def _norm_name(norm_type) -> str:
    if norm_type == "spectral":
        return "spectral"
    if norm_type == "none":
        return "none"
    return "weight"


def _conv_params(chin, chout, kernel, stride=1, dilation=1, groups=1, init=0.01, norm_type=None):
    return int(chin), int(chout), int(kernel), int(stride), int(dilation), int(groups), float(init), _norm_name(norm_type)


Feats = list  # [(tags tuple, value), ...]


class ConfigurableModule(nn.Module):
    """Interpreter for the tuple/list module-config language."""

    config: Any
    mel_sampling_rate_override: int | None = None
    update_spectral: bool = False  # run+store spectral-norm power iterations
    # Mixed precision: cast float inputs to this dtype at entry (params are
    # cast at use inside NormConv*, staying f32 in the pytree) and cast float
    # outputs back to f32 at exit — the same contract as the vocoder's
    # gen/disc_compute_dtype (train/vocoder.py). ~2x MXU throughput on TPU.
    compute_dtype: Any = None
    # Homogeneous-ensemble evaluation. 'vmap' (default) traces the member
    # body once — N x smaller HLO, required for the production distill step
    # to fit the remote compile helper. 'unroll' inlines members. MEASURED
    # (v5e, don't redo): an ISOLATED vmapped disc fwd is 2.4x slower than
    # the unrolled sum (batch-group conv lowering: 15.3 ms vs 3 x 2.16 ms),
    # but inside the FULL distill step unrolling the disc measures WORSE
    # (141.4 vs 136.8 ms, compile 554 s vs 214 s) — XLA schedules the
    # whole-graph vmapped form better. Keep 'vmap' unless a new measurement
    # says otherwise.
    ensemble_impl: str = "vmap"
    # 1-D conv backend for 'conv'/'conv_rech' nodes. 'auto' = XLA (measured
    # fastest at production batch for the per-layer Pallas form); 'folded' =
    # route stride-1 narrow-channel convs through the time-fold lowering
    # (ops.conv.conv1d_time_folded — the distill discriminator's 1-66-ch
    # convs run at ~0.5 TFLOP/s direct); 'pallas' / 'pallas_interpret'
    # (tests) force the per-layer Pallas tap-loop kernel. Nodes combining
    # stride>1 with dilation>1 (none in the shipped configs) stay on XLA.
    conv_impl: str = "auto"
    # All-in-one discriminator member lowering. 'fused' runs each
    # pfmap(all_in_one_discriminator) member subtree as fused Pallas
    # stream-graph kernels (one per all-in-one block; dsl/fused_member.py) —
    # the member's ~43 tiny convs are dispatch-bound under XLA.
    # 'fused_interpret' runs the same kernels interpreted (tests);
    # 'interpret' keeps the plain interpreter. MEASURED (v5e, production
    # distill scale, bf16): disc fwd 14.2 -> 4.4 ms, fwd+bwd 25.9 -> 4.2,
    # FULL distill step 133.8 -> 77.6 ms (105.5x RT) at loss parity
    # (1043.89 vs 1044.09) — 'auto' therefore resolves to 'fused' on
    # single-device accelerator backends, interpreter on CPU and under
    # multi-device meshes (the member kernels are not shard_map-wired;
    # GSPMD would replicate an opaque Mosaic call's operands). Subtrees the
    # pattern-matcher rejects fall back silently BEFORE any parameter is
    # created, so the param tree never depends on this flag.
    member_impl: str = "auto"
    # Generic stream-fusion pass (dsl/stream_fusion.py): greedily fuse runs
    # of narrow same-rate stream ops (conv/lrelu/tanh/res/sub_res/pool/
    # repl/avg_ch/sum) into single Pallas stream-graph kernels — the distill
    # encoder/decoder's 4/12/84-channel levels are dispatch-bound under XLA.
    # Unsupported atoms (rolls, wide convs, tags, ...) fall back to the
    # interpreter node-by-node at identical paths, so the param tree never
    # depends on this flag. 'fused' / 'fused_interpret' opt in. MEASURED
    # (v5e, production distill scale, bf16): stream fusion of the distill
    # enc/dec REGRESSES the full step — 85.6 ms member-fused+stream-fused
    # vs 77.6 member-fused only (the 4/12/84-ch levels' XLA convs already
    # overlap with the wide core; the extra kernels serialise) — so 'auto'
    # stays on the interpreter everywhere. Don't flip without a new
    # measurement.
    stream_impl: str = "auto"
    # Declare that this module instance's weights are NEVER differentiated
    # through (frozen-copy evaluation, e.g. DistillModels.discriminator_eval
    # applied to the trainer's disc_copy): the fused member/stream Pallas
    # backward kernels then skip every weight-grad dot (~half the backward
    # MACs) and return zero weight cotangents. XLA cannot DCE inside an
    # opaque Mosaic call, so the declaration must be explicit. Setting this
    # False on a module whose params ARE being trained silently zeroes
    # their grads — only use for frozen copies. No effect on the
    # interpreter paths (XLA DCEs those on its own).
    weight_grads: bool = True
    # Device mesh for the fused member/stream kernels: when set, the Pallas
    # calls run under jax.shard_map with the waveform batch split over
    # ``mesh_batch_axis`` and the weights replicated (the shard_map
    # transpose inserts the weight-grad psum) — exactly the MSD's
    # DiscriminatorS.mesh wiring. Without it GSPMD treats the opaque Mosaic
    # calls as replicated and defeats data parallelism. The wiring composes
    # with the ensemble nn.vmap (vmap-of-shard_map). distill.main threads
    # the trainer's mesh here via DistillModels(mesh=...).
    mesh: Any = None
    mesh_batch_axis: str = "data"
    # Internal (vmapped-ensemble support): also return the tagged-feature
    # side channel as a {"{i}|{tags!r}": value} dict so it can cross an
    # nn.vmap boundary (string tags live in the treedef, values are arrays).
    return_feats: bool = False

    def __post_init__(self):
        # Canonicalise BEFORE flax freezes attributes (lists -> tuples would
        # otherwise destroy the sequence-vs-node distinction).
        if not is_normalized(self.config):
            object.__setattr__(self, "config", normalize_config(self.config))
        super().__post_init__()

    def _mesh_data_size(self) -> int:
        return (
            self.mesh.shape.get(self.mesh_batch_axis, 1)
            if self.mesh is not None
            else 1
        )

    def _resolved_member_impl(self) -> str:
        """'auto' -> 'fused' on a single accelerator device (measured win,
        see the member_impl attribute note) or on multi-device hosts whose
        mesh is wired in (the shard_map wiring — ``mesh`` attr); interpreter
        otherwise. The fused path only changes HOW a pfmap member evaluates
        — the param tree is identical either way, so auto may differ across
        hosts or backends without breaking checkpoints."""
        if self.member_impl != "auto":
            return self.member_impl
        if jax.default_backend() == "cpu":
            return "interpret"
        if len(jax.devices()) == 1 or self._mesh_data_size() > 1:
            return "fused"
        return "interpret"

    @nn.compact
    def __call__(self, *x):
        args = x if len(x) > 1 else (x[0],)
        cd = self.compute_dtype
        if cd is not None:
            cd = jnp.dtype(cd) if isinstance(cd, str) else cd
            to_cd = lambda a: (
                a.astype(cd)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a
            )
            # tree-map so pytree inputs (e.g. a sniffer's {label: preds}
            # dict) are cast too, mirroring the output-side cast
            args = tuple(jax.tree_util.tree_map(to_cd, a) for a in args)
        if self.stream_impl in ("fused", "fused_interpret") and len(args) == 1:
            from hifigan_tpu.dsl.stream_fusion import eval_stream_fused

            y, feats = eval_stream_fused(
                self, self.config, args[0], "m",
                interpret=self.stream_impl == "fused_interpret",
                weight_grads=self.weight_grads,
            )
        else:
            y, feats = self._eval(self.config, args, "m")
        if cd is not None:
            to_f32 = lambda a: (
                a.astype(jnp.float32)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a
            )
            y = jax.tree_util.tree_map(to_f32, y)
            feats = [(t, jax.tree_util.tree_map(to_f32, v)) for t, v in feats]
        if self.return_feats:
            return y, {f"{i}|{tags!r}": v for i, (tags, v) in enumerate(feats)}
        return y

    # -- core recursion ----------------------------------------------------

    def _eval(self, cfg, args: tuple, path: str) -> tuple[Any, Feats]:
        """Evaluate a canonical config node on ``args`` (usually a 1-tuple)."""
        if not is_normalized(cfg):
            cfg = normalize_config(cfg)

        if cfg[0] == SEQ:
            feats: Feats = []
            val = args
            for i, sub in enumerate(cfg[1]):
                out, f = self._eval(sub, val, f"{path}_{i}")
                feats.extend(f)
                val = (out,)
            return val[0], feats

        _, name, params, tags = cfg
        if name == "#tagged":  # tags attached to a whole sequence
            y, feats = self._eval(params, args, path)
        else:
            if name == "valve" and tags:
                # Embed tags in the valve's variable path so schedule
                # callbacks can address valves by tag (the reference finds
                # ValveBlocks via module tags, valve_decay_callback.py:20-24).
                path = f"{path}__{'+'.join(tags)}"
            y, feats = self._node(name, params, args, path)
        if tags:
            feats = feats + [(tags, y)]
        return y, feats

    # -- vmapped homogeneous ensemble --------------------------------------

    def _ensemble_vmapped(self, member_cfg, n: int, args: tuple, path: str) -> tuple[Any, Feats]:
        """Evaluate an N-member ensemble of one shared config by tracing the
        member ONCE under ``nn.vmap`` over stacked (axis-0) member params.

        The tagged-feature side channel crosses the vmap boundary as a
        string-keyed dict (``return_feats``); afterwards it is unstacked back
        into member-major ``[(tags, value)]`` order — identical structure to
        the unrolled loop, so `fmap` capture spanning the ensemble boundary
        (the all-in-one discriminator, static_configs.get_discriminator_config)
        sees the same flat feature list.
        """
        VmappedMember = nn.vmap(
            ConfigurableModule,
            in_axes=None,
            out_axes=0,
            # valves are broadcast (None), not stacked: a valve ratio is a
            # global schedule value shared by every member (the decay
            # callback writes one scalar per tag), and sharing keeps the
            # leaf 0-d so schedule rewrites can't desync member shapes
            variable_axes={"params": 0, "spectral": 0, "valves": None},
            split_rngs={"params": True, "noise": True},
            axis_size=n,
        )
        member = VmappedMember(
            config=member_cfg,
            mel_sampling_rate_override=self.mel_sampling_rate_override,
            update_spectral=self.update_spectral,
            conv_impl=self.conv_impl,
            member_impl=self.member_impl,
            weight_grads=self.weight_grads,
            mesh=self.mesh,
            mesh_batch_axis=self.mesh_batch_axis,
            return_feats=True,
            name=f"{path}_ens",
        )
        stacked, feat_dict = member(*args)

        feats: Feats = []
        if feat_dict:
            items = sorted(feat_dict.items(), key=lambda kv: int(kv[0].split("|", 1)[0]))
            tags_list = [tuple(ast.literal_eval(k.split("|", 1)[1])) for k, _ in items]
            vals = [v for _, v in items]
            for i in range(n):
                for tags, sv in zip(tags_list, vals):
                    feats.append((tags, jax.tree_util.tree_map(lambda a, i=i: a[i], sv)))

        means = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), stacked)
        variances = jax.tree_util.tree_map(lambda s: jnp.var(s, axis=0, ddof=1), stacked)
        return {"mean": means, "variance": variances}, feats

    def _conv_backend(self, stride: int, dilation: int) -> tuple[str | None, bool]:
        """(fused_impl, interpret) for a 1-D conv node."""
        if self.conv_impl in ("pallas", "pallas_interpret"):
            if stride > 1 and dilation > 1:
                return None, False  # not supported by the fused op (unused)
            return "pallas_msd", self.conv_impl == "pallas_interpret"
        if self.conv_impl == "folded" and stride == 1:
            # narrow-channel convs through the time-fold lowering
            # (ops.conv.conv1d_time_folded) — NormConv1d falls back to the
            # direct conv when its own eligibility gate fails
            return "folded", False
        # 'auto' resolves to XLA for now: per-conv pallas measured slower at
        # production batch (fold/transpose glue; docs/OPERATIONS.md)
        return None, False

    # -- node dispatch -----------------------------------------------------

    def _node(self, name: str, p, args: tuple, path: str) -> tuple[Any, Feats]:
        x = args[0]
        feats: Feats = []

        # ---- parameter-free ----
        if name == "tanh":
            return jnp.tanh(x), feats
        if name == "sigmoid":
            return jax.nn.sigmoid(x), feats
        if name == "avg_ch":
            return jnp.mean(x, axis=-1, keepdims=True), feats
        if name == "merge":
            return jnp.concatenate(list(x), axis=-1), feats
        if name == "merge_dict":
            return jnp.concatenate(list(x.values()), axis=-1), feats
        if name == "softmax":
            return jax.nn.softmax(x, axis=-1), feats

        # ---- convolutions ----
        if name == "conv":
            chin, chout, k, s, d, g, init, norm = _conv_params(*p)
            fimpl, interp = self._conv_backend(s, d)
            y = NormConv1d(
                features=chout,
                kernel_size=k,
                stride=s,
                dilation=d,
                groups=g,
                padding=dsl_padding(k, s, d),
                norm=norm,
                init_std=init,
                fused_impl=fimpl,
                fused_interpret=interp,
                name=f"{path}_conv",
            )(x, self.update_spectral)
            return y, feats
        if name == "conv_rech":
            # Conv1dRechanneled (custom_layers.py:11): conv to stride*chin
            # channels then fold time into channels to hit exact chout.
            # stride=None -> chout // gcd(chin, chout) (custom_layers.py:14-16).
            p = list(p)
            if len(p) > 3 and p[3] is None:
                p[3] = int(p[1]) // math.gcd(int(p[0]), int(p[1]))
            chin, chout, k, s, d, g, init, norm = _conv_params(*p)
            conv_out = s * chin
            fimpl, interp = self._conv_backend(s, d)
            y = NormConv1d(
                features=conv_out,
                kernel_size=k,
                stride=s,
                dilation=d,
                groups=g,
                padding=dsl_padding(k, s, d),
                norm=norm,
                init_std=init,
                fused_impl=fimpl,
                fused_interpret=interp,
                name=f"{path}_convrech",
            )(x, self.update_spectral)
            b, t, c = y.shape
            y = y.reshape(b, (t * c) // chout, chout)
            return y, feats
        if name == "conv_shuffle":
            chin, chout, k, s, d, g, init, norm = _conv_params(*p)
            if g == 1:
                return self._eval(("conv", (chin, chout, k, s, d, g, init)), args, f"{path}_cs")
            seq = [
                ("conv", (chin, chout, k, s, d, g, init)),
                ("shuffle", g),
                ("conv", (chout, chout, 1, 1, 1, chout // g, init)),
                ("unshuffle", g),
            ]
            return self._eval(seq, args, f"{path}_cs")
        if name == "conv2":
            chin, chout, k, s, d, g, init, norm = _conv_params(*p)
            y = NormConv2d(
                features=chout,
                kernel_size=(k, k),
                stride=(s, s),
                dilation=(d, d),
                groups=g,
                padding=(dsl_padding(k, s, d), dsl_padding(k, s, d)),
                norm=norm,
                init_std=init,
                name=f"{path}_conv2",
            )(x, self.update_spectral)
            return y, feats
        if name == "trans":
            chin, chout, k, s, d, g, init, norm = _conv_params(*p)
            pad, out_pad = dsl_padding_trans(k, s, d)
            if g != 1:
                raise NotImplementedError("grouped transposed conv not used by the reference configs")
            y = NormConvTranspose1d(
                features=chout,
                kernel_size=k,
                stride=s,
                padding=pad,
                output_padding=out_pad,
                norm=norm,
                init_std=init,
                name=f"{path}_trans",
            )(x, self.update_spectral)
            return y, feats
        if name == "trans_shuffle":
            chin, chout, k, s, d, g, init, norm = _conv_params(*p)
            if g == 1:
                return self._eval(("trans", (chin, chout, k, s, d, g, init)), args, f"{path}_ts")
            seq = [
                ("conv", (chin, chin, 1, 1, 1, chin // g, init)),
                ("shuffle", g),
                ("trans", (chin, chout, k, s, 1, 1, init)),
                ("unshuffle", g),
            ]
            return self._eval(seq, args, f"{path}_ts")
        if name == "trans2":
            raise NotImplementedError("trans2 is unused by all reference configs")

        # ---- resampling / pooling ----
        if name == "up":
            stride, mode = p
            if mode == "nearest":
                y = jnp.repeat(x, int(stride), axis=1)
            else:  # linear, align_corners=False semantics
                b, t, c = x.shape
                y = jax.image.resize(x, (b, t * int(stride), c), method="linear")
            return y, feats
        if name == "pool":
            k, s = p
            return avg_pool1d(x, int(k), int(s), padding=dsl_padding(int(k), int(s))), feats
        if name == "poold":
            k, s, d = (int(v) for v in p)
            return self._avg_pool_dilated(x, k, s, d, padding=dsl_padding(k, s)), feats

        # ---- reshapes ----
        if name == "roll":
            period = int(p[0]) if isinstance(p, (tuple, list)) else int(p)
            pad_mode = p[1] if isinstance(p, (tuple, list)) and len(p) > 1 else "constant"
            b, t, c = x.shape
            lo, hi = padding_period(t, period)
            mode = {"constant": "constant", "reflect": "reflect"}[pad_mode]
            y = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode=mode)
            y = y.reshape(b, (t + lo + hi) // period, period * c)
            return y, feats
        if name == "unroll":
            period = int(p[0]) if isinstance(p, (tuple, list)) else int(p)
            b, t, c = x.shape
            y = x.reshape(b, t * period, c // period)
            return y, feats
        if name == "repl":
            return jnp.concatenate([x] * int(p), axis=-1), feats
        if name == "shuffle":
            g = int(p)
            b, t, c = x.shape
            # NCW GroupShuffle (custom_layers.py:38-49) on channels-last.
            y = x.reshape(b, t, g, c // g).swapaxes(-1, -2).reshape(b, t, c)
            return y, feats
        if name == "unshuffle":
            g = int(p)
            b, t, c = x.shape
            y = x.reshape(b, t, c // g, g).swapaxes(-1, -2).reshape(b, t, c)
            return y, feats

        # ---- DSP ----
        if name == "mel":
            sr, out_ch, k, s = (int(v) for v in p[:4])
            if self.mel_sampling_rate_override:
                sr = self.mel_sampling_rate_override
            b, t, c = x.shape
            wav = x[..., 0]
            lo, hi = padding_period(t, s)
            wav = jnp.pad(wav, ((0, 0), (lo, hi)))
            cfg = MelConfig(
                n_fft=k, num_mels=out_ch, sampling_rate=sr, hop_size=s, win_size=k,
                fmin=0.0, fmax=None,
            )
            mel = log_mel_spectrogram(wav, cfg)  # (B, mels, F)
            return jnp.swapaxes(mel, -1, -2), feats  # (B, F, mels)

        # ---- structural ----
        if name == "fusion":
            outs = []
            for i, sub in enumerate(p):
                out, f = self._eval(sub, args, f"{path}_fus{i}")
                outs.append(out)
                feats.extend(f)
            return sum(outs) / len(outs), feats
        if name == "sum":
            outs = []
            for i, sub in enumerate(p):
                out, f = self._eval(sub, args, f"{path}_sum{i}")
                outs.append(out)
                feats.extend(f)
            return sum(outs), feats
        if name == "chunk":
            n = int(p)
            return tuple(jnp.split(x, n, axis=-1)), feats
        if name == "split":
            if isinstance(p, Mapping):
                sizes = list(p.values())
                idx = [sum(sizes[: i + 1]) for i in range(len(sizes) - 1)]
                parts = jnp.split(x, idx, axis=-1)
                return dict(zip(p.keys(), parts)), feats
            size = int(p)
            n = x.shape[-1] // size
            idx = [size * (i + 1) for i in range(n - 1)]
            return tuple(jnp.split(x, idx, axis=-1)), feats
        if name == "one_hot":
            channels, dim = p
            return jax.nn.one_hot(x.astype(jnp.int32), int(channels)), feats
        if name == "list":
            outs = []
            for i, (sub, xi) in enumerate(zip(p, x)):
                out, f = self._eval(sub, (xi,), f"{path}_l{i}")
                outs.append(out)
                feats.extend(f)
            return outs, feats
        if name == "dict":
            outs = {}
            for key, sub in p.items():
                out, f = self._eval(sub, (x[key],), f"{path}_d{key}")
                outs[key] = out
                feats.extend(f)
            return outs, feats
        if name == "recursive":
            return self._recursive(p, x, f"{path}_r", feats), feats
        if name == "res":
            out, f = self._eval(p, args, f"{path}_res")
            feats.extend(f)
            return x + out, feats
        if name == "sub_res":
            out, f = self._eval(p, args, f"{path}_sres")
            feats.extend(f)
            return x - out, feats
        if name == "valve":
            ratio0 = float(p)
            ratio = self.variable(
                "valves", f"{path}_ratio", lambda: jnp.asarray(ratio0, jnp.float32)
            )
            return x * ratio.value, feats
        if name == "noise":
            channels = int(p)
            b, t, _ = x.shape
            key = self.make_rng("noise")
            return jax.random.normal(key, (b, t, channels), x.dtype), feats
        if name == "lrelu":
            slope = float(p)
            return leaky_relu(x, slope), feats

        # ---- feature capture ----
        if name == "fmap":
            sub_cfg, tags_to_find = p
            out, f = self._eval(sub_cfg, args, f"{path}_fm")
            captured = [v for t, v in f if any(tag in tags_to_find for tag in t)]
            return {"output": out, "features": captured}, f
        if name == "pfmap":
            impl = self._resolved_member_impl()
            n_data = self._mesh_data_size()
            # a wired mesh can only shard batches it divides (shard_map);
            # others (e.g. the batch-1 init trace) take the interpreter —
            # same param tree either way
            mesh_ok = n_data <= 1 or args[0].shape[0] % n_data == 0
            if impl in ("fused", "fused_interpret") and mesh_ok:
                from hifigan_tpu.dsl.fused_member import (
                    StreamUnsupported,
                    eval_member_pfmap,
                    parse_member,
                )

                try:  # static pattern check first: no params created, so a
                    plan = parse_member(p, path)  # rejected subtree falls
                except StreamUnsupported:  # back clean
                    pass
                else:
                    return eval_member_pfmap(
                        self, p, args, path, plan=plan,
                        interpret=impl == "fused_interpret",
                        weight_grads=self.weight_grads,
                        mesh=self.mesh if n_data > 1 else None,
                        batch_axis=self.mesh_batch_axis,
                    )
            sub_cfg, tags_to_find, feature_models = p
            out, f = self._eval(sub_cfg, args, f"{path}_pfm")
            captured = [v for t, v in f if any(tag in tags_to_find for tag in t)]
            processed = []
            for i, feat in enumerate(captured):
                fm_cfg = feature_models[i % len(feature_models)]
                pv, pf = self._eval(fm_cfg, (feat,), f"{path}_pfmm{i}")
                processed.append(pv)
                feats.extend(pf)
            return {"output": out, "features": processed}, f + feats

        # ---- composites ----
        if name == "ensemble":
            subs = [s if is_normalized(s) else normalize_config(s) for s in p]
            # Every shipped config builds N IDENTICAL member configs
            # (static_configs/classifiers `for _ in range(ensemble_size)`), so
            # the idiomatic-XLA path traces the member body ONCE under
            # nn.vmap over stacked member params — ~N x smaller HLO than the
            # unrolled loop (compile time and program size both matter: the
            # production-scale distill step is tens of MLIR megabytes
            # unrolled). Members still get independent param init
            # (split_rngs), preserving ensemble variance semantics.
            if (
                self.ensemble_impl == "vmap"
                and len(subs) > 1
                and all(s == subs[0] for s in subs[1:])
            ):
                return self._ensemble_vmapped(subs[0], len(subs), args, path)
            results = []
            for i, sub in enumerate(subs):
                out, f = self._eval(sub, args, f"{path}_e{i}")
                results.append(out)
                feats.extend(f)
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *results)
            means = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), stacked)
            variances = jax.tree_util.tree_map(lambda s: jnp.var(s, axis=0, ddof=1), stacked)
            return {"mean": means, "variance": variances}, feats
        if name == "all_in_one_block":
            before_cfg, raw_cfgs, after_cfg = p
            xx, raw = args
            out, f = self._eval(before_cfg, (xx,), f"{path}_aib_b")
            feats.extend(f)
            branch_outs = [out]
            for i, rc in enumerate(raw_cfgs):
                ro, rf = self._eval(rc, (raw,), f"{path}_aib_r{i}")
                branch_outs.append(ro)
                feats.extend(rf)
            max_len = max(o.shape[1] for o in branch_outs)
            padded = [
                jnp.pad(o, ((0, 0), (0, max_len - o.shape[1]), (0, 0))) for o in branch_outs
            ]
            cat = jnp.concatenate(padded, axis=-1)
            out, f = self._eval(after_cfg, (cat,), f"{path}_aib_a")
            feats.extend(f)
            return out, feats
        if name == "all_in_one_discriminator":
            before_cfg, blocks_cfgs, after_cfg = p
            raw = x
            out, f = self._eval(before_cfg, (raw,), f"{path}_aiod_b")
            feats.extend(f)
            for i, bc in enumerate(blocks_cfgs):
                out, f = self._eval(bc, (out, raw), f"{path}_aiod_{i}")
                feats.extend(f)
            out, f = self._eval(after_cfg, (out,), f"{path}_aiod_a")
            feats.extend(f)
            return out, feats
        if name == "encoder":
            vo_cfg, splitters_cfgs = p
            e, f = self._eval(vo_cfg, args, f"{path}_enc")
            feats.extend(f)
            outs = []
            for i, sc in enumerate(splitters_cfgs):
                o, sf = self._eval(sc, (e,), f"{path}_enc_s{i}")
                outs.append(o)
                feats.extend(sf)
            return outs, feats
        if name == "decoder":
            mergers_cfgs, vo_cfg = p
            merged = []
            for i, (mc, xi) in enumerate(zip(mergers_cfgs, x)):
                o, mf = self._eval(mc, (xi,), f"{path}_dec_m{i}")
                merged.append(o)
                feats.extend(mf)
            e = sum(merged)
            out, f = self._eval(vo_cfg, (e,), f"{path}_dec")
            feats.extend(f)
            return out, feats

        raise ValueError(f"Unknown module type [{name}]")

    # -- helpers -----------------------------------------------------------

    def _recursive(self, cfgs, x, path: str, feats: Feats):
        """RecursiveBlock (custom_blocks.py:120-136): map a parallel config
        structure over the input pytree; config leaves apply to value leaves.
        A config leaf (node/seq) broadcasts over any deeper input nesting."""
        is_leaf_cfg = is_normalized(cfgs)
        if isinstance(x, Mapping):
            return {
                k: self._recursive(cfgs if is_leaf_cfg else cfgs[k], v, f"{path}_{k}", feats)
                for k, v in x.items()
            }
        if isinstance(x, (list, tuple)):
            sub_cfgs = (
                [cfgs] * len(x)
                if is_leaf_cfg
                else list(cfgs[1] if isinstance(cfgs, tuple) and cfgs[0] == RLIST else cfgs)
            )
            seq = [
                self._recursive(c, v, f"{path}_{i}", feats)
                for i, (c, v) in enumerate(zip(sub_cfgs, x))
            ]
            return tuple(seq) if isinstance(x, tuple) else seq
        out, f = self._eval(cfgs, (x,), path)
        feats.extend(f)
        return out

    @staticmethod
    def _avg_pool_dilated(x, kernel, stride, dilation, padding):
        """AvgPool1dDilated (custom_layers.py:113-135): pool along time with
        dilated taps by phase-splitting the time axis."""
        b, t, c = x.shape
        # (B, T, C) -> (B, T/d, d, C): phase-major layout as the reference.
        y = x.reshape(b, t // dilation, dilation, c)
        summed = jax.lax.reduce_window(
            y,
            0.0,
            jax.lax.add,
            window_dimensions=(1, kernel, 1, 1),
            window_strides=(1, 1, stride, 1),
            padding=((0, 0), (padding, padding), (0, 0), (0, 0)),
        )
        y = summed / kernel
        return y.reshape(b, -1, c)


def get_module_from_config(module_config, **kwargs) -> ConfigurableModule:
    """Reference-parity constructor (configurable_module.py:29)."""
    return ConfigurableModule(config=module_config, **kwargs)
