"""Fused evaluation of an all-in-one discriminator member (DSL subtree).

The distillation discriminator (reference
speech_distillation/custom_discriminator.py:6-40, configs from
static_configs.get_discriminator_config) interprets to ~43 tiny convs per
ensemble member — channels 1..144 over 43680-sample streams. Under XLA each
conv is its own HBM round trip and the member forward is dispatch-bound
(docs/OPERATIONS.md: 13.9 ms for ~0.8 GFLOP). This module pattern-matches
the member's config subtree — the ``pfmap(all_in_one_discriminator)``
produced by get_static_single_all_in_one_discriminator_fmap — and lowers it
onto :mod:`hifigan_tpu.ops.pallas.stream_graph`: one fused Pallas kernel per
all-in-one block (conv_rech + raw-branch taps + conv + residual conv + the
block's pfmap head), activations VMEM-resident in the time-folded
sample-stream layout.

Key mappings (see stream_graph's module docstring for the layout):

- ``conv_rech``'s conv-then-rechannel (custom_layers.py:11-36) is a banded
  stream conv whose output level is *reinterpreted* at a different
  (channels, fold) split of the same lanes — zero data movement.
- ``roll`` raw branches (custom_layers.py:66-79) are XLA reshapes of the
  raw waveform fed to the kernel as side-input levels; the block's
  concat-then-conv becomes a SUM of per-branch banded dots (a conv over a
  channel concat splits exactly), so no concat is materialised.
- ``mel`` raw branches run IN-KERNEL when n_fft == hop (the shipped
  geometry): the windowed real-DFT is a strided banded conv table, |.|^2 a
  'square' activation, and the mel projection a 1x1 [fb; fb] conv +
  'log1e5' — three stream ops, numerics matching audio/mel.py's matmul
  path. Other geometries keep the XLA mel as a folded side input.
- The parameter tree is IDENTICAL to the interpreter's: weights are
  collected through the same NormConv1d submodules (weights_only=True) at
  the same flax paths, so checkpoints and the ensemble vmap are unaffected.

Raises :class:`StreamUnsupported` (before creating any parameters) when the
subtree is not of this family; the interpreter path is the fallback.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from hifigan_tpu.ops.pallas.stream_graph import (
    Edge,
    Level,
    Op,
    Segment,
    fold_stream,
    fused_stream_graph,
    stream_conv,
    unfold_stream,
)


class StreamUnsupported(Exception):
    """Config subtree is not a recognised all-in-one member."""


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# static parse (no parameters created — safe to fall back after)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Conv:
    chin: int
    chout: int
    k: int
    s: int
    d: int
    init: float
    norm: str
    name: str  # flax submodule name suffix-path (interpreter-identical)


@dataclasses.dataclass(frozen=True)
class _Block:
    rech: _Conv  # the conv of conv_rech (chout = s * chin), rechannels to c_out
    c_out: int  # rechannel target channels
    roll_cfg: tuple  # normalized roll node
    mel_cfg: tuple | None  # normalized mel node (or None)
    mid: _Conv
    res: _Conv
    lrelu: float
    res_tags: tuple = ("all_in_one",)


@dataclasses.dataclass(frozen=True)
class _MemberPlan:
    before: _Conv
    before_slope: float
    blocks: tuple
    after: _Conv
    heads: tuple  # one _Conv per captured feature (cycled process layers)
    before_tags: tuple = ("all_in_one",)


def _expect(cond, what):
    if not cond:
        raise StreamUnsupported(what)


def _expect_node(cfg, name):
    _expect(
        isinstance(cfg, tuple) and len(cfg) == 4 and cfg[0] == "#node"
        and cfg[1] == name,
        f"expected node {name}, got {cfg[:2] if isinstance(cfg, tuple) else cfg}",
    )
    return cfg[2], cfg[3]


def _expect_seq(cfg, n):
    _expect(
        isinstance(cfg, tuple) and len(cfg) == 2 and cfg[0] == "#seq"
        and len(cfg[1]) == n,
        f"expected #seq of {n}",
    )
    return cfg[1]


def _norm_name(norm_type) -> str:
    if norm_type == "spectral":
        return "spectral"
    if norm_type == "none":
        return "none"
    return "weight"


def _parse_conv(cfg, path, *, rech=False) -> _Conv:
    """conv / conv_rech / conv_shuffle(g=1) node -> _Conv + interpreter name."""
    kind = cfg[1] if isinstance(cfg, tuple) and len(cfg) == 4 else None
    if kind == "conv_shuffle":
        p, tags = _expect_node(cfg, "conv_shuffle")
        _expect(not tags, "tagged conv_shuffle")
        p = list(p)
        chin, chout, k = int(p[0]), int(p[1]), int(p[2])
        s = int(p[3]) if len(p) > 3 else 1
        d = int(p[4]) if len(p) > 4 else 1
        g = int(p[5]) if len(p) > 5 else 1
        _expect(g == 1, "grouped conv_shuffle")
        init = float(p[6]) if len(p) > 6 else 0.01
        # g==1 conv_shuffle lowers to a conv at path f"{path}_cs"
        # (module._node) -> NormConv1d name f"{path}_cs_conv"
        return _Conv(chin, chout, k, s, d, init, "weight", f"{path}_cs_conv")
    if rech:
        p, tags = _expect_node(cfg, "conv_rech")
        _expect(not tags, "tagged conv_rech")
        p = list(p)
        chin, chout, k = int(p[0]), int(p[1]), int(p[2])
        s = p[3] if len(p) > 3 else None
        if s is None:
            s = chout // math.gcd(chin, chout)
        s = int(s)
        d = int(p[4]) if len(p) > 4 else 1
        g = int(p[5]) if len(p) > 5 else 1
        _expect(g == 1, "grouped conv_rech")
        init = float(p[6]) if len(p) > 6 else 0.01
        # conv_rech's conv has features = s*chin then rechannels to chout
        return _Conv(chin, s * chin, k, s, d, init, "weight",
                     f"{path}_convrech")
    p, tags = _expect_node(cfg, "conv")
    _expect(not tags, "tagged conv")
    p = list(p)
    chin, chout, k = int(p[0]), int(p[1]), int(p[2])
    s = int(p[3]) if len(p) > 3 else 1
    d = int(p[4]) if len(p) > 4 else 1
    g = int(p[5]) if len(p) > 5 else 1
    _expect(g == 1, "grouped conv")
    init = float(p[6]) if len(p) > 6 else 0.01
    norm = _norm_name(p[7]) if len(p) > 7 else "weight"
    return _Conv(chin, chout, k, s, d, init, norm, f"{path}_conv")


def _parse_lrelu(cfg, *, want_tag):
    p, tags = _expect_node(cfg, "lrelu")
    _expect(bool(tags) == want_tag, "unexpected lrelu tagging")
    return float(p), tags


def parse_member(p, path: str) -> _MemberPlan:
    """Parse a normalized pfmap(all_in_one_discriminator) params tuple."""
    sub_cfg, capture_tags, feature_models = p
    aiod_p, aiod_tags = _expect_node(sub_cfg, "all_in_one_discriminator")
    _expect(not aiod_tags, "tagged all_in_one_discriminator")
    before_cfg, blocks_cfgs, after_cfg = aiod_p

    bpath = f"{path}_pfm_aiod_b"
    bconv_cfg, blrelu_cfg = _expect_seq(before_cfg, 2)
    before = _parse_conv(bconv_cfg, f"{bpath}_0")
    before_slope, btags = _parse_lrelu(blrelu_cfg, want_tag=True)
    _expect(any(t in capture_tags for t in btags), "before lrelu not captured")
    _expect(before.s == 1, "strided before conv")

    blocks = []
    for j, bc in enumerate(blocks_cfgs):
        aib_p, aib_tags = _expect_node(bc, "all_in_one_block")
        _expect(not aib_tags, "tagged all_in_one_block")
        bseq, raws, aseq = aib_p
        jpath = f"{path}_pfm_aiod_{j}"
        rech_cfg, rlrelu = _expect_seq(bseq, 2)
        rech = _parse_conv(rech_cfg, f"{jpath}_aib_b_0", rech=True)
        slope, _ = _parse_lrelu(rlrelu, want_tag=False)
        _expect(len(raws) in (1, 2), "raw branch count")
        roll_p, roll_tags = _expect_node(raws[0], "roll")
        _expect(not roll_tags, "tagged roll")
        mel_cfg = None
        if len(raws) == 2:
            _expect_node(raws[1], "mel")
            _expect(not raws[1][3], "tagged mel")
            mel_cfg = raws[1]
        mid_cfg, mlrelu, res_cfg, plrelu = _expect_seq(aseq, 4)
        apath = f"{jpath}_aib_a"
        mid = _parse_conv(mid_cfg, f"{apath}_0")
        _parse_lrelu(mlrelu, want_tag=False)
        res_p, res_tags = _expect_node(res_cfg, "res")
        _expect(any(t in capture_tags for t in res_tags), "res not captured")
        res = _parse_conv(res_p, f"{apath}_2_res")
        _parse_lrelu(plrelu, want_tag=False)
        res_tags = tuple(res_tags)

        period = roll_p[0] if isinstance(roll_p, (tuple, list)) else roll_p
        c_out = int(period)
        pad_mode = (
            roll_p[1]
            if isinstance(roll_p, (tuple, list)) and len(roll_p) > 1
            else "constant"
        )
        _expect(pad_mode == "constant", "reflect roll padding")
        _expect(rech.chout % c_out == 0, "rechannel divisibility")
        n_br = 2 + (mel_cfg is not None)
        _expect(mid.chin == n_br * c_out and mid.chout == c_out, "mid shape")
        _expect(mid.s == 1 and mid.d == 1, "mid conv stride/dilation")
        _expect(res.chin == c_out and res.chout == c_out and res.s == 1,
                "res shape")
        blocks.append(
            _Block(rech, c_out, raws[0], mel_cfg, mid, res, slope, res_tags)
        )

    aconv_cfg, atanh = _expect_seq(after_cfg, 2)
    _expect_node(atanh, "tanh")
    after = _parse_conv(aconv_cfg, f"{path}_pfm_aiod_a_0")
    _expect(after.s == 1, "strided after conv")

    n_feat = 1 + len(blocks)
    heads = []
    for i in range(n_feat):
        fm = feature_models[i % len(feature_models)]
        hconv_cfg, htanh = _expect_seq(fm, 2)
        _expect_node(htanh, "tanh")
        head = _parse_conv(hconv_cfg, f"{path}_pfmm{i}_0")
        _expect(head.chout == 1 and head.s == 1, "head shape")
        heads.append(head)
    _expect(heads[0].chin == before.chout, "head0 channels")
    for i, blk in enumerate(blocks):
        _expect(heads[i + 1].chin == blk.c_out, f"head{i + 1} channels")
    return _MemberPlan(before, before_slope, tuple(blocks), after,
                       tuple(heads), tuple(btags))


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _fold_level(x, f, *, is_input):
    """(B, t, c) -> folded input array + its Level record."""
    b, t, c = x.shape
    rows = _cdiv(t, f)
    rem = t % f
    lvl = Level(
        t_rows=rows, lanes=f * c, is_input=is_input,
        lane_valid=rem * c if rem else 0,
    )
    return fold_stream(x, f), lvl


def _dsl_padding(kernel: int, stride: int = 1, dilation: int = 1) -> int:
    return ((kernel - 1) * dilation + 1) // 2


def _lower_mel_branch(module, sb, mel_cfg, raw, f2, dt, t0):
    """Lower a 'mel' raw branch to three in-kernel stream ops, or None.

    For the shipped geometry (n_fft == win == hop == out_ch, the mel nodes
    emitted by static_configs.get_mel_raw_block) the log-mel is exactly:
    frames are a stride-hop stream conv with the windowed real-DFT basis as
    its (n_fft, 1, 2*n_bins) table, |.|^2 is a 'square' activation, and the
    mel projection is a 1x1 conv with the stacked [fb; fb] filterbank +
    'log1e5' activation — numerics identical to audio/mel.py's matmul path
    (periodic Hann, onesided DFT, power 2, HTK fbank, log(clip(x, 1e-5))).
    The bare XLA mel node measured 1.8 ms at production scale
    (docs/OPERATIONS.md) — in-kernel it rides the same VMEM-resident zones.
    """
    from hifigan_tpu.audio.mel import mel_filterbank
    from hifigan_tpu.audio.stft import _rdft_basis, hann_window
    from hifigan_tpu.dsl.module import padding_period

    p = mel_cfg[2]
    sr, out_ch, k, s = (int(v) for v in p[:4])
    if module.mel_sampling_rate_override:
        sr = module.mel_sampling_rate_override
    if k != s:  # overlapping frames need reflect padding — stay on XLA
        return None
    lo, hi = padding_period(t0, s)
    raw_p = raw if lo == hi == 0 else jnp.pad(
        raw, ((0, 0), (lo, hi), (0, 0))
    )
    t_p = t0 + lo + hi
    n_bins = k // 2 + 1
    basis = _rdft_basis(k, k) * hann_window(k)[:, None]  # (k, 2*n_bins)
    w1 = jnp.asarray(basis, jnp.float32)[:, None, :]  # (k, 1, 2*n_bins)
    fb = mel_filterbank(sr, k, out_ch, 0.0, None, "htk", None)
    w2 = jnp.concatenate(
        [jnp.asarray(fb, jnp.float32)] * 2, axis=0
    )[None]  # (1, 2*n_bins, out_ch)

    pin = sb.add_input(raw_p.astype(dt), s * f2)
    ce1 = stream_conv(
        w1.astype(dt), None, f_in=s * f2, f_out=f2, t_in=t_p, s=s, pad=0
    )
    z = sb.add_op([(pin, ce1)], "none", 1.0, None,
                  t_out=ce1.t_out, c_out=2 * n_bins, f_out=f2)
    sq = sb.add_op([], "square", 1.0, z,
                   t_out=ce1.t_out, c_out=2 * n_bins, f_out=f2)
    ce2 = stream_conv(
        w2.astype(dt), None, f_in=f2, f_out=f2, t_in=ce1.t_out, s=1, pad=0
    )
    mel = sb.add_op([(sq, ce2)], "log1e5", 1.0, None,
                    t_out=ce2.t_out, c_out=out_ch, f_out=f2)
    return mel, ce2.t_out, out_ch


class _SegBuilder:
    """Accumulates levels/ops/tables for one fused segment."""

    def __init__(self, interpret: bool, weight_grads: bool = True,
                 mesh=None, batch_axis: str = "data"):
        self.levels: list[Level] = []
        self.inputs: list = []  # folded input arrays, level order
        self.ops: list[Op] = []
        self.tables: list = []
        self.biases: list = []
        self.interpret = interpret
        self.weight_grads = weight_grads
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.meta: list = []  # (t, c, f) per level, for unfolds

    def add_input(self, x, f):
        z, lvl = _fold_level(x, f, is_input=True)
        self.levels.append(lvl)
        self.inputs.append(z)
        self.meta.append((x.shape[1], x.shape[2], f))
        return len(self.levels) - 1

    def add_op(self, edges_spec, act, slope, res_from, *, t_out, c_out, f_out,
               lanes=None, lane_valid=None):
        """edges_spec: [(src_idx, ConvEdge)]; first edge carries the bias."""
        edges = []
        bias = None
        for src, ce in edges_spec:
            edges.append(Edge(src, ce.kk, ce.pad_l, ce.pad_r))
            self.tables.append(ce.table)
            if bias is None and ce.zbias is not None:
                bias = ce.zbias.reshape(1, -1).astype(jnp.float32)
        rows = _cdiv(t_out, f_out)
        if lanes is None:
            lanes = f_out * c_out
        if lane_valid is None:
            rem = t_out % f_out
            lane_valid = rem * c_out if rem else 0
        lvl = Level(t_rows=rows, lanes=lanes, lane_valid=lane_valid)
        self.levels.append(lvl)
        out_idx = len(self.levels) - 1
        if bias is None:
            bias = jnp.zeros((1, lanes), jnp.float32)
        self.biases.append(bias)
        self.ops.append(
            Op(out=out_idx, edges=tuple(edges), act=act, slope=slope,
               res_from=res_from)
        )
        self.meta.append((t_out, c_out, f_out))
        return out_idx

    def run(self):
        seg = Segment(levels=tuple(self.levels), ops=tuple(self.ops))
        outs = fused_stream_graph(
            seg, self.inputs, self.tables, self.biases,
            interpret=self.interpret, weight_grads=self.weight_grads,
            mesh=self.mesh, batch_axis=self.batch_axis,
        )
        # map produced-level index -> output array
        produced = [i for i, lvl in enumerate(self.levels) if not lvl.is_input]
        return {li: outs[k] for k, li in enumerate(produced)}

    def unfold(self, outs, li):
        t, c, _f = self.meta[li]
        return unfold_stream(outs[li], c, t)


def eval_member_pfmap(module, p, args, path: str, *, interpret: bool,
                      plan: _MemberPlan | None = None,
                      weight_grads: bool = True,
                      mesh=None, batch_axis: str = "data"):
    """Fused evaluation of a pfmap(all_in_one_discriminator) node.

    Mirrors ConfigurableModule._node's 'pfmap' contract: returns
    ``({'output': ..., 'features': [...]}, feats)`` where feats carries the
    'all_in_one'-tagged captures in interpreter order. Parameters are
    created through the same NormConv1d names as the interpreter would.
    ``plan``: the caller's already-parsed _MemberPlan (the gate in
    ConfigurableModule._node parses to pattern-check; avoid re-parsing).
    ``mesh``/``batch_axis``: run the fused kernels under jax.shard_map with
    the waveform batch split over the mesh's data axis (weights replicated)
    — the multi-chip DP wiring (fused_stream_graph docstring).
    """
    from hifigan_tpu.models.layers import NormConv1d

    if plan is None:
        plan = parse_member(p, path)

    raw = args[0]
    _expect(raw.ndim == 3 and raw.shape[-1] == 1, "raw input shape")
    b, t0, _ = raw.shape
    dt = raw.dtype

    def weights(cs: _Conv):
        kb = NormConv1d(
            features=cs.chout,
            kernel_size=cs.k,
            stride=cs.s,
            dilation=cs.d,
            padding=_dsl_padding(cs.k, cs.s, cs.d),
            norm=cs.norm,
            init_std=cs.init,
            weights_only=True,
            name=cs.name,
        )(jnp.zeros((1, 1, cs.chin), dt), module.update_spectral)
        return kb  # (kernel (K, chin, chout), bias)

    # ---- static fold choices per block ----
    # conv_rech output c1 = s*chin at fold f1 (lanes ~128); its input needs
    # fold s*f1 (sigma == 1); internals rechannel to c_out at f2 = L/c_out.
    blk_folds = []
    for blk in plan.blocks:
        c1 = blk.rech.chout
        f1 = max(1, _cdiv(128, c1))
        L = f1 * c1
        _expect(L % blk.c_out == 0, "fold/rechannel mismatch")
        blk_folds.append((f1, blk.rech.s * f1, L // blk.c_out))

    feats = []
    heads_out = []

    x_prev = None  # unfolded (B, t, c) chain value between segments
    t_prev = None
    out_final = None

    for j, blk in enumerate(plan.blocks):
        f1, f_in, f2 = blk_folds[j]
        sb = _SegBuilder(interpret, weight_grads, mesh, batch_axis)
        jpath = f"{path}_pfm_aiod_{j}"

        if j == 0:
            # fuse the discriminator's before layer + its head into seg 0
            _expect(plan.before.chin == 1, "before channels")
            _expect(plan.blocks[0].rech.chin == plan.before.chout,
                    "before/rech channels")
            src = sb.add_input(raw, f_in)
            kb, bb = weights(plan.before)
            ce = stream_conv(
                kb, bb, f_in=f_in, f_out=f_in, t_in=t0, s=1,
                pad=_dsl_padding(plan.before.k, 1, plan.before.d),
                dilation=plan.before.d,
            )
            # the bef level shares the raw's time fold (s == 1): rows align
            # with the rech conv's required input fold f_in = s * f1
            bef = sb.add_op([(src, ce)], "lrelu", plan.before_slope, None,
                            t_out=ce.t_out, c_out=plan.before.chout,
                            f_out=f_in)
            # head 0 consumes the (post-lrelu) before feature
            kh, bh = weights(plan.heads[0])
            ceh = stream_conv(
                kh, bh, f_in=f_in, f_out=f_in, t_in=ce.t_out, s=1,
                pad=_dsl_padding(plan.heads[0].k, 1, plan.heads[0].d),
                dilation=plan.heads[0].d,
            )
            h0 = sb.add_op([(bef, ceh)], "tanh", 1.0, None,
                           t_out=ceh.t_out, c_out=1, f_out=f_in)
            chain_src, t_chain = bef, ce.t_out
        else:
            chain_src = sb.add_input(x_prev, f_in)
            t_chain = t_prev

        # conv_rech: banded conv to c1 = s*chin at fold f1, then the
        # rechannel to c_out is a fold-metadata change on the same level
        kr, br = weights(blk.rech)
        cer = stream_conv(
            kr, br, f_in=f_in, f_out=f1, t_in=t_chain, s=blk.rech.s,
            pad=_dsl_padding(blk.rech.k, blk.rech.s, blk.rech.d),
            dilation=blk.rech.d,
        )
        rech = sb.add_op([(chain_src, cer)], "lrelu", blk.lrelu, None,
                         t_out=cer.t_out, c_out=blk.rech.chout, f_out=f1)
        stream_len = cer.t_out * blk.rech.chout
        _expect(stream_len % blk.c_out == 0, "rechannel stream divisibility")
        t_x = stream_len // blk.c_out
        # reinterpret: same level viewed as (t_x, c_out) at fold f2
        sb.meta[rech] = (t_x, blk.c_out, f2)

        # raw branches (XLA): roll reshape + optional mel
        roll_v, roll_f = module._eval(blk.roll_cfg, (raw,), f"{jpath}_aib_r0")
        assert not roll_f
        _expect(roll_v.shape[-1] == blk.c_out, "roll channels")
        roll_li = sb.add_input(roll_v.astype(dt), f2)
        branches = [(rech, t_x), (roll_li, roll_v.shape[1])]
        if blk.mel_cfg is not None:
            low = _lower_mel_branch(module, sb, blk.mel_cfg, raw, f2, dt, t0)
            if low is not None:
                mel_li, mel_t, mel_c = low
                _expect(mel_c == blk.c_out, "mel channels")
                branches.append((mel_li, mel_t))
            else:  # unsupported mel geometry: XLA branch fed as an input
                mel_v, mel_f = module._eval(
                    blk.mel_cfg, (raw,), f"{jpath}_aib_r1"
                )
                assert not mel_f
                _expect(mel_v.shape[-1] == blk.c_out, "mel channels")
                mel_li = sb.add_input(mel_v.astype(dt), f2)
                branches.append((mel_li, mel_v.shape[1]))

        max_len = max(t for _li, t in branches)
        km, bm = weights(blk.mid)
        pad_m = _dsl_padding(blk.mid.k, 1, 1)
        edges = []
        for bi, (li, _t) in enumerate(branches):
            cem = stream_conv(
                km[:, bi * blk.c_out : (bi + 1) * blk.c_out, :],
                bm if bi == 0 else None,
                f_in=f2, f_out=f2, t_in=max_len, s=1, pad=pad_m,
            )
            edges.append((li, cem))
        t_mid = edges[0][1].t_out
        mid = sb.add_op(edges, "lrelu", blk.lrelu, None,
                        t_out=t_mid, c_out=blk.c_out, f_out=f2)

        kres, bres = weights(blk.res)
        ceres = stream_conv(
            kres, bres, f_in=f2, f_out=f2, t_in=t_mid, s=1,
            pad=_dsl_padding(blk.res.k, 1, blk.res.d), dilation=blk.res.d,
        )
        res = sb.add_op([(mid, ceres)], "none", 1.0, mid,
                        t_out=ceres.t_out, c_out=blk.c_out, f_out=f2)
        post = sb.add_op([], "lrelu", blk.lrelu, res,
                         t_out=ceres.t_out, c_out=blk.c_out, f_out=f2)

        kh, bh = weights(plan.heads[j + 1])
        ceh = stream_conv(
            kh, bh, f_in=f2, f_out=f2, t_in=ceres.t_out, s=1,
            pad=_dsl_padding(plan.heads[j + 1].k, 1, plan.heads[j + 1].d),
            dilation=plan.heads[j + 1].d,
        )
        head = sb.add_op([(res, ceh)], "tanh", 1.0, None,
                         t_out=ceh.t_out, c_out=1, f_out=f2)

        after_li = None
        if j == len(plan.blocks) - 1:
            _expect(plan.after.chin == blk.c_out, "after channels")
            ka, ba = weights(plan.after)
            cea = stream_conv(
                ka, ba, f_in=f2, f_out=f2, t_in=ceres.t_out, s=1,
                pad=_dsl_padding(plan.after.k, 1, plan.after.d),
                dilation=plan.after.d,
            )
            after_li = sb.add_op([(post, cea)], "tanh", 1.0, None,
                                 t_out=cea.t_out, c_out=plan.after.chout,
                                 f_out=f2)

        outs = sb.run()
        if j == 0:
            feats.append((plan.before_tags, sb.unfold(outs, bef)))
            heads_out.append(sb.unfold(outs, h0))
        feats.append((blk.res_tags, sb.unfold(outs, res)))
        heads_out.append(sb.unfold(outs, head))
        x_prev = sb.unfold(outs, post)
        t_prev = x_prev.shape[1]
        if after_li is not None:
            out_final = sb.unfold(outs, after_li)

    # reorder heads to the interpreter's capture order: captured features are
    # [before, res_0..res_{n-1}] and heads were appended in that order already
    return {"output": out_final, "features": heads_out}, feats
