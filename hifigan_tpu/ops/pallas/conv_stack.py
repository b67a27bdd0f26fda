"""Whole-stack fused Pallas conv1d chains (an MSD scale in 1-2 kernels).

Why: the MSD (reference src/models.py:191-217) is the vocoder train step's
sink. A per-op xplane trace of MSD fwd+bwd at B16x8192 bf16 shows 35.3 ms of
REAL device time, 30.1 ms of it in 138 separate convolution fusions running
at ~91 GB/s effective (~11% of v5e HBM peak) — XLA's grouped-conv lowering
tiles the tiny per-group features (8-64 << the 128 lanes) terribly, and every
conv round-trips HBM. Fusing a whole DiscriminatorS stack into one Pallas
kernel keeps every intermediate activation VMEM-resident and turns each conv
into full-height MXU tap dots.

Design (per kernel invocation = one "segment" of consecutive layers):

- **Zoned activation layout.** Each level's activation lives in a VMEM
  scratch of ``rows x C`` with the E batch elements of a grid step laid out
  at a fixed zone pitch Z: elem e's t valid rows sit at
  ``LEAD + e*Z + G + [0, t)``; everything else (lead-in, inter-elem guards,
  tail) is zeros. Guards double as conv padding, so EVERY conv in the chain
  — strided or not, for all E elements at once — is a tap loop of
  full-height MXU dots ``acc[0:rows'] += xf[st0+q : st0+q+rows'] @ Wq``:
  one dot per (phase, tap, group-block), no per-element loop.
- **Stride via lane folding.** A stride-s layer reads its input through a
  free reshape ``(rows, C) -> (rows/s, s*C)`` (requires C >= 128 — Mosaic
  relayout constraint, probed); phase p of tap k is a contiguous lane slice
  at ``p*C``. Zone pitches divide by the stride chain, keeping the fold
  phase of every (elem, tap) pair static.
- **Groups as block-dense lane blocks.** Per-group features are grown to
  MXU-worthy sizes by densifying `gpb` groups per block (exact:
  off-diagonal zeros), `gpb` the smallest power-of-two that pushes a block
  side to 128 lanes — the measured sweet spot between FLOP blowup and lane
  waste (docs/OPERATIONS.md grouped-conv experiments).
- **Small-T tail batching.** Once t_out drops, per-element dots starve the
  MXU pipeline, so late layers run in a second kernel with E > 1 elements
  per grid step — the zoned layout turns E small convs into one tall dot.
- **Custom VJP, fused both ways.** The backward runs the same zoned chains
  top-down: transposed-conv accumulation into a folded f32 scratch with the
  SAME static slice table, leaky-relu masking from the saved post-activation
  maps (the slope preserves sign, so no pre-activations are stored),
  in-kernel weight-grad dots (accumulated across the batch grid) and bias
  row-reductions. Weight grads of huge dense tail layers (the 1024->1024 k5
  layer: 21 MB of f32 accumulator) instead use a handful of XLA tap einsums
  on cotangents the kernel exports.

The op consumes effective (post weight-norm/spectral-norm) kernels; the
pack transforms are plain differentiable jnp ops OUTSIDE the custom_vjp, so
norm parameterisations autodiff through unchanged.

Validated against the XLA conv chain in interpreter mode
(tests/test_pallas_conv_stack.py: fwd + input/weight/bias grads for all MSD
scale geometries) and on hardware by train-step parity.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_derivatives import SymbolicZero
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# last backward's per-layer output-cotangent liveness (debug/tests only:
# asserts the symbolic-zero dy skip actually engaged for a given traversal)
LAST_BWD_DY_MASK: tuple[bool, ...] | None = None
# last backward's (input_perturbed, weights_perturbed) detection (debug/tests)
LAST_BWD_PERTURBED: tuple[bool, bool] | None = None


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _BwdFlags:
    """Trace-time AD facts smuggled from fwd to bwd through the residual
    pytree's STRUCTURE (register_static: no array leaves): whether the stack
    input and any weight/bias are actually being differentiated. Lets the
    backward skip the dx chain-out (D update: real audio + stop-gradient
    fake — input never perturbed) / the dW dots (G update) without relying
    on the caller's explicit declaration."""

    x_perturbed: bool
    w_perturbed: bool


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, m: int) -> int:
    return _cdiv(a, m) * m


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One conv1d (+ optional leaky-relu) layer of a fused stack."""

    c_out: int
    kernel: int
    stride: int = 1
    groups: int = 1
    pad_l: int = 0
    pad_r: int = 0
    slope: float = 1.0  # leaky-relu slope applied after the conv; 1.0 = none
    # partial last row (group time-fold with a sample count that does not
    # divide the fold): when lane_period > 0, the LAST valid output row of
    # every element keeps only lanes with lane % lane_period < lane_valid;
    # the rest are zeroed (they are fold padding, not real samples)
    lane_period: int = 0
    lane_valid: int = 0


# max f32 VMEM a single layer's in-kernel weight-grad accumulator may take;
# bigger layers (the dense tails) export their cotangent for XLA tap einsums
_DW_KERNEL_BYTES = 12 * 1024 * 1024


@dataclasses.dataclass
class _LayerPlan:
    spec: LayerSpec
    c_in: int
    t_in: int
    t_out: int
    s: int
    gpb: int
    nb: int
    cb_in: int
    cb_out: int
    tq: int  # folded tap-loop trip count
    st0: int  # base folded-row slice start
    kmap: tuple  # ((p, q, k) ...) valid tap placements
    rows_in: int  # rows of the input activation level (unfolded)
    rows_out: int
    lead_out: int
    g_out: int
    z_out: int
    dw_in_kernel: bool

    @property
    def wq_shape(self) -> tuple[int, ...]:
        # canonical per-tap layout — independent of the segment plan's lead
        # geometry, so forward segments and backward chunks share one packing
        return (self.spec.kernel, self.nb, self.cb_in, self.cb_out)


@dataclasses.dataclass
class _SegmentPlan:
    layers: list[_LayerPlan]
    e: int  # batch elements per grid step
    t_in: int
    c_in: int
    rows_in: int
    lead_in: int
    g_in: int
    z_in: int


def _choose_gpb(groups: int, ci_g: int, co_g: int) -> int:
    """Smallest power-of-two group block reaching 128 lanes on a side."""
    gpb = 1
    while gpb < groups and ci_g * gpb < 128 and co_g * gpb < 128:
        gpb *= 2
    while groups % gpb:
        gpb //= 2
    return max(gpb, 1)


def _plan_segment(
    specs: Sequence[LayerSpec], t_in: int, c_in: int, e: int
) -> _SegmentPlan:
    """Static geometry for one fused segment (zones, folds, slice table)."""
    n = len(specs)
    t = [t_in]
    cs = [c_in]
    for sp in specs:
        t_o = (t[-1] + sp.pad_l + sp.pad_r - sp.kernel) // sp.stride + 1
        assert t_o >= 1, (t[-1], sp)
        t.append(t_o)
        cs.append(sp.c_out)
    # ---- zone pitches: Z_l = Z_0 / prod(strides), every level 8-aligned ----
    prods = [1]
    for sp in specs:
        prods.append(prods[-1] * sp.stride)
    g_off = [specs[l].pad_l if l < n else 0 for l in range(n + 1)]
    z0 = 8 * prods[-1]
    for l in range(n + 1):
        need = g_off[l] + t[l] + (specs[l].pad_r if l < n else 0)
        z0 = max(z0, _round_up(need * prods[l], 8 * prods[-1]))
    z = [z0 // prods[l] for l in range(n + 1)]
    # ---- leads: the base slice start st0 must be >= 0 at every layer ----
    lead = [0] * (n + 1)
    for _ in range(n + 2):
        ok = True
        for l in range(n):
            sp = specs[l]
            o = lead[l] + g_off[l] - sp.pad_l
            nxt = o // sp.stride - g_off[l + 1]
            if nxt < 0:
                lead[0] += (-nxt) * prods[l + 1]
                ok = False
                break
            lead[l + 1] = nxt
        if ok:
            break
    else:  # pragma: no cover
        raise AssertionError("lead planning did not converge")
    # ---- rows per level, back to front (layer l's acc spans level l+1) ----
    rows = [0] * (n + 1)
    rows[n] = _round_up(lead[n] + e * z[n], 8)
    for l in range(n - 1, -1, -1):
        sp = specs[l]
        s = sp.stride
        o = lead[l] + g_off[l] - sp.pad_l
        max_start = (o + sp.kernel - 1) // s - (lead[l + 1] + g_off[l + 1])
        reach = (max_start + rows[l + 1]) * s
        align = 8 * s // math.gcd(8, s)
        rows[l] = _round_up(max(lead[l] + e * z[l], reach), align)

    layers: list[_LayerPlan] = []
    for l in range(n):
        sp = specs[l]
        s = sp.stride
        g = sp.groups
        ci_g = cs[l] // g
        co_g = sp.c_out // g
        gpb = _choose_gpb(g, ci_g, co_g)
        o = lead[l] + g_off[l] - sp.pad_l
        st0 = o // s - (lead[l + 1] + g_off[l + 1])
        assert st0 >= 0, (l, st0)
        q0 = o // s
        tq = (o + sp.kernel - 1) // s - q0 + 1
        kmap = tuple(
            ((o + k) % s, (o + k) // s - q0, k) for k in range(sp.kernel)
        )
        lp = _LayerPlan(
            spec=sp, c_in=cs[l], t_in=t[l], t_out=t[l + 1], s=s,
            gpb=gpb, nb=g // gpb, cb_in=ci_g * gpb, cb_out=co_g * gpb,
            tq=tq, st0=st0, kmap=kmap, rows_in=rows[l], rows_out=rows[l + 1],
            lead_out=lead[l + 1], g_out=g_off[l + 1], z_out=z[l + 1],
            dw_in_kernel=True,
        )
        lp.dw_in_kernel = 4 * int(np.prod(lp.wq_shape)) <= _DW_KERNEL_BYTES
        if s > 1:
            assert cs[l] >= 128, (
                f"stride-{s} layer {l} needs >=128 input channels for the "
                f"in-kernel fold (got {cs[l]})"
            )
        layers.append(lp)
    return _SegmentPlan(
        layers=layers, e=e, t_in=t_in, c_in=c_in, rows_in=rows[0],
        lead_in=lead[0], g_in=g_off[0], z_in=z[0],
    )


def _valid_row_mask(rows: int, lead: int, g: int, z: int, t: int, e: int):
    """(rows, 1) f32 mask selecting the e valid data regions."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    m = jnp.zeros((rows, 1), jnp.float32)
    for i in range(e):
        a = lead + i * z + g
        m = m + jnp.where((r >= a) & (r < a + t), 1.0, 0.0)
    return m


def _apply_valid_mask(vals, lp: _LayerPlan, e: int):
    """Zero everything outside the valid zone rows; when the layer has a
    partial last row (group time-fold, lane_period > 0), also zero that
    row's fold-padding lanes."""
    sp = lp.spec
    partial = sp.lane_period > 0 and sp.lane_valid < sp.lane_period
    rows, lead, g, z, t = lp.rows_out, lp.lead_out, lp.g_out, lp.z_out, lp.t_out
    if not partial:
        return vals * _valid_row_mask(rows, lead, g, z, t, e)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    full = jnp.zeros((rows, 1), jnp.float32)
    part = jnp.zeros((rows, 1), jnp.float32)
    for i in range(e):
        a = lead + i * z + g
        full = full + jnp.where((r >= a) & (r < a + t - 1), 1.0, 0.0)
        part = part + jnp.where(r == a + t - 1, 1.0, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sp.c_out), 1)
    lmask = jnp.where(lane % sp.lane_period < sp.lane_valid, 1.0, 0.0)
    return vals * full + vals * (part * lmask)


def _tap_loop(lp: _LayerPlan, xf_ref, w_ref, body_fn):
    """Run body_fn(k, block, q, lane0, co0, xsl, w) over valid taps/blocks.

    Statically unrolled over the kmap: Mosaic requires row offsets of VMEM
    vector loads/stores to be provably aligned, which a fori_loop index is
    not — and the static form also skips the (p, q) cells whose weight
    block is all-zeros (s*tq - K cells per layer). xf_ref is the (folded
    when s>1) input level ref; slices are full-height
    ([st0+q : st0+q+rows_out]) so every element is covered by one dot.
    """
    c_in, s = lp.c_in, lp.s
    for p, q, k in lp.kmap:
        for b in range(lp.nb):
            lane0 = (p * c_in if s > 1 else 0) + b * lp.cb_in
            co0 = b * lp.cb_out
            xsl = (
                xf_ref[pl.ds(lp.st0 + q, lp.rows_out), lane0 : lane0 + lp.cb_in]
                if xf_ref is not None
                else None  # need_dw=False backward: nothing reads the input
            )
            w = w_ref[k, b]
            body_fn(k, b, q, lane0, co0, xsl, w)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(plan: _SegmentPlan, refs):
    n = len(plan.layers)
    x_ref = refs[0]
    w_refs = refs[1 : 1 + n]
    b_refs = refs[1 + n : 1 + 2 * n]
    y_refs = refs[1 + 2 * n : 1 + 3 * n]
    scratch = list(refs[1 + 3 * n :])
    # scratch order: lvl0 plain; xf_0 (if fold); per layer 1..n-1 an input
    # ref (folded iff that layer strides); per layer an f32 acc
    lvl0 = scratch.pop(0)
    in_refs = []
    for l, lp in enumerate(plan.layers):
        if l == 0:
            in_refs.append(scratch.pop(0) if lp.s > 1 else lvl0)
        else:
            in_refs.append(scratch.pop(0))
    acc_refs = scratch

    e, t0 = plan.e, plan.t_in
    lvl0[...] = jnp.zeros_like(lvl0)
    for i in range(e):
        a = plan.lead_in + i * plan.z_in + plan.g_in
        lvl0[a : a + t0, :] = x_ref[i]
    lp0 = plan.layers[0]
    if lp0.s > 1:
        in_refs[0][...] = lvl0[...].reshape(
            lp0.rows_in // lp0.s, lp0.s * lp0.c_in
        )

    for l, lp in enumerate(plan.layers):
        acc = acc_refs[l]
        acc[...] = jnp.broadcast_to(b_refs[l][...], (lp.rows_out, lp.spec.c_out))

        def dot_body(k, b, q, lane0, co0, xsl, w, acc=acc, lp=lp):
            acc[:, co0 : co0 + lp.cb_out] += jnp.dot(
                xsl, w, preferred_element_type=jnp.float32
            )

        _tap_loop(lp, in_refs[l], w_refs[l], dot_body)
        z = acc[...]
        if lp.spec.slope != 1.0:
            z = jnp.maximum(z, 0.0) + lp.spec.slope * jnp.minimum(z, 0.0)
        z = _apply_valid_mask(z, lp, e)
        zb = z.astype(y_refs[l].dtype)
        for i in range(e):
            a = lp.lead_out + i * lp.z_out + lp.g_out
            y_refs[l][i] = zb[a : a + lp.t_out, :]
        if l + 1 < n:
            nxt = plan.layers[l + 1]
            if nxt.s > 1:
                in_refs[l + 1][...] = zb.reshape(
                    nxt.rows_in // nxt.s, nxt.s * nxt.c_in
                )
            else:
                in_refs[l + 1][...] = zb


def _fwd_pallas(plan: _SegmentPlan, x, wqs, biases, *, interpret: bool):
    n = len(plan.layers)
    n_elems = x.shape[0]
    grid = (n_elems // plan.e,)
    dt = x.dtype
    in_specs = [
        pl.BlockSpec((plan.e, plan.t_in, plan.c_in), lambda gi: (gi, 0, 0))
    ]
    in_specs += [
        pl.BlockSpec(lp.wq_shape, lambda gi: (0,) * 4) for lp in plan.layers
    ]
    in_specs += [
        pl.BlockSpec((1, lp.spec.c_out), lambda gi: (0, 0))
        for lp in plan.layers
    ]
    out_specs = [
        pl.BlockSpec((plan.e, lp.t_out, lp.spec.c_out), lambda gi: (gi, 0, 0))
        for lp in plan.layers
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_elems, lp.t_out, lp.spec.c_out), dt)
        for lp in plan.layers
    ]
    scratch = [pltpu.VMEM((plan.rows_in, plan.c_in), dt)]
    for l, lp in enumerate(plan.layers):
        if lp.s > 1:
            scratch.append(pltpu.VMEM((lp.rows_in // lp.s, lp.s * lp.c_in), dt))
        elif l > 0:
            scratch.append(pltpu.VMEM((lp.rows_in, lp.c_in), dt))
    scratch += [
        pltpu.VMEM((lp.rows_out, lp.spec.c_out), jnp.float32)
        for lp in plan.layers
    ]
    return pl.pallas_call(
        lambda *refs: _fwd_kernel(plan, refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *wqs, *biases)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    plan: _SegmentPlan, refs, need_dw: bool = True,
    dy_mask: tuple[bool, ...] | None = None, need_dx: bool = True,
):
    """Top-down zoned sweep: dZ (pre-act cotangent), transposed conv down,
    in-kernel dW/db accumulated across grid steps. ``need_dw=False`` (the
    generator-update traversal, where the discriminator weights are
    constants) skips every weight/bias-grad dot and export — XLA cannot DCE
    inside an opaque Mosaic call, so the split must be explicit here.
    ``dy_mask[l]=False`` declares layer l's output cotangent symbolically
    zero (the D-update traversal consumes only the logits, so every interior
    feature map's cotangent is a materialised-zeros array otherwise): the dy
    operand and its ``dz += dy`` add are dropped for that layer."""
    n = len(plan.layers)
    e = plan.e
    if dy_mask is None:
        dy_mask = (True,) * n
    i = 0
    if need_dw:
        x_ref = refs[i]; i += 1
    y_refs = refs[i : i + n]; i += n
    n_dy = sum(dy_mask)
    live_dy = refs[i : i + n_dy]; i += n_dy
    dy_refs = []
    di = 0
    for l in range(n):
        dy_refs.append(live_dy[di] if dy_mask[l] else None)
        di += dy_mask[l]
    w_refs = refs[i : i + n]; i += n
    dx_ref = refs[i]; i += 1
    if need_dw:
        dw_refs = refs[i : i + n]; i += n
        db_refs = refs[i : i + n]; i += n
        dz_out_refs = refs[i : i + n]; i += n
    scratch = list(refs[i:])
    in_refs = [None] * n
    if need_dw:
        lvl0 = scratch.pop(0)
        in_refs = []
        for l, lp in enumerate(plan.layers):
            if l == 0:
                in_refs.append(scratch.pop(0) if lp.s > 1 else lvl0)
            else:
                in_refs.append(scratch.pop(0))
    da_refs = scratch[:n]  # layer l's input-cotangent, folded iff s_l > 1
    dz_refs = scratch[n : 2 * n]  # (rows_out, c_out) f32

    gi = pl.program_id(0)

    if need_dw:
        # ---- rebuild zoned forward input levels (same as fwd); only the
        # weight-grad dots read them ----
        lvl0[...] = jnp.zeros_like(lvl0)
        for j in range(e):
            a = plan.lead_in + j * plan.z_in + plan.g_in
            lvl0[a : a + plan.t_in, :] = x_ref[j]
        lp0 = plan.layers[0]
        if lp0.s > 1:
            in_refs[0][...] = lvl0[...].reshape(
                lp0.rows_in // lp0.s, lp0.s * lp0.c_in
            )
        for l in range(1, n):
            lp_prev, lp = plan.layers[l - 1], plan.layers[l]
            tgt = in_refs[l]
            tgt[...] = jnp.zeros_like(tgt)
            if lp.s > 1:
                # scatter y into the folded layout: fold maps valid unfolded
                # rows [a, a+t) to folded rows [a//s ...] with static per-row
                # phases; write per element via an unfolded staging view is
                # not available, so stage through dz scratch? Instead: write
                # rows in stride-s row groups. Simpler and exact: build
                # unfolded in the (reused) dz scratch of the PREVIOUS layer
                # (same shape), then fold.
                stage = dz_refs[l - 1]  # (rows_in, c_in) f32 — correct shape
                stage[...] = jnp.zeros_like(stage)
                for j in range(e):
                    a = lp_prev.lead_out + j * lp_prev.z_out + lp_prev.g_out
                    stage[a : a + lp_prev.t_out, :] = (
                        y_refs[l - 1][j].astype(jnp.float32)
                    )
                tgt[...] = (
                    stage[...]
                    .reshape(lp.rows_in // lp.s, lp.s * lp.c_in)
                    .astype(tgt.dtype)
                )
            else:
                for j in range(e):
                    a = lp_prev.lead_out + j * lp_prev.z_out + lp_prev.g_out
                    tgt[a : a + lp_prev.t_out, :] = y_refs[l - 1][j]

        @pl.when(gi == 0)
        def _init():
            for l in range(n):
                dw_refs[l][...] = jnp.zeros_like(dw_refs[l])
                db_refs[l][...] = jnp.zeros_like(db_refs[l])

    for l in range(n - 1, -1, -1):
        lp = plan.layers[l]
        dz = dz_refs[l]
        if l == n - 1:
            dz[...] = jnp.zeros_like(dz)
        else:
            nxt = plan.layers[l + 1]
            if nxt.s > 1:
                dz[...] = da_refs[l + 1][...].reshape(lp.rows_out, lp.spec.c_out)
            else:
                dz[...] = da_refs[l + 1][...]
        for j in range(e):
            a = lp.lead_out + j * lp.z_out + lp.g_out
            if dy_refs[l] is not None:
                dz[a : a + lp.t_out, :] += dy_refs[l][j].astype(jnp.float32)
            if lp.spec.slope != 1.0:
                yv = y_refs[l][j].astype(jnp.float32)
                dz[a : a + lp.t_out, :] *= jnp.where(
                    yv >= 0.0, 1.0, lp.spec.slope
                )
        dz[...] = _apply_valid_mask(dz[...], lp, e)
        if need_dw:
            if not lp.dw_in_kernel:
                for j in range(e):
                    a = lp.lead_out + j * lp.z_out + lp.g_out
                    dz_out_refs[l][j] = dz[a : a + lp.t_out, :].astype(
                        dz_out_refs[l].dtype
                    )
            db_refs[l][...] += jnp.sum(dz[...], axis=0, keepdims=True)

        # layer 0's input-cotangent only feeds the dx export; when the stack
        # input is not perturbed (D update: real audio + stop-gradient fake)
        # its transposed-conv dots are dead work
        skip_da = l == 0 and not need_dx
        da = da_refs[l]
        if not skip_da:
            da[...] = jnp.zeros_like(da)
        dzv = dz[...].astype(dx_ref.dtype)

        def bwd_body(k, b, q, lane0, co0, xsl, w, lp=lp, l=l, dzv=dzv, da=da,
                     skip_da=skip_da):
            dzb = dzv[:, co0 : co0 + lp.cb_out]
            if need_dw and lp.dw_in_kernel:
                dw = jax.lax.dot_general(
                    xsl, dzb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dw_refs[l][k, b] += dw
            if skip_da:
                return
            # dzb @ w^T without a materialised transpose: contract c_out dims
            contrib = jax.lax.dot_general(
                dzb, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            da[pl.ds(lp.st0 + q, lp.rows_out), lane0 : lane0 + lp.cb_in] += (
                contrib
            )

        if not (skip_da and not (need_dw and lp.dw_in_kernel)):
            _tap_loop(lp, in_refs[l], w_refs[l], bwd_body)

    if not need_dx:
        dx_ref[...] = jnp.zeros_like(dx_ref)  # dummy-small output
        return
    d0 = da_refs[0][...]
    if plan.layers[0].s > 1:
        d0 = d0.reshape(plan.layers[0].rows_in, plan.c_in)
    for j in range(e):
        a = plan.lead_in + j * plan.z_in + plan.g_in
        dx_ref[j] = d0[a : a + plan.t_in, :].astype(dx_ref.dtype)


def _bwd_pallas(
    plan: _SegmentPlan, x, ys, dys, wqs, *, interpret: bool,
    need_dw: bool = True, dy_mask: tuple[bool, ...] | None = None,
    need_dx: bool = True,
):
    n = len(plan.layers)
    if dy_mask is None:
        dy_mask = (True,) * n
    n_elems = x.shape[0]
    grid = (n_elems // plan.e,)
    dt = x.dtype

    in_specs = []
    if need_dw:  # the input levels only feed the weight-grad dots
        in_specs.append(
            pl.BlockSpec((plan.e, plan.t_in, plan.c_in), lambda gi: (gi, 0, 0))
        )
    for lp in plan.layers:  # y
        in_specs.append(
            pl.BlockSpec((plan.e, lp.t_out, lp.spec.c_out),
                         lambda gi: (gi, 0, 0))
        )
    for l, lp in enumerate(plan.layers):  # dy (symbolically-zero ones skipped)
        if dy_mask[l]:
            in_specs.append(
                pl.BlockSpec((plan.e, lp.t_out, lp.spec.c_out),
                             lambda gi: (gi, 0, 0))
            )
    for lp in plan.layers:  # wq
        in_specs.append(pl.BlockSpec(lp.wq_shape, lambda gi: (0,) * 4))

    if need_dx:
        out_specs = [
            pl.BlockSpec((plan.e, plan.t_in, plan.c_in), lambda gi: (gi, 0, 0))
        ]
        out_shape = [jax.ShapeDtypeStruct((n_elems, plan.t_in, plan.c_in), dt)]
    else:  # input not perturbed: dummy-small dx placeholder
        out_specs = [pl.BlockSpec((plan.e, 8, 128), lambda gi: (gi, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((n_elems, 8, 128), dt)]
    if need_dw:
        for lp in plan.layers:  # dwq accumulators (dummy-small when XLA dW)
            shp = lp.wq_shape if lp.dw_in_kernel else (1, 1, 8, 128)
            out_specs.append(pl.BlockSpec(shp, lambda gi: (0,) * len(shp)))
            out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        for lp in plan.layers:  # dbias
            out_specs.append(
                pl.BlockSpec((1, lp.spec.c_out), lambda gi: (0, 0))
            )
            out_shape.append(
                jax.ShapeDtypeStruct((1, lp.spec.c_out), jnp.float32)
            )
        for lp in plan.layers:  # dz exports (dummy-small when dW in kernel)
            if lp.dw_in_kernel:
                out_specs.append(pl.BlockSpec((plan.e, 8, 128),
                                              lambda gi: (gi, 0, 0)))
                out_shape.append(
                    jax.ShapeDtypeStruct((n_elems, 8, 128), dt)
                )
            else:
                out_specs.append(
                    pl.BlockSpec((plan.e, lp.t_out, lp.spec.c_out),
                                 lambda gi: (gi, 0, 0))
                )
                out_shape.append(
                    jax.ShapeDtypeStruct((n_elems, lp.t_out, lp.spec.c_out), dt)
                )

    scratch = []
    if need_dw:  # forward-input rebuild levels (weight-grad dots only)
        scratch.append(pltpu.VMEM((plan.rows_in, plan.c_in), dt))
        for l, lp in enumerate(plan.layers):
            if lp.s > 1:
                scratch.append(
                    pltpu.VMEM((lp.rows_in // lp.s, lp.s * lp.c_in), dt)
                )
            elif l > 0:
                scratch.append(pltpu.VMEM((lp.rows_in, lp.c_in), dt))
    for lp in plan.layers:  # da (folded iff the layer strides)
        if lp.s > 1:
            scratch.append(
                pltpu.VMEM((lp.rows_in // lp.s, lp.s * lp.c_in), jnp.float32)
            )
        else:
            scratch.append(pltpu.VMEM((lp.rows_in, lp.c_in), jnp.float32))
    for lp in plan.layers:  # dz
        scratch.append(pltpu.VMEM((lp.rows_out, lp.spec.c_out), jnp.float32))

    live_dys = [d for l, d in enumerate(dys) if dy_mask[l]]
    operands = ([x] if need_dw else []) + [*ys, *live_dys, *wqs]
    outs = pl.pallas_call(
        lambda *refs: _bwd_kernel(plan, refs, need_dw=need_dw,
                                  dy_mask=dy_mask, need_dx=need_dx),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return outs


# ---------------------------------------------------------------------------
# segment splitting + public differentiable op
# ---------------------------------------------------------------------------


def _split_segments(
    specs: Sequence[LayerSpec], t_in: int, n_elems: int, small_t: int,
    e_small: int,
) -> list[tuple[int, int, int]]:
    """[(start, end, E)]: wide layers per-element, small-T tail batched."""
    ts = [t_in]
    for sp in specs:
        ts.append((ts[-1] + sp.pad_l + sp.pad_r - sp.kernel) // sp.stride + 1)
    if ts[1] <= small_t:  # already small at the first layer: one E-batched
        return [(0, len(specs), math.gcd(e_small, n_elems))]  # segment
    cut = len(specs)
    for l in range(len(specs)):
        if ts[l + 1] <= small_t and l > 0:
            cut = l
            break
    e2 = math.gcd(e_small, n_elems)
    if cut == 0:
        return [(0, len(specs), e2)]
    if cut == len(specs):
        return [(0, len(specs), 1)]
    return [(0, cut, 1), (cut, len(specs), e2)]


@functools.lru_cache(maxsize=None)
def _plans(
    specs: tuple[LayerSpec, ...], t_in: int, c_in: int, n_elems: int,
    small_t: int, e_small: int,
) -> tuple:
    out = []
    t, c = t_in, c_in
    for a, b, e in _split_segments(specs, t_in, n_elems, small_t, e_small):
        plan = _plan_segment(specs[a:b], t, c, e)
        out.append(plan)
        for lp in plan.layers:
            t, c = lp.t_out, lp.spec.c_out
    return tuple(out)


def _pack_weight(kernel: jax.Array, lp: _LayerPlan) -> jax.Array:
    """(K, ci_g, c_out) grouped kernel -> (K, nb, cb_in, cb_out) per-tap
    block-dense table (gpb groups embedded block-diagonally, zeros off the
    diagonal). Canonical in the raw tap index k — independent of the segment
    plan's lead geometry, so forward segments and backward chunks agree."""
    K = lp.spec.kernel
    g, gpb, nb = lp.spec.groups, lp.gpb, lp.nb
    ci_g, co_g = lp.c_in // g, lp.spec.c_out // g
    # (K, ci_g, c_out) -> (K, nb, gpb, ci_g, co_g)
    kb = kernel.reshape(K, ci_g, nb, gpb, co_g).transpose(0, 2, 3, 1, 4)
    # embed the gpb groups block-diagonally: (K, nb, cb_in, cb_out)
    eye = jnp.eye(gpb, dtype=kernel.dtype)
    return jnp.einsum("kngio,gh->kngiho", kb, eye).reshape(
        K, nb, lp.cb_in, lp.cb_out
    )


def _xla_dw(x_in: jax.Array, dz: jax.Array, lp: _LayerPlan) -> jax.Array:
    """wq-layout weight grad via XLA tap einsums (big tail layers whose f32
    accumulator would blow the kernel's VMEM; dense or grouped)."""
    s, g = lp.s, lp.spec.groups
    e, _, c_in = x_in.shape
    ci_g, co_g = c_in // g, lp.spec.c_out // g
    xp = jnp.pad(x_in, ((0, 0), (lp.spec.pad_l, lp.spec.pad_r), (0, 0)))
    dzg = dz.astype(jnp.float32).reshape(e, lp.t_out, g, co_g)
    taps = []
    for k in range(lp.spec.kernel):
        xk = jax.lax.slice(
            xp, (0, k, 0), (e, k + (lp.t_out - 1) * s + 1, c_in), (1, s, 1)
        )
        xg = xk.astype(jnp.float32).reshape(e, lp.t_out, g, ci_g)
        taps.append(
            jnp.einsum(
                "etgi,etgo->gio", xg, dzg,
                preferred_element_type=jnp.float32,
            )
        )
    # (K, g, ci_g, co_g) -> lax feature-group layout (K, ci_g, c_out)
    dW = jnp.stack(taps).transpose(0, 2, 1, 3).reshape(
        lp.spec.kernel, ci_g, lp.spec.c_out
    )
    return _pack_weight(dW, lp)


# VMEM budget one backward-chunk kernel may statically require; the chip has
# 128 MB but the Mosaic register allocator spills into VMEM too, so leave
# headroom for that + double-buffered IO windows
_BWD_VMEM_BUDGET = 60 * 1024 * 1024


def _bwd_vmem_bytes(
    plan: _SegmentPlan, itemsize: int, need_dw: bool = True
) -> int:
    """Static VMEM estimate of one backward chunk (IO windows double-buffer).

    ``need_dw=False`` drops the forward-input rebuild scratch, the x input
    window, the dW accumulators and the dz exports — chunks fuse more layers.
    """
    b = 2 * itemsize * plan.e * plan.t_in * plan.c_in  # dx out, 2x buf
    if need_dw:
        b += itemsize * plan.rows_in * plan.c_in  # lvl0 scratch
        b += 2 * itemsize * plan.e * plan.t_in * plan.c_in  # x in, 2x buf
    for lp in plan.layers:
        wq = int(np.prod(lp.wq_shape))
        b += itemsize * wq
        if need_dw:
            if lp.dw_in_kernel:
                b += 4 * wq  # f32 accumulator held across the grid
            else:
                b += 2 * itemsize * plan.e * lp.t_out * lp.spec.c_out  # dz out
            b += itemsize * lp.rows_in * lp.c_in  # in_ref scratch
        b += 4 * itemsize * plan.e * lp.t_out * lp.spec.c_out  # y + dy windows
        b += 4 * lp.rows_in * lp.c_in  # da f32
        b += 4 * lp.rows_out * lp.spec.c_out  # dz f32
    return b


def _bwd_chunks(
    plans: tuple, specs: tuple[LayerSpec, ...], itemsize: int,
    need_dw: bool = True,
) -> list[tuple[int, int, _SegmentPlan]]:
    """Partition each forward segment's layers into backward chunks that fit
    the VMEM budget: [(global_start, n_layers, chunk_plan)]. The forward
    keeps maximal fusion; the backward (which holds wq + dW accumulators +
    f32 da/dz scratch per layer) re-plans each chunk as its own segment —
    chunk geometry is self-contained because a chunk's input is the previous
    layer's saved activation."""
    chunks = []
    g0 = 0
    for plan in plans:
        lps = plan.layers
        start = 0
        while start < len(lps):
            end = start + 1
            best = _plan_segment(
                tuple(lp.spec for lp in lps[start:end]),
                lps[start].t_in, lps[start].c_in, plan.e,
            )
            while end < len(lps):
                cand = _plan_segment(
                    tuple(lp.spec for lp in lps[start : end + 1]),
                    lps[start].t_in, lps[start].c_in, plan.e,
                )
                if _bwd_vmem_bytes(cand, itemsize, need_dw) > _BWD_VMEM_BUDGET:
                    break
                best = cand
                end += 1
            chunks.append((g0 + start, end - start, best))
            start = end
        g0 += len(lps)
    return chunks


@functools.lru_cache(maxsize=None)
def _get_stack_core(
    specs: tuple[LayerSpec, ...], t_in: int, c_in: int, n_elems: int,
    small_t: int, e_small: int, interpret: bool, itemsize: int,
    need_dw: bool = True,
):
    plans = _plans(specs, t_in, c_in, n_elems, small_t, e_small)
    all_lps = [lp for plan in plans for lp in plan.layers]
    n = len(all_lps)
    seg_starts = []
    i = 0
    for plan in plans:
        seg_starts.append(i)
        i += len(plan.layers)
    # backward chunking depends on the EFFECTIVE need_dw (declared flag AND
    # trace-time weight-perturbation detection) — computed lazily per variant
    chunk_cache: dict = {}

    def get_chunks(nd: bool):
        if nd not in chunk_cache:
            chunk_cache[nd] = _bwd_chunks(plans, specs, itemsize, nd)
        return chunk_cache[nd]

    @jax.custom_vjp
    def core(x, *wb):
        wqs, biases = wb[:n], wb[n:]
        ys = []
        h = x
        for si, plan in enumerate(plans):
            i0, k = seg_starts[si], len(plan.layers)
            seg_y = _fwd_pallas(
                plan, h, wqs[i0 : i0 + k], biases[i0 : i0 + k],
                interpret=interpret,
            )
            seg_y = list(seg_y) if isinstance(seg_y, (list, tuple)) else [seg_y]
            ys.extend(seg_y)
            h = seg_y[-1]
        return tuple(ys)

    def fwd(x, *wb):
        # symbolic_zeros=True wraps every primal in a CustomVJPPrimal
        xv = x.value
        wbv = tuple(p.value for p in wb)
        ys = core(xv, *wbv)
        flags = _BwdFlags(
            x_perturbed=bool(x.perturbed),
            w_perturbed=any(bool(p.perturbed) for p in wb),
        )
        return ys, (xv, ys, wbv[:n], flags)

    def bwd(res, dys):
        x, ys, wqs, flags = res
        # Cotangents that are structurally zero (e.g. the D-update loss uses
        # only the logits; every interior fmap's cotangent never exists)
        # arrive as SymbolicZero — drop their DMA + add instead of streaming
        # materialised zeros through the kernel (~300 MB/step for the MSD).
        mask = [not isinstance(d, SymbolicZero) for d in dys]
        # effective declarations: the explicit weight_grads flag is ANDed
        # with trace-time perturbation detection, and the dx chain-out is
        # skipped entirely when the input is not differentiated (D update)
        nd = need_dw and flags.w_perturbed
        ndx = flags.x_perturbed
        global LAST_BWD_DY_MASK, LAST_BWD_PERTURBED
        LAST_BWD_DY_MASK = tuple(mask)
        LAST_BWD_PERTURBED = (ndx, flags.w_perturbed)
        dwqs: list = [None] * n
        dbs: list = [None] * n
        upstream = None
        for i0, k, plan in reversed(get_chunks(nd)):
            chunk_x = x if i0 == 0 else ys[i0 - 1]
            seg_ys = list(ys[i0 : i0 + k])
            chunk_mask = list(mask[i0 : i0 + k])
            seg_dys = [
                jnp.asarray(dys[i0 + j], x.dtype) if chunk_mask[j] else None
                for j in range(k)
            ]
            if upstream is not None:
                if chunk_mask[-1]:
                    seg_dys[-1] = seg_dys[-1] + upstream
                else:
                    seg_dys[-1] = upstream
                    chunk_mask[-1] = True
            seg_wqs = list(wqs[i0 : i0 + k])
            outs = _bwd_pallas(
                plan, chunk_x, seg_ys, seg_dys, seg_wqs, interpret=interpret,
                need_dw=nd, dy_mask=tuple(chunk_mask),
                need_dx=(i0 != 0) or ndx,
            )
            upstream = outs[0]
            if not nd:
                # caller promised the weights are not being differentiated
                # (generator-update traversal); hand back symbolic zeros
                for j, lp in enumerate(plan.layers):
                    dwqs[i0 + j] = jnp.zeros(lp.wq_shape, seg_wqs[j].dtype)
                    dbs[i0 + j] = jnp.zeros((1, lp.spec.c_out), jnp.float32)
                continue
            seg_dwq = outs[1 : 1 + k]
            seg_db = outs[1 + k : 1 + 2 * k]
            seg_dz = outs[1 + 2 * k : 1 + 3 * k]
            for j, lp in enumerate(plan.layers):
                if lp.dw_in_kernel:
                    dwqs[i0 + j] = seg_dwq[j].astype(seg_wqs[j].dtype)
                else:
                    xin = chunk_x if j == 0 else ys[i0 + j - 1]
                    dwqs[i0 + j] = _xla_dw(xin, seg_dz[j], lp).astype(
                        seg_wqs[j].dtype
                    )
                dbs[i0 + j] = seg_db[j].astype(jnp.float32)
        dx = upstream.astype(x.dtype) if ndx else jnp.zeros_like(x)
        return (dx, *dwqs, *dbs)

    core.defvjp(fwd, bwd, symbolic_zeros=True)
    return core, plans, all_lps


def fused_conv_stack(
    x: jax.Array | Sequence[jax.Array],
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array | None],
    specs: Sequence[LayerSpec],
    *,
    small_t: int = 256,
    e_small: int = 4,
    interpret: bool = False,
    mesh: jax.sharding.Mesh | None = None,
    batch_axis: str = "data",
    weight_grads: bool = True,
) -> list[jax.Array] | list[list[jax.Array]]:
    """Run a sequential conv1d(+leaky-relu) stack as 1-2 fused Pallas kernels.

    x: (N, T, C0); kernels[l]: (K_l, C_in_l // groups_l, C_out_l) in lax
    feature-group layout (= NormConv1d's); biases[l]: (C_out_l,) or None.
    C0 and every intermediate c_out must be multiples of 128; the LAST
    layer's c_out may be anything (internally lane-padded). Returns every
    layer's post-activation feature map; the last entry is the stack output.
    Differentiable (custom VJP, fused backward kernels — module docstring).

    ``x`` may also be a SEQUENCE of same-shape inputs (e.g. the GAN
    discriminator's real + fake traversals, which share one weight set per
    optimizer half-step): the banded weight tables are then packed ONCE and
    the kernels invoked per input — one list of feature maps per input is
    returned. The duplicate pack (and its backward transpose, which XLA's
    CSE only partially removes across traversals) is what this saves; the
    per-input kernel calls and their VJPs are unchanged.

    ``mesh``: under a multi-device mesh GSPMD treats the Mosaic call as
    opaque and would replicate its operands; passing the mesh instead runs
    the kernel under ``jax.shard_map`` with the batch (N) axis split over
    ``batch_axis`` and the weights replicated — each device runs the
    unchanged single-chip kernel on its local batch shard, and the shard_map
    transpose inserts the weight-grad psum. Requires N divisible by the
    axis size.

    ``weight_grads=False`` declares that the kernels/biases are NOT being
    differentiated through this call (e.g. the GAN generator update, where
    the discriminator weights are frozen constants): the backward kernel
    then skips every weight/bias-grad dot, the forward-input rebuild and
    the x DMA — roughly half the backward MACs — and returns ZERO weight
    cotangents. XLA cannot DCE inside an opaque Mosaic call, so this must
    be declared; using it while actually differentiating the weights gives
    silently zero weight grads.

    The custom VJP additionally detects dead work on its own
    (symbolic_zeros=True):

    - output cotangents that are structurally zero never reach the kernel —
      the D-update loss consumes only the logits, so the interior fmaps'
      materialised-zero cotangents (~300 MB/step at B16x8192) are neither
      written by XLA nor DMAed/added by the backward;
    - weight perturbation is detected per-traversal and ANDed with the
      declared flag (an undeclared frozen-weight traversal still gets the
      cheap backward);
    - an unperturbed INPUT (D update: real audio + stop-gradient fake)
      skips the first fused layer's transposed-conv dots and the dx export.
    """
    multi = isinstance(x, (list, tuple))
    xs = tuple(x) if multi else (x,)
    if mesh is not None and mesh.shape.get(batch_axis, 1) > 1:
        from jax.sharding import PartitionSpec as P

        n_shards = mesh.shape[batch_axis]
        if xs[0].shape[0] % n_shards:
            raise ValueError(
                f"fused_conv_stack: batch {xs[0].shape[0]} not divisible by "
                f"mesh axis '{batch_axis}' ({n_shards})"
            )

        def local(*args):
            return _fused_conv_stack_local(
                args[: len(xs)], args[len(xs)], args[len(xs) + 1],
                specs=tuple(specs), small_t=small_t, e_small=e_small,
                interpret=interpret, weight_grads=weight_grads,
            )

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(batch_axis),) * len(xs) + (P(), P()),
            out_specs=P(batch_axis),
            # Pallas outputs carry no varying-manual-axes metadata; the
            # composition (incl. the replicated-weight grad psum) is
            # validated in tests/test_parallel.py.
            check_vma=False,
        )
        outs = sharded(*xs, list(kernels), list(biases))
        return [list(o) for o in outs] if multi else list(outs[0])
    outs = _fused_conv_stack_local(
        xs, list(kernels), list(biases), specs=tuple(specs),
        small_t=small_t, e_small=e_small, interpret=interpret,
        weight_grads=weight_grads,
    )
    return [list(o) for o in outs] if multi else list(outs[0])


def _fused_conv_stack_local(
    xs, kernels, biases, *, specs, small_t, e_small, interpret,
    weight_grads=True,
):
    """Single-device body of fused_conv_stack (runs per-shard under a mesh).

    ``xs``: tuple of same-shape inputs; the weight tables are packed once
    and the custom-VJP core runs per input. Returns one ys list per input
    (tuple-of-tuples so shard_map can treat it as a flat pytree)."""
    specs = list(specs)
    n_elems, t_in, c_in = xs[0].shape
    kernels = list(kernels)
    biases = list(biases)
    last = specs[-1]
    pad_out = 0
    if last.c_out % 128:
        pad_out = 128 - last.c_out % 128
        specs[-1] = dataclasses.replace(last, c_out=last.c_out + pad_out)
        kernels[-1] = jnp.pad(kernels[-1], ((0, 0), (0, 0), (0, pad_out)))
        if biases[-1] is not None:
            biases[-1] = jnp.pad(biases[-1], ((0, pad_out),))
    t_specs = tuple(specs)
    core, plans, all_lps = _get_stack_core(
        t_specs, t_in, c_in, n_elems, small_t, e_small, bool(interpret),
        jnp.dtype(xs[0].dtype).itemsize, bool(weight_grads),
    )
    wqs = []
    bs = []
    for l, lp in enumerate(all_lps):
        wqs.append(_pack_weight(kernels[l].astype(xs[0].dtype), lp))
        b = biases[l]
        if b is None:
            b = jnp.zeros((lp.spec.c_out,), jnp.float32)
        bs.append(b.astype(jnp.float32).reshape(1, -1))
    outs = []
    for x in xs:
        ys = list(core(x, *wqs, *bs))
        if pad_out:
            ys[-1] = ys[-1][..., : last.c_out]
        outs.append(tuple(ys))
    return tuple(outs)


# ---------------------------------------------------------------------------
# group time-fold transform: grouped conv chains WITHOUT densification pad
# ---------------------------------------------------------------------------
#
# The block-dense group embedding above pads a grouped layer's FLOPs by
# gpb (2-8x for the MSD's g=16 layers) to reach 128 lanes. For a CHAIN of
# grouped convs with a stable group partition (every MSD g=16 layer maps
# group j of its input to group j of its output, reference
# src/models.py:197-201) there is an exact zero-pad formulation: fold TIME
# into each group's lane span so every group presents f*ci = 128 lanes:
#
#   X[r, (gg*f + phi)*ci + i] = x[r*f + phi, gg*ci + i]
#   Y[rho, (gg*f_out + psi)*co + o] = y[rho*f_out + psi, gg*co + o]
#   => per group, Y[rho] = sum_q X[sigma*rho + q] @ Wz[gg][q],
#      sigma = f_out*s/f_in (integer), with the BANDED row-space kernel
#      Wz[gg][q][phi*ci + i, psi*co + o] = W[q*f_in + phi - psi*s + pad][
#          i, gg*co + o]  (taps outside [0, K) are zero)
#
# i.e. an ordinary fused_conv_stack GROUPED layer with c = g*128 lanes,
# kernel kk ~ K/f_in + f_out*s/f_in, stride sigma, and group blocks of
# exactly 128x128 (gpb = 1, nb = g): full MXU contractions, no padded
# FLOPs, and consecutive chain layers need NO relayout (layer l's output
# zone layout is layer l+1's input zone layout when f_in[l+1] = f_out[l]).
# The fold/unfold at chain entry/exit are cheap XLA transposes.


def zone_grouped_layer(
    kernel: jax.Array, bias: jax.Array | None, s: int, pad: int,
    f_in: int, f_out: int, groups: int, slope: float, t_in: int,
    dilation: int = 1,
) -> tuple[jax.Array, jax.Array | None, LayerSpec]:
    """Fold one grouped conv layer into the time-zone form.

    kernel: (K, ci, g*co) lax feature-group layout (ci = per-group in
    channels); returns (zkernel (kk, f_in*ci, g*f_out*co), zbias, spec) for
    fused_conv_stack on the zone-layout activation (see module comment).
    """
    K, ci, gco = kernel.shape
    d = dilation
    g = groups
    co = gco // g
    assert (f_out * s) % f_in == 0, (f_in, f_out, s)
    sigma = (f_out * s) // f_in
    d_min, d_max = -pad, (f_out - 1) * s + (K - 1) * d - pad
    q_min, q_max = d_min // f_in, d_max // f_in
    kk = q_max - q_min + 1
    # non-divisible lengths fold into a PARTIAL last row: the trailing fold
    # phases are zeros (== conv padding, so reads stay exact) and the
    # layer's partial-output lanes are zeroed by the kernel's lane mask
    rows_in = _cdiv(t_in, f_in)
    t_out = (t_in + 2 * pad - (K - 1) * d - 1) // s + 1
    rows_out = _cdiv(t_out, f_out)
    rem_out = t_out % f_out
    pad_l = -q_min
    need = (rows_out - 1) * sigma + kk - pad_l - rows_in
    pad_r = max(0, need)
    assert need + sigma - 1 >= 0 and pad_r <= kk + sigma, (pad_l, need, kk)
    # one gather builds the banded table: tap index per (q, phi, psi)
    q_i, phi_i, psi_i = np.meshgrid(
        np.arange(q_min, q_max + 1), np.arange(f_in), np.arange(f_out),
        indexing="ij",
    )
    kd_i = q_i * f_in + phi_i - psi_i * s + pad  # = tap k times dilation
    valid = (kd_i >= 0) & (kd_i < (K - 1) * d + 1) & (kd_i % d == 0)
    k_safe = np.where(valid, kd_i // d, K)  # K -> the zero tap appended below
    wp = jnp.concatenate([kernel, jnp.zeros((1, ci, gco), kernel.dtype)])
    gathered = wp[jnp.asarray(k_safe.reshape(-1))]  # (kk*f_in*f_out, ci, g*co)
    gathered = gathered.reshape(kk, f_in, f_out, ci, g, co)
    zk = gathered.transpose(0, 1, 3, 4, 2, 5).reshape(
        kk, f_in * ci, g * f_out * co
    )
    zb = None
    if bias is not None:
        zb = jnp.broadcast_to(
            bias.reshape(g, 1, co), (g, f_out, co)
        ).reshape(g * f_out * co)
    spec = LayerSpec(
        g * f_out * co, kk, sigma, g, pad_l, pad_r, slope,
        lane_period=f_out * co if rem_out else 0,
        lane_valid=rem_out * co if rem_out else 0,
    )
    return zk, zb, spec


def fold_group_zones(x: jax.Array, g: int, f: int) -> jax.Array:
    """(B, T, g*ci) group-major channels -> (B, ceil(T/f), g*f*ci) zone
    layout; a non-divisible T zero-pads the last row's trailing phases
    (they read as conv padding inside the chain)."""
    b, t, c = x.shape
    ci = c // g
    rows = _cdiv(t, f)
    if t % f:
        x = jnp.pad(x, ((0, 0), (0, rows * f - t), (0, 0)))
    z = x.reshape(b, rows, f, g, ci).transpose(0, 1, 3, 2, 4)
    return z.reshape(b, rows, g * f * ci)


def unfold_group_zones(
    z: jax.Array, g: int, f: int, t_out: int | None = None
) -> jax.Array:
    """inverse for the OUTPUT layout: (B, R, g*f*co) -> (B, t_out, g*co)
    (t_out defaults to R*f; pass the true length to drop fold padding)."""
    b, r, lanes = z.shape
    co = lanes // (g * f)
    y = z.reshape(b, r, g, f, co).transpose(0, 1, 3, 2, 4)
    y = y.reshape(b, r * f, g * co)
    return y if t_out is None or t_out == r * f else y[:, :t_out, :]
