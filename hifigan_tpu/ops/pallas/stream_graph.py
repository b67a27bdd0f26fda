"""Fused Pallas "stream graph" kernels: a DAG of narrow conv1d ops in one
kernel, activations VMEM-resident in a time-folded sample-stream layout.

Why: the distillation all-in-one discriminator (reference
speech_distillation/custom_discriminator.py:6-40 built by
static_configs.get_discriminator_config) is ~43 tiny convs per member
(channels 1-144, Fibonacci widths) over long sequences. Under XLA each conv
is a separate HBM-round-trip fusion; the whole member forward is ~0.79 GFLOP
yet measures 13.9 ms at production scale (docs/OPERATIONS.md) — a per-op
dispatch/lowering floor, ~0.1 TFLOP/s effective. Fusing each all-in-one
block (3 convs + raw-branch taps + residual + its pfmap head) into ONE
Pallas kernel removes the floor.

Core representation — the time-folded sample stream:

- A "level" is an activation (t, c) stored folded as ``(rows, L)`` with
  ``L = f*c`` lanes: row r holds samples ``x[r*f + phi, ch]`` at lane
  ``phi*c + ch``. The flattened lane-major order IS the time-major sample
  stream, which makes the reference's rechanneling ops free:
  ``conv_rech``'s  time->channel reshape (custom_layers.py:11-36) and
  ``roll``'s period reshape (custom_layers.py:66-79) are fold *metadata*
  changes on the same array — no data movement.
- A conv (any kernel/dilation/stride, groups=1) between levels is a banded
  lane-space matrix applied per folded row: ``acc[rho] += sum_q
  src[rho + st0 + q] @ Wq`` — full-lane MXU dots, one per tap, no
  per-element loop (the banded per-tap tables come from
  conv_stack.zone_grouped_layer with groups=1).
- All folds inside a segment are chosen so ``f_in = s * f_out`` on every
  edge (sigma == 1): every level has the same rows-per-unit-time, so every
  tap slice is a contiguous, statically-offset row range — no in-kernel
  reshapes or strided loads at all (Mosaic only supports the >=128-lane
  relayout fold, conv_stack.py; narrow streams can't use it).
- A segment's ops form a DAG: an op accumulates any number of conv edges
  (concat-with-raw-branches becomes a SUM of per-branch banded dots — a
  conv over a channel-concat splits exactly), plus an optional identity
  residual add, then bias + activation (none / leaky-relu / tanh) + a
  zone/lane validity mask.
- Zoned batch layout, f32 accumulators, fused custom-VJP backward with
  in-kernel dW/db (same scheme as conv_stack.py: activation masks are
  recomputed from saved post-activation maps — lrelu preserves sign and
  tanh's derivative is 1-y^2, so no pre-activations are stored).

Validated against an XLA reference executor and the DSL interpreter in
interpreter mode (tests/test_stream_graph.py, tests/test_dsl.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# last backward's liveness/perturbation detection (debug/tests only)
LAST_BWD_DY_MASK: tuple[bool, ...] | None = None
LAST_BWD_PERTURBED: tuple | None = None
# trace-time forward-call counter (tests assert the fused path engaged —
# the DSL gates fall back to the interpreter silently)
FUSED_CALLS: int = 0
# tests only: with interpret=True, execute via the pure-jnp reference
# executor instead of the Pallas interpreter. Same folded/banded semantics
# (the Segment/table/plan construction under test is shared; AD is plain
# jnp), but XLA-compiled — minutes -> seconds for production-geometry
# smokes. Kernel-body parity keeps using the real interpreter
# (tests/test_stream_graph.py).
REFERENCE_EXECUTOR: bool = False


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _BwdFlags:
    """Trace-time AD facts carried fwd->bwd via the residual pytree
    STRUCTURE (register_static: no array leaves): per-input perturbation
    and whether any table/bias is differentiated."""

    x_perturbed: tuple
    w_perturbed: bool


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, m: int) -> int:
    return _cdiv(a, m) * m


# ---------------------------------------------------------------------------
# graph IR (all static / hashable — used as jit cache keys)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Level:
    """One activation level of a segment (folded stream layout)."""

    t_rows: int  # valid data rows per batch element
    lanes: int  # L = f * c (any positive int; Mosaic pads internally)
    is_input: bool = False
    # partial last data row: only lanes < lane_valid are real samples
    # (t % f != 0); 0 = full last row
    lane_valid: int = 0


@dataclasses.dataclass(frozen=True)
class Edge:
    """One banded-conv contribution into an op's accumulator."""

    src: int  # level index
    kk: int  # tap count of the banded table (kk, L_src, L_dst)
    pad_l: int  # leading guard rows the source must provide (= -q_min)
    pad_r: int  # trailing guard rows


@dataclasses.dataclass(frozen=True)
class Op:
    """One fused node: sum of conv edges (+ residual) -> bias -> act."""

    out: int  # level index produced (topological: ops ordered)
    edges: tuple  # tuple[Edge, ...]
    act: str = "none"  # 'none' | 'lrelu' | 'tanh'
    slope: float = 0.1  # lrelu slope
    res_from: int | None = None  # identity-add source level (same lanes/rows)


@dataclasses.dataclass(frozen=True)
class Segment:
    levels: tuple  # tuple[Level, ...]
    ops: tuple  # tuple[Op, ...] in topological order


@dataclasses.dataclass
class _Plan:
    seg: Segment
    e: int  # batch elements per grid step
    z: int  # zone pitch (rows), shared by every level (sigma == 1)
    lead: list  # per-level lead rows
    guard: list  # per-level leading guard rows (conv padding)
    rows: list  # per-level total scratch rows
    st0: list  # per-(op, edge) base row offsets, parallel nested lists
    res_off: list  # per-op residual source row offset (or None)


# ---------------------------------------------------------------------------
# planning
# ---------------------------------------------------------------------------


def _plan_segment(seg: Segment, e: int) -> _Plan:
    n_lvl = len(seg.levels)
    producers = {op.out: op for op in seg.ops}
    for i, lvl in enumerate(seg.levels):
        if lvl.is_input:
            assert i not in producers, f"input level {i} has a producer"
        else:
            assert i in producers, f"level {i} has no producer"
    # the i-th op must produce the i-th non-input level (the kernels' output
    # windows are emitted in level order but written in op order)
    assert [op.out for op in seg.ops] == [
        li for li, lvl in enumerate(seg.levels) if not lvl.is_input
    ], "ops must produce non-input levels in level order"

    # leading/trailing guards: what each level's consumers need as padding.
    # The trailing guard is derived from the true tap reach so an element's
    # reads never touch the next element's data zone: edge reads src rows
    # r_rel in [-pad_l, t_out - 1 + kk - 1 - pad_l].
    g_l = [0] * n_lvl
    g_r = [0] * n_lvl
    for op in seg.ops:
        t_out = seg.levels[op.out].t_rows
        for ed in op.edges:
            g_l[ed.src] = max(g_l[ed.src], ed.pad_l)
            reach = t_out + ed.kk - 1 - ed.pad_l - seg.levels[ed.src].t_rows
            g_r[ed.src] = max(g_r[ed.src], ed.pad_r, reach)
        if op.res_from is not None:
            assert (
                seg.levels[op.res_from].lanes == seg.levels[op.out].lanes
                and seg.levels[op.res_from].t_rows >= t_out
            ), "residual level must match the output's lanes/rows"

    # zone pitch: one pitch for the whole segment (every edge has sigma == 1,
    # so element j's rows line up 1:1 across levels)
    z = 8
    for i, lvl in enumerate(seg.levels):
        z = max(z, _round_up(g_l[i] + lvl.t_rows + g_r[i], 8))

    # leads: every edge's base slice start must be >= 0; residual adds and
    # dz back-substitution reuse the same offsets, so solve one fixed point
    lead = [0] * n_lvl
    for _ in range(8 * (n_lvl + 2)):
        ok = True
        for op in seg.ops:
            for ed in op.edges:
                st0 = (lead[ed.src] + g_l[ed.src] - ed.pad_l) - (
                    lead[op.out] + g_l[op.out]
                )
                if st0 < 0:
                    lead[ed.src] += _round_up(-st0, 8)
                    ok = False
            if op.res_from is not None:
                off = (lead[op.res_from] + g_l[op.res_from]) - (
                    lead[op.out] + g_l[op.out]
                )
                if off < 0:
                    lead[op.res_from] += _round_up(-off, 8)
                    ok = False
        if ok:
            break
    else:  # pragma: no cover
        raise AssertionError("stream-graph lead planning did not converge")

    rows = [0] * n_lvl
    st0: list = []
    res_off: list = []
    # total rows: enough for e zones plus whatever any consumer's deepest
    # tap slice reaches
    for i, lvl in enumerate(seg.levels):
        rows[i] = _round_up(lead[i] + e * z, 8)
    changed = True
    while changed:
        changed = False
        for op in seg.ops:
            for ed in op.edges:
                base = (lead[ed.src] + g_l[ed.src] - ed.pad_l) - (
                    lead[op.out] + g_l[op.out]
                )
                need = _round_up(base + (ed.kk - 1) + rows[op.out], 8)
                if need > rows[ed.src]:
                    rows[ed.src] = need
                    changed = True
            if op.res_from is not None:
                off = (lead[op.res_from] + g_l[op.res_from]) - (
                    lead[op.out] + g_l[op.out]
                )
                need = _round_up(off + rows[op.out], 8)
                if need > rows[op.res_from]:
                    rows[op.res_from] = need
                    changed = True
    for op in seg.ops:
        st0.append(
            [
                (lead[ed.src] + g_l[ed.src] - ed.pad_l)
                - (lead[op.out] + g_l[op.out])
                for ed in op.edges
            ]
        )
        res_off.append(
            None
            if op.res_from is None
            else (lead[op.res_from] + g_l[op.res_from])
            - (lead[op.out] + g_l[op.out])
        )
    return _Plan(
        seg=seg, e=e, z=z, lead=lead, guard=g_l, rows=rows, st0=st0,
        res_off=res_off,
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _valid_mask(vals, lvl: Level, plan: _Plan, lead: int, guard: int):
    """Zero rows outside the e valid data zones; lane-mask the partial last
    data row when t % f != 0 (fold padding lanes are not real samples)."""
    rows = vals.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    full = jnp.zeros((rows, 1), jnp.float32)
    part = jnp.zeros((rows, 1), jnp.float32)
    t = lvl.t_rows
    for j in range(plan.e):
        a = lead + j * plan.z + guard
        if lvl.lane_valid:
            full = full + jnp.where((r >= a) & (r < a + t - 1), 1.0, 0.0)
            part = part + jnp.where(r == a + t - 1, 1.0, 0.0)
        else:
            full = full + jnp.where((r >= a) & (r < a + t), 1.0, 0.0)
    if not lvl.lane_valid:
        return vals * full
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, vals.shape[1]), 1)
    lmask = jnp.where(lane < lvl.lane_valid, 1.0, 0.0)
    return vals * full + vals * (part * lmask)


_LOG_CLIP = 1e-5


def _apply_act(z, op: Op):
    if op.act == "lrelu":
        return jnp.maximum(z, 0.0) + op.slope * jnp.minimum(z, 0.0)
    if op.act == "tanh":
        return jnp.tanh(z)
    if op.act == "square":
        return z * z
    if op.act == "log1e5":
        # dynamic_range_compression (audio/mel.py): log(clip(x, 1e-5)).
        # Guard rows (zeros) map to log(1e-5); the zone mask zeroes them
        # right after, so consumers still read exact zero padding.
        return jnp.log(jnp.maximum(z, _LOG_CLIP))
    return z


def _act_vjp_mask(dz, y, op: Op, src=None):
    """Cotangent through the activation from the saved POST-activation y.

    'square' is the one act whose derivative needs the pre-activation; it is
    only emitted as an act-only op (edges == (), res_from set), whose source
    level value is passed as ``src``.
    """
    if op.act == "lrelu":
        return dz * jnp.where(y >= 0.0, 1.0, op.slope)
    if op.act == "tanh":
        return dz * (1.0 - y * y)
    if op.act == "square":
        assert src is not None
        return dz * (2.0 * src)
    if op.act == "log1e5":
        # y = log(max(z, clip)) => dz/dy = exp(-y), zero in the clipped region
        return dz * jnp.where(
            y > jnp.log(jnp.float32(_LOG_CLIP)), jnp.exp(-y), 0.0
        )
    return dz


def _fwd_kernel(plan: _Plan, n_in: int, n_tab: int, refs):
    seg = plan.seg
    n_lvl = len(seg.levels)
    n_ops = len(seg.ops)
    i = 0
    in_refs = refs[i : i + n_in]; i += n_in
    tab_refs = refs[i : i + n_tab]; i += n_tab
    b_refs = refs[i : i + n_ops]; i += n_ops
    out_refs = refs[i : i + (n_lvl - n_in)]; i += n_lvl - n_in
    scratch = list(refs[i:])
    lvl_refs = scratch[:n_lvl]
    acc_refs = scratch[n_lvl:]

    e, z = plan.e, plan.z
    # stage inputs into their zones
    ii = 0
    out_i = 0
    for li, lvl in enumerate(seg.levels):
        if lvl.is_input:
            ref = lvl_refs[li]
            ref[...] = jnp.zeros_like(ref)
            for j in range(e):
                a = plan.lead[li] + j * z + plan.guard[li]
                ref[a : a + lvl.t_rows, :] = in_refs[ii][j]
            ii += 1

    tab_i = 0
    for oi, op in enumerate(seg.ops):
        lvl = seg.levels[op.out]
        acc = acc_refs[oi]
        acc[...] = jnp.broadcast_to(b_refs[oi][...], acc.shape)
        rows_out = acc.shape[0]
        for ei, ed in enumerate(op.edges):
            st0 = plan.st0[oi][ei]
            src = lvl_refs[ed.src]
            for q in range(ed.kk):
                acc[...] += jnp.dot(
                    src[pl.ds(st0 + q, rows_out), :],
                    tab_refs[tab_i][q],
                    preferred_element_type=jnp.float32,
                )
            tab_i += 1
        if op.res_from is not None:
            off = plan.res_off[oi]
            acc[...] += lvl_refs[op.res_from][
                pl.ds(off, rows_out), :
            ].astype(jnp.float32)
        zv = _apply_act(acc[...], op)
        zv = _valid_mask(zv, lvl, plan, plan.lead[op.out], plan.guard[op.out])
        zb = zv.astype(lvl_refs[op.out].dtype)
        lvl_refs[op.out][...] = zb
        for j in range(e):
            a = plan.lead[op.out] + j * z + plan.guard[op.out]
            out_refs[out_i][j] = zb[a : a + lvl.t_rows, :]
        out_i += 1


def _fwd_pallas(plan: _Plan, inputs, tables, biases, *, interpret: bool):
    seg = plan.seg
    n_in = len(inputs)
    n_tab = len(tables)
    n_elems = inputs[0].shape[0]
    grid = (n_elems // plan.e,)
    dt = inputs[0].dtype

    in_specs = []
    for li, lvl in enumerate(seg.levels):
        if lvl.is_input:
            in_specs.append(
                pl.BlockSpec((plan.e, lvl.t_rows, lvl.lanes),
                             lambda gi: (gi, 0, 0))
            )
    for t in tables:
        shp = t.shape
        in_specs.append(pl.BlockSpec(shp, lambda gi: (0,) * len(shp)))
    for b in biases:
        in_specs.append(pl.BlockSpec(b.shape, lambda gi: (0, 0)))

    out_specs, out_shape = [], []
    for li, lvl in enumerate(seg.levels):
        if not lvl.is_input:
            out_specs.append(
                pl.BlockSpec((plan.e, lvl.t_rows, lvl.lanes),
                             lambda gi: (gi, 0, 0))
            )
            out_shape.append(
                jax.ShapeDtypeStruct((n_elems, lvl.t_rows, lvl.lanes), dt)
            )

    scratch = [
        pltpu.VMEM((plan.rows[li], lvl.lanes), dt)
        for li, lvl in enumerate(seg.levels)
    ]
    scratch += [
        pltpu.VMEM((plan.rows[op.out], seg.levels[op.out].lanes), jnp.float32)
        for op in seg.ops
    ]
    outs = pl.pallas_call(
        lambda *refs: _fwd_kernel(plan, n_in, n_tab, refs),
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
    )(*inputs, *tables, *biases)
    return outs if isinstance(outs, (list, tuple)) else [outs]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(plan: _Plan, n_in: int, n_tab: int, refs, need_dw: bool = True,
                dy_mask: tuple[bool, ...] | None = None,
                dx_mask: tuple[bool, ...] | None = None):
    """``need_dw=False`` (frozen-weight traversal, e.g. the distill
    trainer's discriminator-copy pass on generated audio) skips every
    weight/bias-grad dot and export — XLA cannot DCE inside an opaque
    Mosaic call, so the split must be declared by the caller.
    ``dy_mask[oi]=False`` declares produced level oi's external cotangent
    symbolically zero (interior exports exist for the backward, not the
    loss): its dy DMA + add are dropped. ``dx_mask[ii]=False`` declares
    input ii unperturbed (e.g. the stop-gradient wall in front of the
    distill disc-train pass): its cotangent dots and export are dropped."""
    seg = plan.seg
    n_lvl = len(seg.levels)
    n_ops = len(seg.ops)
    n_out = n_lvl - n_in
    if dy_mask is None:
        dy_mask = (True,) * n_out
    if dx_mask is None:
        dx_mask = (True,) * n_in
    i = 0
    in_refs = refs[i : i + n_in]; i += n_in
    y_refs = refs[i : i + n_out]; i += n_out  # saved level exports
    n_live_dy = sum(dy_mask)
    live_dy = refs[i : i + n_live_dy]; i += n_live_dy
    dy_refs = []
    di = 0
    for oi in range(n_out):
        dy_refs.append(live_dy[di] if dy_mask[oi] else None)
        di += dy_mask[oi]
    tab_refs = refs[i : i + n_tab]; i += n_tab
    dx_refs = refs[i : i + n_in]; i += n_in
    # level index -> dead-input flag (cotangent writes to it are dead work)
    dead_lvl = [False] * n_lvl
    ii_scan = 0
    for li, lvl in enumerate(seg.levels):
        if lvl.is_input:
            dead_lvl[li] = not dx_mask[ii_scan]
            ii_scan += 1
    if need_dw:
        dtab_refs = refs[i : i + n_tab]; i += n_tab
        db_refs = refs[i : i + n_ops]; i += n_ops
    scratch = list(refs[i:])
    lvl_refs = scratch[:n_lvl]
    da_refs = scratch[n_lvl : 2 * n_lvl]  # f32 cotangent per level

    e, z = plan.e, plan.z
    gi = pl.program_id(0)

    # ---- stage every level's values (inputs + saved exports) ----
    ii = 0
    oi_exp = 0
    for li, lvl in enumerate(seg.levels):
        ref = lvl_refs[li]
        ref[...] = jnp.zeros_like(ref)
        src = in_refs[ii] if lvl.is_input else y_refs[oi_exp]
        for j in range(e):
            a = plan.lead[li] + j * z + plan.guard[li]
            ref[a : a + lvl.t_rows, :] = src[j]
        if lvl.is_input:
            ii += 1
        else:
            oi_exp += 1

    if need_dw:
        @pl.when(gi == 0)
        def _init():
            for r in dtab_refs:
                r[...] = jnp.zeros_like(r)
            for r in db_refs:
                r[...] = jnp.zeros_like(r)

    # ---- init cotangents with the external dy of every produced level ----
    oi_exp = 0
    for li, lvl in enumerate(seg.levels):
        da_refs[li][...] = jnp.zeros_like(da_refs[li])
        if not lvl.is_input:
            if dy_refs[oi_exp] is not None:
                for j in range(e):
                    a = plan.lead[li] + j * z + plan.guard[li]
                    da_refs[li][a : a + lvl.t_rows, :] += dy_refs[oi_exp][
                        j
                    ].astype(jnp.float32)
            oi_exp += 1

    # table index base per op (edges are packed op-major)
    tab_base = []
    t = 0
    for op in seg.ops:
        tab_base.append(t)
        t += len(op.edges)

    for oi in range(n_ops - 1, -1, -1):
        op = seg.ops[oi]
        lvl = seg.levels[op.out]
        rows_out = plan.rows[op.out]
        dz = da_refs[op.out][...]
        src_val = None
        if op.act == "square":
            off = plan.res_off[oi]
            src_val = lvl_refs[op.res_from][
                pl.ds(off, rows_out), :
            ].astype(jnp.float32)
        dz = _act_vjp_mask(
            dz, lvl_refs[op.out][...].astype(jnp.float32), op, src_val
        )
        dz = _valid_mask(dz, lvl, plan, plan.lead[op.out], plan.guard[op.out])
        if need_dw:
            db_refs[oi][...] += jnp.sum(dz, axis=0, keepdims=True)
        dzt = dz.astype(in_refs[0].dtype) if in_refs else dz.astype(
            y_refs[0].dtype
        )
        for ei, ed in enumerate(op.edges):
            st0 = plan.st0[oi][ei]
            src = lvl_refs[ed.src]
            for q in range(ed.kk):
                if need_dw:
                    xsl = src[pl.ds(st0 + q, rows_out), :]
                    dtab_refs[tab_base[oi] + ei][q] += jax.lax.dot_general(
                        xsl, dzt, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                if not dead_lvl[ed.src]:
                    da_refs[ed.src][pl.ds(st0 + q, rows_out), :] += (
                        jax.lax.dot_general(
                            dzt, tab_refs[tab_base[oi] + ei][q],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
        if op.res_from is not None and not dead_lvl[op.res_from]:
            off = plan.res_off[oi]
            da_refs[op.res_from][pl.ds(off, rows_out), :] += dz

    ii = 0
    for li, lvl in enumerate(seg.levels):
        if not lvl.is_input:
            continue
        if not dx_mask[ii]:
            dx_refs[ii][...] = jnp.zeros_like(dx_refs[ii])  # dummy-small
            ii += 1
            continue
        da = da_refs[li]
        for j in range(e):
            a = plan.lead[li] + j * z + plan.guard[li]
            dx_refs[ii][j] = da[a : a + lvl.t_rows, :].astype(
                dx_refs[ii].dtype
            )
        ii += 1


def _bwd_pallas(plan: _Plan, inputs, ys, dys, tables, *, interpret: bool,
                need_dw: bool = True,
                dy_mask: tuple[bool, ...] | None = None,
                dx_mask: tuple[bool, ...] | None = None):
    seg = plan.seg
    n_in = len(inputs)
    n_tab = len(tables)
    n_ops = len(seg.ops)
    if dy_mask is None:
        dy_mask = (True,) * len(ys)
    if dx_mask is None:
        dx_mask = (True,) * n_in
    n_elems = (inputs[0] if inputs else ys[0]).shape[0]
    grid = (n_elems // plan.e,)
    dt = (inputs[0] if inputs else ys[0]).dtype

    in_specs = []
    out_levels = [li for li, lvl in enumerate(seg.levels) if not lvl.is_input]
    for li, lvl in enumerate(seg.levels):
        if lvl.is_input:
            in_specs.append(
                pl.BlockSpec((plan.e, lvl.t_rows, lvl.lanes),
                             lambda gi: (gi, 0, 0))
            )
    for li in out_levels:  # y exports
        lvl = seg.levels[li]
        in_specs.append(
            pl.BlockSpec((plan.e, lvl.t_rows, lvl.lanes),
                         lambda gi: (gi, 0, 0))
        )
    for oi, li in enumerate(out_levels):  # dy (symbolically-zero skipped)
        if dy_mask[oi]:
            lvl = seg.levels[li]
            in_specs.append(
                pl.BlockSpec((plan.e, lvl.t_rows, lvl.lanes),
                             lambda gi: (gi, 0, 0))
            )
    for t in tables:
        in_specs.append(pl.BlockSpec(t.shape, lambda gi: (0, 0, 0)))

    out_specs, out_shape = [], []
    ii = 0
    for li, lvl in enumerate(seg.levels):
        if lvl.is_input:
            if dx_mask[ii]:
                out_specs.append(
                    pl.BlockSpec((plan.e, lvl.t_rows, lvl.lanes),
                                 lambda gi: (gi, 0, 0))
                )
                out_shape.append(
                    jax.ShapeDtypeStruct((n_elems, lvl.t_rows, lvl.lanes), dt)
                )
            else:  # unperturbed input: dummy-small dx placeholder
                out_specs.append(
                    pl.BlockSpec((plan.e, 8, 128), lambda gi: (gi, 0, 0))
                )
                out_shape.append(
                    jax.ShapeDtypeStruct((n_elems, 8, 128), dt)
                )
            ii += 1
    if need_dw:
        for t in tables:  # f32 dW accumulators, held across grid steps
            out_specs.append(pl.BlockSpec(t.shape, lambda gi: (0, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        for op in seg.ops:  # f32 dbias
            lanes = seg.levels[op.out].lanes
            out_specs.append(pl.BlockSpec((1, lanes), lambda gi: (0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((1, lanes), jnp.float32))

    scratch = [
        pltpu.VMEM((plan.rows[li], lvl.lanes), dt)
        for li, lvl in enumerate(seg.levels)
    ]
    scratch += [
        pltpu.VMEM((plan.rows[li], lvl.lanes), jnp.float32)
        for li, lvl in enumerate(seg.levels)
    ]
    live_dys = [d for oi, d in enumerate(dys) if dy_mask[oi]]
    outs = pl.pallas_call(
        lambda *refs: _bwd_kernel(plan, n_in, n_tab, refs, need_dw=need_dw,
                                  dy_mask=dy_mask, dx_mask=dx_mask),
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
    )(*inputs, *ys, *live_dys, *tables)
    return outs if isinstance(outs, (list, tuple)) else [outs]


# ---------------------------------------------------------------------------
# public differentiable op
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 60 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _get_core(seg: Segment, n_elems: int, itemsize: int, interpret: bool,
              need_dw: bool = True):
    # largest e dividing the batch whose backward fits the VMEM budget
    # (the backward holds value + f32 cotangent scratch per level)
    plan = None
    for e in sorted((d for d in range(1, n_elems + 1) if n_elems % d == 0),
                    reverse=True):
        plan = _plan_segment(seg, e)
        fixed = sum(
            (4 + itemsize) * plan.rows[i] * lvl.lanes
            for i, lvl in enumerate(seg.levels)
        )
        if fixed <= _VMEM_BUDGET or e == 1:
            break
    n_in = sum(1 for lvl in seg.levels if lvl.is_input)
    n_tab = sum(len(op.edges) for op in seg.ops)

    @jax.custom_vjp
    def core(*args):
        inputs = args[:n_in]
        tables = args[n_in : n_in + n_tab]
        biases = args[n_in + n_tab :]
        return tuple(
            _fwd_pallas(plan, list(inputs), list(tables), list(biases),
                        interpret=interpret)
        )

    def fwd(*args):
        # symbolic_zeros=True wraps every primal in a CustomVJPPrimal
        vals = tuple(a.value for a in args)
        ys = core(*vals)
        flags = _BwdFlags(
            x_perturbed=tuple(bool(a.perturbed) for a in args[:n_in]),
            w_perturbed=any(bool(a.perturbed) for a in args[n_in:]),
        )
        return ys, (vals[:n_in], ys, vals[n_in : n_in + n_tab], flags)

    def bwd(res, dys):
        inputs, ys, tables, flags = res
        dt = (inputs[0] if inputs else ys[0]).dtype
        # effective declarations: the explicit weight_grads flag ANDed with
        # trace-time perturbation detection; structurally-zero output
        # cotangents (interior level exports the loss never touches) and
        # unperturbed inputs (stop-gradient walls) drop their DMAs + dots
        nd = need_dw and flags.w_perturbed
        dy_mask = tuple(not isinstance(d, SymbolicZero) for d in dys)
        dx_mask = flags.x_perturbed
        global LAST_BWD_DY_MASK, LAST_BWD_PERTURBED
        LAST_BWD_DY_MASK = dy_mask
        LAST_BWD_PERTURBED = (dx_mask, flags.w_perturbed)
        live_dys = [
            jnp.asarray(d, dt) if dy_mask[oi] else None
            for oi, d in enumerate(dys)
        ]
        outs = _bwd_pallas(plan, list(inputs), list(ys), live_dys,
                           list(tables), interpret=interpret, need_dw=nd,
                           dy_mask=dy_mask, dx_mask=dx_mask)
        dxs = [
            out if dx_mask[ii] else jnp.zeros_like(inputs[ii])
            for ii, out in enumerate(outs[:n_in])
        ]
        if not nd:
            # tables/biases frozen (declared or detected): zero cotangents
            return (
                *[dx.astype(dt) for dx in dxs],
                *[jnp.zeros(t.shape, t.dtype) for t in tables],
                *[
                    jnp.zeros((1, seg.levels[op.out].lanes), jnp.float32)
                    for op in seg.ops
                ],
            )
        dtabs = outs[n_in : n_in + n_tab]
        dbs = outs[n_in + n_tab :]
        return (
            *[dx.astype(dt) for dx in dxs],
            *[dw.astype(tables[i].dtype) for i, dw in enumerate(dtabs)],
            *[db.astype(jnp.float32) for db in dbs],
        )

    core.defvjp(fwd, bwd, symbolic_zeros=True)
    return core


def fused_stream_graph(
    seg: Segment,
    inputs: Sequence[jax.Array],
    tables: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    *,
    interpret: bool = False,
    weight_grads: bool = True,
    mesh: jax.sharding.Mesh | None = None,
    batch_axis: str = "data",
) -> list[jax.Array]:
    """Run one stream-graph segment as a single fused Pallas kernel.

    inputs: one (N, t_rows, lanes) array per ``is_input`` level, in level
    order, already in the folded stream layout (fold with
    :func:`fold_stream` / conv_stack.fold_group_zones(g=1)).
    tables: one (kk, L_src, L_dst) banded table per edge, op-major order
    (from conv_stack.zone_grouped_layer with groups=1).
    biases: one (1, L_out) f32 per op (zero where the op has no bias).
    Returns every produced level as (N, t_rows, lanes), in level order.
    Differentiable via a fused custom-VJP backward kernel.

    ``weight_grads=False`` declares that tables/biases are NOT being
    differentiated through this call (e.g. the distill trainer's frozen
    discriminator-copy pass): the backward kernel skips every weight-grad
    dot (~half its MACs) and returns ZERO table/bias cotangents — using it
    while actually differentiating the weights gives silently zero grads.

    ``mesh``: under a multi-device mesh GSPMD treats the Mosaic call as
    opaque and would replicate its operands; passing the mesh instead runs
    the kernel under ``jax.shard_map`` with the element (N) axis split over
    ``batch_axis`` and the tables/biases replicated — each device runs the
    unchanged single-chip kernel on its local shard, and the shard_map
    transpose inserts the table/bias-grad psum (same scheme as
    conv_stack.fused_conv_stack). Composes with the ensemble ``nn.vmap``
    (vmap-of-shard_map batches the member axis through). Requires N
    divisible by the axis size.
    """
    global FUSED_CALLS
    FUSED_CALLS += 1
    n_elems = inputs[0].shape[0]
    dt = inputs[0].dtype
    tables = [t.astype(dt) for t in tables]
    biases = [b.astype(jnp.float32) for b in biases]
    if interpret and REFERENCE_EXECUTOR:
        return [
            y.astype(dt)
            for y in reference_stream_graph(seg, inputs, tables, biases)
        ]
    n_in, n_tab = len(inputs), len(tables)
    if mesh is not None and mesh.shape.get(batch_axis, 1) > 1:
        from jax.sharding import PartitionSpec as P

        n_shards = mesh.shape[batch_axis]
        if n_elems % n_shards:
            raise ValueError(
                f"fused_stream_graph: batch {n_elems} not divisible by "
                f"mesh axis '{batch_axis}' ({n_shards})"
            )

        def local(*args):
            core = _get_core(
                seg, n_elems // n_shards, jnp.dtype(dt).itemsize,
                bool(interpret), bool(weight_grads),
            )
            return core(*args)

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(batch_axis),) * n_in + (P(),) * (n_tab + len(biases)),
            out_specs=P(batch_axis),
            # Pallas outputs carry no varying-manual-axes metadata; the
            # composition (incl. the replicated-table grad psum and the
            # ensemble vmap) is validated in tests/test_parallel.py.
            check_vma=False,
        )
        return list(sharded(*inputs, *tables, *biases))
    core = _get_core(seg, n_elems, jnp.dtype(dt).itemsize, bool(interpret),
                     bool(weight_grads))
    return list(core(*inputs, *tables, *biases))


# ---------------------------------------------------------------------------
# edge construction (banded tables via conv_stack.zone_grouped_layer)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvEdge:
    """Host-side bundle for one conv edge: table + geometry."""

    table: jax.Array  # (kk, f_in*ci, f_out*co)
    zbias: jax.Array | None  # (f_out*co,) broadcast bias, or None
    kk: int
    pad_l: int
    pad_r: int
    t_out: int
    rows_out: int
    lanes_out: int
    lane_valid: int  # 0 = full last row


def stream_conv(
    kernel: jax.Array,
    bias: jax.Array | None,
    *,
    f_in: int,
    f_out: int,
    t_in: int,
    s: int = 1,
    pad: int = 0,
    dilation: int = 1,
) -> ConvEdge:
    """Build the banded table + Edge geometry for one conv1d between folded
    stream levels. Requires f_in == s * f_out (sigma == 1 — the segment
    invariant). kernel: (K, c_in, c_out) lax layout (= NormConv1d's)."""
    from hifigan_tpu.ops.pallas.conv_stack import zone_grouped_layer

    assert f_in == s * f_out, (f_in, s, f_out)
    K = kernel.shape[0]
    zk, zb, spec = zone_grouped_layer(
        kernel, bias, s, pad, f_in, f_out, 1, 1.0, t_in, dilation
    )
    assert spec.stride == 1, spec
    t_out = (t_in + 2 * pad - (K - 1) * dilation - 1) // s + 1
    return ConvEdge(
        table=zk,
        zbias=zb,
        kk=zk.shape[0],
        pad_l=spec.pad_l,
        pad_r=spec.pad_r,
        t_out=t_out,
        rows_out=_cdiv(t_out, f_out),
        lanes_out=spec.c_out,
        lane_valid=spec.lane_valid if spec.lane_period else 0,
    )


# ---------------------------------------------------------------------------
# host-side fold helpers (XLA reshapes)
# ---------------------------------------------------------------------------


def fold_stream(x: jax.Array, f: int) -> jax.Array:
    """(B, t, c) -> (B, ceil(t/f), f*c) folded stream layout (trailing
    padding rows/lanes are zeros, which read as conv padding in-kernel)."""
    b, t, c = x.shape
    rows = _cdiv(t, f)
    if t % f:
        x = jnp.pad(x, ((0, 0), (0, rows * f - t), (0, 0)))
    return x.reshape(b, rows, f * c)


def unfold_stream(z: jax.Array, c: int, t: int | None = None) -> jax.Array:
    """(B, rows, f*c) -> (B, t, c); pass t to drop fold padding."""
    b, rows, lanes = z.shape
    f = lanes // c
    y = z.reshape(b, rows * f, c)
    return y if t is None or t == rows * f else y[:, :t, :]


# ---------------------------------------------------------------------------
# XLA reference executor (oracle for tests; also documents the semantics)
# ---------------------------------------------------------------------------


def reference_stream_graph(
    seg: Segment,
    inputs: Sequence[jax.Array],
    tables: Sequence[jax.Array],
    biases: Sequence[jax.Array],
) -> list[jax.Array]:
    """Pure-jnp executor of the same (folded, banded) semantics."""
    vals: dict[int, jax.Array] = {}
    ii = 0
    for li, lvl in enumerate(seg.levels):
        if lvl.is_input:
            vals[li] = inputs[ii].astype(jnp.float32)
            ii += 1
    tab_i = 0
    outs = []
    for oi, op in enumerate(seg.ops):
        lvl = seg.levels[op.out]
        n = (inputs[0] if inputs else None).shape[0]
        acc = jnp.broadcast_to(
            biases[oi].astype(jnp.float32), (n, lvl.t_rows, lvl.lanes)
        )
        for ed in op.edges:
            src = vals[ed.src]
            # pad guard rows around the valid data, then banded taps
            padded = jnp.pad(
                src, ((0, 0), (ed.pad_l, ed.pad_r + lvl.t_rows), (0, 0))
            )
            for q in range(ed.kk):
                acc = acc + jnp.einsum(
                    "brl,lm->brm",
                    padded[:, q : q + lvl.t_rows, :],
                    tables[tab_i][q].astype(jnp.float32),
                )
            tab_i += 1
        if op.res_from is not None:
            acc = acc + vals[op.res_from][:, : lvl.t_rows, :]
        if op.act == "lrelu":
            acc = jnp.maximum(acc, 0) + op.slope * jnp.minimum(acc, 0)
        elif op.act == "tanh":
            acc = jnp.tanh(acc)
        elif op.act == "square":
            acc = acc * acc
        elif op.act == "log1e5":
            acc = jnp.log(jnp.maximum(acc, _LOG_CLIP))
        if lvl.lane_valid:
            lane = jnp.arange(lvl.lanes)[None, None, :]
            last = jnp.arange(lvl.t_rows)[None, :, None] == lvl.t_rows - 1
            acc = jnp.where(last & (lane >= lvl.lane_valid), 0.0, acc)
        vals[op.out] = acc
        outs.append(acc)
    # re-emit in level order (matching fused_stream_graph)
    produced = [li for li, lvl in enumerate(seg.levels) if not lvl.is_input]
    by_level = {op.out: outs[i] for i, op in enumerate(seg.ops)}
    return [by_level[li] for li in produced]
