"""Generic stream-fusion pass over DSL configs (beyond the all-in-one case).

The distillation generator's encoder/decoder (reference
static_configs.get_generator_configs, :141-287) are chains of narrow
same-width conv blocks — 4/12/84-channel k3 convs over long streams with
res adds and sub_res(pool) skips, interleaved with roll/unroll reshapes and
a wide MXU-friendly 1092-channel core. The narrow levels are dispatch-bound
under XLA for the same reason the all-in-one discriminator is
(docs/OPERATIONS.md: encoder fwd+bwd 4.0 ms, decoder 3.5 ms at production
scale, mostly per-op overhead).

This pass walks a config as a flat sequence of atoms (nested ``#seq`` nodes
flattened, interpreter paths preserved). At each position where the running
value is a (B, T, C) tensor it greedily linearizes a maximal *run* of
fusable stream ops — conv+lrelu/tanh, res / sub_res, mean pool, repl,
avg_ch, sum of branches — and executes the run as ONE Pallas stream-graph
kernel (:mod:`hifigan_tpu.ops.pallas.stream_graph`), with pool / repl /
avg_ch / identity adds lowered as constant banded tables. Atoms that cannot
fuse (strided/grouped convs, tags, valves, noise, rolls — rolls are single
cheap XLA reshapes — width ratios past the lane budget) are
evaluated through the interpreter (ConfigurableModule._eval) at the
interpreter's own path, so parameters, captured features and semantics are
untouched. Enabling fusion can never change a model's parameter tree; only
float reassociation differs.

Wired as ``ConfigurableModule.stream_impl`` ('fused' / 'fused_interpret').
The all-in-one member path (dsl/fused_member.py) remains the specialised
lowering for the pfmap(all_in_one_discriminator) family, which this pass
does not attempt (side-input branches need the member compiler's geometry).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from hifigan_tpu.dsl.normalize import SEQ
from hifigan_tpu.ops.pallas.stream_graph import stream_conv


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _dsl_padding(kernel: int, stride: int = 1, dilation: int = 1) -> int:
    return ((kernel - 1) * dilation + 1) // 2


class _Cut(Exception):
    """Node cannot join a fused run."""


_MAX_LANES = 1024  # cap on f*max_c: widest fused level in lanes


# ---------------------------------------------------------------------------
# run IR (static per concrete entry width)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _RConv:
    chin: int
    chout: int
    k: int
    d: int
    init: float
    norm: str
    name: str


@dataclasses.dataclass
class _ROp:
    """One fused op: sum of sources -> optional residual -> activation.

    srcs: list of (slot, kind, payload):
      'conv' — payload _RConv;  'id' / 'neg' — (+/-) identity constant;
      'pool' — (k,) mean pool s=1;  'repl' — (n,) c -> n*c;  'avg' — c -> 1.
    """

    srcs: list
    act: str
    slope: float
    res_from: int | None
    chout: int


@dataclasses.dataclass
class _Run:
    entry_c: int
    ops: list = dataclasses.field(default_factory=list)
    min_c: int = 1 << 30
    max_c: int = 1

    @property
    def fold(self):
        # one shared TIME fold per run (every edge is stride 1 => sigma == 1
        # requires equal folds); narrowest level still gets >=128 lanes
        return _cdiv(128, self.min_c)

    @property
    def n_convs(self):
        return sum(1 for op in self.ops for _s, k, _p in op.srcs if k == "conv")


def _flatten(cfg, path: str, out: list):
    """Flatten nested #seq nodes into (node_cfg, path) atoms, mirroring the
    interpreter's path construction exactly."""
    if isinstance(cfg, tuple) and cfg and cfg[0] == SEQ:
        for i, sub in enumerate(cfg[1]):
            _flatten(sub, f"{path}_{i}", out)
    else:
        out.append((cfg, path))


class _RunBuilder:
    def __init__(self, entry_c: int):
        self.run = _Run(entry_c=entry_c)
        # SSA slots with consumers besides the linear chain (residual
        # sources, sum-branch entries): an activation may NOT be merged into
        # their producing op — it would change the value every consumer
        # reads. Merges into them fall back to an act-only op instead.
        self._protected: set[int] = set()
        self._widen(entry_c)

    def _widen(self, c: int):
        lo = min(self.run.min_c, c)
        hi = max(self.run.max_c, c)
        if _cdiv(128, lo) * hi > _MAX_LANES:
            raise _Cut("lanes")
        self.run.min_c, self.run.max_c = lo, hi

    def _emit(self, op: _ROp) -> int:
        self._widen(op.chout)
        self.run.ops.append(op)
        return len(self.run.ops)  # new slot

    # `c` = current width, `slot` = current SSA slot (0 = run input)
    def fuse(self, cfg, path: str, c: int, slot: int) -> tuple[int, int]:
        if isinstance(cfg, tuple) and cfg and cfg[0] == SEQ:
            for i, sub in enumerate(cfg[1]):
                c, slot = self.fuse(sub, f"{path}_{i}", c, slot)
            return c, slot
        _, name, p, tags = cfg
        if tags:
            raise _Cut("tagged")
        if name == "conv":
            p = list(p)
            chin, chout, k = int(p[0]), int(p[1]), int(p[2])
            s = int(p[3]) if len(p) > 3 else 1
            d = int(p[4]) if len(p) > 4 else 1
            g = int(p[5]) if len(p) > 5 else 1
            init = float(p[6]) if len(p) > 6 else 0.01
            norm = p[7] if len(p) > 7 else "weight"
            norm = {"spectral": "spectral", "none": "none"}.get(norm, "weight")
            if s != 1 or g != 1 or chin != c:
                raise _Cut("conv geometry")
            rc = _RConv(chin, chout, k, d, init, norm, f"{path}_conv")
            return chout, self._emit(
                _ROp([(slot, "conv", rc)], "none", 1.0, None, chout)
            )
        if name == "lrelu":
            return self._act(c, slot, "lrelu", float(p))
        if name == "tanh":
            return self._act(c, slot, "tanh", 1.0)
        if name == "pool":
            k, s = (int(v) for v in p)
            if s != 1:
                raise _Cut("strided pool")
            return c, self._emit(
                _ROp([(slot, "pool", (k,))], "none", 1.0, None, c)
            )
        if name == "repl":
            n = int(p)
            return n * c, self._emit(
                _ROp([(slot, "repl", (n,))], "none", 1.0, None, n * c)
            )
        if name == "avg_ch":
            return 1, self._emit(_ROp([(slot, "avg", ())], "none", 1.0, None, 1))
        if name in ("res", "sub_res"):
            sub_path = f"{path}_{'res' if name == 'res' else 'sres'}"
            self._protected.add(slot)
            c2, s2 = self.fuse(p, sub_path, c, slot)
            if c2 != c:
                raise _Cut("res width change")
            sgn = "id" if name == "res" else "neg"
            return c, self._emit(_ROp([(s2, sgn, ())], "none", 1.0, slot, c))
        if name == "sum":
            outs = []
            c_out = None
            self._protected.add(slot)
            for i, sub in enumerate(p):
                ci, si = self.fuse(sub, f"{path}_sum{i}", c, slot)
                if c_out is None:
                    c_out = ci
                elif ci != c_out:
                    raise _Cut("sum width mismatch")
                outs.append(si)
            srcs = [(si, "id", ()) for si in outs]
            return c_out, self._emit(_ROp(srcs, "none", 1.0, None, c_out))
        raise _Cut(name)

    def _act(self, c, slot, act, slope):
        ops = self.run.ops
        if (
            slot == len(ops)
            and slot > 0
            and ops[-1].act == "none"
            and slot not in self._protected
        ):
            # rebind (never mutate) so _linearize_run's shallow-list backup
            # still holds the pristine op if a later atom in this config
            # node raises _Cut
            ops[-1] = dataclasses.replace(ops[-1], act=act, slope=slope)
            return c, slot
        return c, self._emit(_ROp([], act, slope, slot, c))


def _linearize_run(atoms, c0: int) -> tuple[_Run, int]:
    """Greedily fuse a maximal run from atoms[0:]; returns (run, consumed)."""
    rb = _RunBuilder(c0)
    c, slot = c0, 0
    consumed = 0
    for cfg, path in atoms:
        backup = (list(rb.run.ops), rb.run.min_c, rb.run.max_c, c, slot)
        try:
            c, slot = rb.fuse(cfg, path, c, slot)
        except _Cut:
            rb.run.ops, rb.run.min_c, rb.run.max_c, c, slot = backup
            break
        consumed += 1
    return rb.run, consumed


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _const_kernel(kind, payload, c, dtype):
    if kind == "id":
        return jnp.eye(c, dtype=dtype)[None]
    if kind == "neg":
        return -jnp.eye(c, dtype=dtype)[None]
    if kind == "pool":
        (k,) = payload
        return jnp.broadcast_to(jnp.eye(c, dtype=dtype) / k, (k, c, c))
    if kind == "repl":
        (n,) = payload
        return jnp.tile(jnp.eye(c, dtype=dtype), (1, n))[None]
    if kind == "avg":
        return jnp.full((1, c, 1), 1.0 / c, dtype)
    raise AssertionError(kind)


def _run_fused(module, run: _Run, x, *, interpret: bool,
               weight_grads: bool = True):
    """Execute one fused run on a (B, t, c) tensor as one Pallas kernel."""
    from hifigan_tpu.dsl.fused_member import _SegBuilder
    from hifigan_tpu.models.layers import NormConv1d

    b, t0, c0 = x.shape
    assert c0 == run.entry_c, (c0, run.entry_c)
    f = run.fold  # shared time fold; level lanes = f * c
    dt = x.dtype

    # mesh-wired like the member kernels: batch split over the module's data
    # axis under shard_map (fused_stream_graph docstring); divisibility is
    # the caller's gate (eval_stream_fused)
    sb = _SegBuilder(interpret, weight_grads, module.mesh,
                     module.mesh_batch_axis)
    slots = [sb.add_input(x, f)]
    ts = [t0]
    cs = [c0]
    for op in run.ops:
        f_out = f
        edges = []
        t_out = None
        for slot, kind, payload in op.srcs:
            t_in, c_in = ts[slot], cs[slot]
            f_in = f
            if kind == "conv":
                rc: _RConv = payload
                pad = _dsl_padding(rc.k, 1, rc.d)
                kb = NormConv1d(
                    features=rc.chout, kernel_size=rc.k, dilation=rc.d,
                    padding=pad, norm=rc.norm, init_std=rc.init,
                    weights_only=True, name=rc.name,
                )(jnp.zeros((1, 1, rc.chin), dt), module.update_spectral)
                ce = stream_conv(
                    kb[0], kb[1], f_in=f_in, f_out=f_out, t_in=t_in, s=1,
                    pad=pad, dilation=rc.d,
                )
            else:
                kern = _const_kernel(kind, payload, c_in, dt)
                ce = stream_conv(
                    kern, None, f_in=f_in, f_out=f_out, t_in=t_in, s=1,
                    pad=_dsl_padding(kern.shape[0], 1, 1),
                )
            edges.append((slots[slot], ce))
            t_out = ce.t_out if t_out is None else min(t_out, ce.t_out)
        if not edges:  # activation-only op
            t_out = ts[op.res_from]
        res = slots[op.res_from] if op.res_from is not None else None
        out = sb.add_op(edges, op.act, op.slope, res,
                        t_out=t_out, c_out=op.chout, f_out=f_out)
        slots.append(out)
        ts.append(t_out)
        cs.append(op.chout)
    outs = sb.run()
    return sb.unfold(outs, slots[-1])


def eval_stream_fused(module, cfg, x, path: str, *, interpret: bool,
                      weight_grads: bool = True):
    """Evaluate a config with the stream-fusion pass.

    Returns (value, feats) with interpreter-identical parameters and
    semantics: fused runs are float-reassociated only; everything else goes
    through module._eval at the interpreter's own paths.
    """
    atoms: list = []
    _flatten(cfg, path, atoms)
    feats: list = []
    val = x
    i = 0
    n_data = (
        module.mesh.shape.get(module.mesh_batch_axis, 1)
        if module.mesh is not None
        else 1
    )
    while i < len(atoms):
        c = (
            int(val.shape[-1])
            if getattr(val, "ndim", 0) == 3
            else None
        )
        # skip fusion when a wired mesh can't split this batch (shard_map
        # needs batch % n_data == 0); the interpreter path is exact
        mesh_ok = n_data <= 1 or val.shape[0] % n_data == 0
        if c is not None and c <= 384 and mesh_ok:  # wider convs are MXU-fine on XLA
            run, consumed = _linearize_run(atoms[i:], c)
            if run.n_convs >= 2:
                val = _run_fused(module, run, val, interpret=interpret,
                                 weight_grads=weight_grads)
                i += consumed
                continue
        out, f = module._eval(atoms[i][0], (val,), atoms[i][1])
        feats.extend(f)
        val = out
        i += 1
    return val, feats
