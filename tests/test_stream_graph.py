"""Fused stream-graph kernel (ops/pallas/stream_graph.py) vs direct convs.

The graph under test exercises every op feature the all-in-one member
compiler (dsl/fused_member.py) emits: a strided rechannel-style conv, a
multi-edge op (conv over a channel concat as a SUM of per-branch banded
dots), an identity residual, an activation-only op, dilated convs, tanh
heads, and partial last rows (t % fold != 0)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hifigan_tpu.ops.conv import conv1d, leaky_relu
from hifigan_tpu.ops.pallas.stream_graph import (
    Edge,
    Level,
    Op,
    Segment,
    fold_stream,
    fused_stream_graph,
    reference_stream_graph,
    stream_conv,
    unfold_stream,
)


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    return dict(
        raw=jnp.asarray(rng.standard_normal((2, 100, 1)), jnp.float32),
        side=jnp.asarray(rng.standard_normal((2, 50, 2)), jnp.float32),
        W0=mk(5, 1, 2), b0=mk(2), W1=mk(3, 4, 2), b1=mk(2),
        W2=mk(3, 2, 2), b2=mk(2), W3=mk(3, 2, 1), b3=mk(1),
    )


def _oracle(w):
    h = leaky_relu(conv1d(w["raw"], w["W0"], w["b0"], stride=2, padding=2), 0.1)
    cat = jnp.concatenate([h, w["side"]], axis=-1)
    mid = leaky_relu(conv1d(cat, w["W1"], w["b1"], padding=1), 0.1)
    res = mid + conv1d(mid, w["W2"], w["b2"], padding=5, dilation=5)
    post = jnp.tanh(res)
    head = jnp.tanh(conv1d(res, w["W3"], w["b3"], padding=2, dilation=2))
    return h, mid, res, post, head


def _fused(w, t0=100):
    e0 = stream_conv(w["W0"], w["b0"], f_in=8, f_out=4, t_in=t0, s=2, pad=2)
    e1a = stream_conv(w["W1"][:, :2, :], w["b1"], f_in=4, f_out=4, t_in=50, pad=1)
    e1b = stream_conv(w["W1"][:, 2:, :], None, f_in=4, f_out=4, t_in=50, pad=1)
    e2 = stream_conv(w["W2"], w["b2"], f_in=4, f_out=4, t_in=50, pad=5, dilation=5)
    e3 = stream_conv(w["W3"], w["b3"], f_in=4, f_out=4, t_in=50, pad=2, dilation=2)
    seg = Segment(
        levels=(
            Level(t_rows=13, lanes=8, is_input=True, lane_valid=4),
            Level(t_rows=13, lanes=8, is_input=True, lane_valid=4),
            Level(t_rows=e0.rows_out, lanes=e0.lanes_out, lane_valid=e0.lane_valid),
            Level(t_rows=e1a.rows_out, lanes=e1a.lanes_out, lane_valid=e1a.lane_valid),
            Level(t_rows=e2.rows_out, lanes=e2.lanes_out, lane_valid=e2.lane_valid),
            Level(t_rows=e2.rows_out, lanes=e2.lanes_out, lane_valid=e2.lane_valid),
            Level(t_rows=e3.rows_out, lanes=e3.lanes_out, lane_valid=e3.lane_valid),
        ),
        ops=(
            Op(out=2, edges=(Edge(0, e0.kk, e0.pad_l, e0.pad_r),), act="lrelu"),
            Op(out=3, edges=(Edge(2, e1a.kk, e1a.pad_l, e1a.pad_r),
                             Edge(1, e1b.kk, e1b.pad_l, e1b.pad_r)), act="lrelu"),
            Op(out=4, edges=(Edge(3, e2.kk, e2.pad_l, e2.pad_r),), res_from=3),
            Op(out=5, edges=(), res_from=4, act="tanh"),
            Op(out=6, edges=(Edge(4, e3.kk, e3.pad_l, e3.pad_r),), act="tanh"),
        ),
    )
    tables = [e0.table, e1a.table, e1b.table, e2.table, e3.table]
    biases = [e0.zbias.reshape(1, -1), e1a.zbias.reshape(1, -1),
              e2.zbias.reshape(1, -1), jnp.zeros((1, 8), jnp.float32),
              e3.zbias.reshape(1, -1)]
    ins = [fold_stream(w["raw"], 8), fold_stream(w["side"], 4)]
    outs = fused_stream_graph(seg, ins, tables, biases, interpret=True)
    refs = reference_stream_graph(seg, ins, tables, biases)
    cs = (2, 2, 2, 2, 1)
    return (
        [unfold_stream(o, c, 50) for o, c in zip(outs, cs)],
        [unfold_stream(r.astype(jnp.float32), c, 50) for r, c in zip(refs, cs)],
    )


def test_graph_matches_oracle_and_reference():
    w = _weights()
    outs, refs = _fused(w)
    for a, r, o in zip(outs, refs, _oracle(w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=2e-5)
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), atol=2e-5)


def test_graph_gradients_match_oracle():
    w = _weights(1)

    def lf(w):
        outs, _ = _fused(w)
        return sum((i + 1) * o.sum() for i, o in enumerate(outs))

    def lo(w):
        return sum((i + 1) * o.sum() for i, o in enumerate(_oracle(w)))

    gf = jax.grad(lf)(w)
    go = jax.grad(lo)(w)
    for k in w:
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(go[k]), rtol=2e-4, atol=2e-3,
            err_msg=k,
        )


def test_graph_vmap_members():
    """vmap over stacked weights — the nn.vmap ensemble pattern."""
    w = _weights(2)
    n = 3
    stack = {
        k: (jnp.stack([v * (1 + 0.1 * i) for i in range(n)])
            if k.startswith(("W", "b")) else v)
        for k, v in w.items()
    }

    def member(W0, b0, W1, b1, W2, b2, W3, b3):
        outs, _ = _fused({**w, "W0": W0, "b0": b0, "W1": W1, "b1": b1,
                          "W2": W2, "b2": b2, "W3": W3, "b3": b3})
        return outs[-1]

    heads = jax.vmap(member)(stack["W0"], stack["b0"], stack["W1"],
                             stack["b1"], stack["W2"], stack["b2"],
                             stack["W3"], stack["b3"])
    want = jnp.stack([
        _oracle({**w, **{k: stack[k][i] for k in
                         ("W0", "b0", "W1", "b1", "W2", "b2", "W3", "b3")}})[-1]
        for i in range(n)
    ])
    np.testing.assert_allclose(np.asarray(heads), np.asarray(want), atol=2e-5)


def test_graph_multi_grid_step(monkeypatch):
    """Batch split over grid steps (e < N): dW/db accumulate across steps."""
    import hifigan_tpu.ops.pallas.stream_graph as sg

    monkeypatch.setattr(sg, "_VMEM_BUDGET", 1)  # force e == 1
    sg._get_core.cache_clear()
    w = _weights(3)
    w["raw"] = jnp.concatenate([w["raw"], 2 * w["raw"]], axis=0)
    w["side"] = jnp.concatenate([w["side"], 2 * w["side"]], axis=0)

    def lf(w):
        outs, _ = _fused(w)
        return sum((i + 1) * o.sum() for i, o in enumerate(outs))

    def lo(w):
        return sum((i + 1) * o.sum() for i, o in enumerate(_oracle(w)))

    outs, _ = _fused(w)
    for a, o in zip(outs, _oracle(w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=2e-5)
    gf = jax.grad(lf)(w)
    go = jax.grad(lo)(w)
    for k in ("W0", "b0", "W1", "b2", "raw"):
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(go[k]), rtol=2e-4, atol=2e-3,
            err_msg=k,
        )
    sg._get_core.cache_clear()


def test_graph_input_grads_only():
    """weight_grads=False (frozen-copy traversal): input cotangents stay
    exact while the backward kernel skips the table/bias-grad dots, and the
    table cotangents it reports are declared-zero."""
    w = _weights(2)

    def run(w, weight_grads):
        e0 = stream_conv(w["W0"], w["b0"], f_in=8, f_out=4, t_in=100, s=2, pad=2)
        e1 = stream_conv(w["W1"][:, :2, :], w["b1"], f_in=4, f_out=4, t_in=50, pad=1)
        seg = Segment(
            levels=(
                Level(t_rows=13, lanes=8, is_input=True, lane_valid=4),
                Level(t_rows=e0.rows_out, lanes=e0.lanes_out,
                      lane_valid=e0.lane_valid),
                Level(t_rows=e1.rows_out, lanes=e1.lanes_out,
                      lane_valid=e1.lane_valid),
            ),
            ops=(
                Op(out=1, edges=(Edge(0, e0.kk, e0.pad_l, e0.pad_r),), act="lrelu"),
                Op(out=2, edges=(Edge(1, e1.kk, e1.pad_l, e1.pad_r),), act="tanh"),
            ),
        )
        tables = [e0.table, e1.table]
        biases = [e0.zbias.reshape(1, -1), e1.zbias.reshape(1, -1)]
        outs = fused_stream_graph(seg, [fold_stream(w["raw"], 8)], tables,
                                  biases, interpret=True,
                                  weight_grads=weight_grads)
        return sum((i + 1) * o.astype(jnp.float32).sum()
                   for i, o in enumerate(outs))

    g_ref = jax.grad(lambda x: run({**w, "raw": x}, True))(w["raw"])
    g_nodw = jax.grad(lambda x: run({**w, "raw": x}, False))(w["raw"])
    np.testing.assert_allclose(np.asarray(g_nodw), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)
    # declared-zero weight cotangents
    gw = jax.grad(lambda W: run({**w, "W0": W}, False))(w["W0"])
    assert float(jnp.max(jnp.abs(gw))) == 0.0


def test_graph_dead_output_cotangents_skipped():
    """A loss touching only the final head output leaves every interior
    level export's cotangent symbolically zero — the backward must drop
    those dy DMAs (LAST_BWD_DY_MASK) and still match the oracle grads."""
    from hifigan_tpu.ops.pallas import stream_graph as sgm

    w = _weights(2)

    def lf(w):
        outs, _ = _fused(w)
        return jnp.sum(outs[-1] ** 2)

    def lo(w):
        return jnp.sum(_oracle(w)[-1] ** 2)

    gf = jax.grad(lf)(w)
    go = jax.grad(lo)(w)
    mask = sgm.LAST_BWD_DY_MASK
    assert mask is not None and not all(mask), mask
    for k in w:
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(go[k]), rtol=2e-4, atol=2e-3,
            err_msg=k,
        )


def test_graph_unperturbed_inputs_detected():
    """Stop-gradient walls in front of the inputs (the distill disc-train
    pass applies the disc to DETACHED audio) must be detected: the backward
    skips the input-cotangent dots/exports while weight grads stay exact."""
    from hifigan_tpu.ops.pallas import stream_graph as sgm

    w = _weights(3)

    def wall(w):
        return {**w, "raw": jax.lax.stop_gradient(w["raw"]),
                "side": jax.lax.stop_gradient(w["side"])}

    def lf(w):
        outs, _ = _fused(wall(w))
        return sum(jnp.mean(o ** 2) for o in outs)

    def lo(w):
        return sum(jnp.mean(o ** 2) for o in _oracle(wall(w)))

    gf = jax.grad(lf)(w)
    go = jax.grad(lo)(w)
    dx_mask, w_pert = sgm.LAST_BWD_PERTURBED
    assert dx_mask == (False, False), dx_mask
    assert w_pert
    for k in ("W0", "W1", "W2", "W3", "b0", "b1", "b2", "b3"):
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(go[k]), rtol=2e-4, atol=2e-3,
            err_msg=k,
        )
    # the walled inputs' grads are zero on both sides
    assert float(jnp.max(jnp.abs(gf["raw"]))) == 0.0
    assert float(jnp.max(jnp.abs(gf["side"]))) == 0.0
