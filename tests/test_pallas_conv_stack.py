"""Interpreter-mode parity for the fused conv-stack kernel
(ops/pallas/conv_stack.py) against the plain XLA conv chain.

Covers the MSD DiscriminatorS geometry (reference src/models.py:191-217)
scaled down in time: all 7 layer shapes (strides 1/2/4, groups 1/4/16,
the k5 dense tail and the 1-channel conv_post), forward values and
input/weight/bias gradients, single- and two-segment splits, E>1 zoned
tail batching, and the f32 path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.ops.pallas.conv_stack import (
    LayerSpec,
    _plan_segment,
    fused_conv_stack,
)


def _msd_specs(width=128):
    w = width
    s = [
        LayerSpec(w, 41, 2, 4, 20, 20, 0.1),
        LayerSpec(w * 2, 41, 2, 16, 20, 20, 0.1),
        LayerSpec(w * 4, 41, 4, 16, 20, 20, 0.1),
        LayerSpec(w * 8, 41, 4, 16, 20, 20, 0.1),
        LayerSpec(w * 8, 41, 1, 16, 20, 20, 0.1),
        LayerSpec(w * 8, 5, 1, 1, 2, 2, 0.1),
        LayerSpec(1, 3, 1, 1, 1, 1, 1.0),
    ]
    return s


def _ref_chain(x, kernels, biases, specs):
    """Plain XLA reference: conv_general_dilated + leaky-relu per layer."""
    ys = []
    h = x
    for sp, k, b in zip(specs, kernels, biases):
        out = jax.lax.conv_general_dilated(
            h.astype(jnp.float32),
            k.astype(jnp.float32),
            window_strides=(sp.stride,),
            padding=[(sp.pad_l, sp.pad_r)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=sp.groups,
        )
        if b is not None:
            out = out + b.astype(jnp.float32)
        if sp.slope != 1.0:
            out = jnp.where(out >= 0, out, sp.slope * out)
        h = out.astype(x.dtype)
        ys.append(h)
    return ys


def _make_params(rng, specs, c_in, dtype=jnp.float32):
    kernels, biases = [], []
    c = c_in
    for i, sp in enumerate(specs):
        k1, k2, rng = jax.random.split(rng, 3)
        fan = (c // sp.groups) * sp.kernel
        kernels.append(
            jax.random.normal(k1, (sp.kernel, c // sp.groups, sp.c_out), dtype)
            / np.sqrt(fan)
        )
        biases.append(0.1 * jax.random.normal(k2, (sp.c_out,), dtype))
        c = sp.c_out
    return kernels, biases


def test_plan_geometry_msd_scale0():
    """The real scale-0 wide-segment plan reproduces the hand math."""
    plan = _plan_segment(_msd_specs()[:3], 8192, 128, 1)
    l1 = plan.layers[0]
    assert (l1.t_in, l1.t_out, l1.s) == (8192, 4096, 2)
    assert l1.nb == 1 and l1.cb_in == 128 and l1.cb_out == 128  # g4 densified
    l2 = plan.layers[1]
    assert (l2.t_out, l2.nb, l2.cb_in, l2.cb_out) == (2048, 2, 64, 128)
    l3 = plan.layers[2]
    assert (l3.t_out, l3.nb, l3.cb_in, l3.cb_out) == (512, 4, 64, 128)
    for lp in plan.layers:
        assert lp.st0 >= 0
        assert lp.rows_in % max(lp.s, 1) == 0


@pytest.mark.parametrize("n_elems,t_in", [(2, 512), (4, 256)])
def test_fused_stack_forward_parity(n_elems, t_in):
    specs = _msd_specs()
    rng = jax.random.PRNGKey(0)
    kernels, biases = _make_params(rng, specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(7), (n_elems, t_in, 128))
    got = fused_conv_stack(x, kernels, biases, specs, interpret=True)
    want = _ref_chain(x, kernels, biases, specs)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.shape == w.shape, (i, g.shape, w.shape)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4, err_msg=f"layer {i}"
        )


def test_fused_stack_grad_parity():
    specs = _msd_specs()
    rng = jax.random.PRNGKey(1)
    kernels, biases = _make_params(rng, specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 256, 128))
    # weighted sum over every fmap exercises every dy cotangent path
    weights = [0.3 + 0.1 * i for i in range(len(specs))]

    def loss_fused(x, kernels, biases):
        ys = fused_conv_stack(x, kernels, biases, specs, interpret=True)
        return sum(w * jnp.sum(jnp.abs(y.astype(jnp.float32)))
                   for w, y in zip(weights, ys))

    def loss_ref(x, kernels, biases):
        ys = _ref_chain(x, kernels, biases, specs)
        return sum(w * jnp.sum(jnp.abs(y.astype(jnp.float32)))
                   for w, y in zip(weights, ys))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, kernels, biases)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernels, biases)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=5e-4, atol=5e-4, err_msg="dx")
    for i, (a, b) in enumerate(zip(gf[1], gr[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=f"dW {i}")
    for i, (a, b) in enumerate(zip(gf[2], gr[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=f"db {i}")


def test_fused_stack_single_zoned_segment():
    """A stack that is small-T from layer 1 runs as one zoned segment."""
    specs = [
        LayerSpec(128, 9, 1, 1, 4, 4, 0.1),
        LayerSpec(256, 9, 2, 2, 4, 4, 0.1),
        LayerSpec(128, 5, 1, 1, 2, 2, 1.0),
    ]
    kernels, biases = _make_params(jax.random.PRNGKey(2), specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 128))
    got = fused_conv_stack(x, kernels, biases, specs, small_t=128,
                           e_small=4, interpret=True)
    want = _ref_chain(x, kernels, biases, specs)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=2e-4, err_msg=f"layer {i}")


def test_fused_stack_no_bias_and_bf16():
    specs = _msd_specs()[:2]
    kernels, _ = _make_params(jax.random.PRNGKey(3), specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 256, 128))
    got = fused_conv_stack(
        x.astype(jnp.bfloat16),
        [k.astype(jnp.bfloat16) for k in kernels],
        [None, None], specs, interpret=True,
    )
    want = _ref_chain(x, kernels, [None, None], specs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w), rtol=0.1, atol=0.05
        )


def test_discriminator_s_fused_stack_parity():
    """DiscriminatorS conv_impl='fused_stack' matches the XLA path — same
    params, forward fmaps/logits and grads (weight-normed + spectral)."""
    from hifigan_tpu.models.discriminators import DiscriminatorS

    for spectral in (False, True):
        d_ref = DiscriminatorS(use_spectral_norm=spectral)
        d_fused = DiscriminatorS(
            use_spectral_norm=spectral, conv_impl="fused_stack",
            conv_interpret=True,
        )
        x = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (2, 512))
        v = d_ref.init(jax.random.PRNGKey(0), x)
        v2 = d_fused.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

        def loss(v, d):
            logits, fmap = d.apply(v, x)
            return jnp.sum(jnp.abs(logits)) + 0.1 * sum(
                jnp.mean(jnp.abs(f)) for f in fmap
            )

        lr, gr = jax.value_and_grad(functools.partial(loss, d=d_ref))(v)
        lf, gf = jax.value_and_grad(functools.partial(loss, d=d_fused))(v)
        np.testing.assert_allclose(float(lf), float(lr), rtol=2e-4)
        flat_r = jax.tree_util.tree_leaves_with_path(gr)
        flat_f = dict(
            (jax.tree_util.keystr(p), a)
            for p, a in jax.tree_util.tree_leaves_with_path(gf)
        )
        for p, a in flat_r:
            bkey = jax.tree_util.keystr(p)
            np.testing.assert_allclose(
                np.asarray(flat_f[bkey]), np.asarray(a), rtol=3e-3, atol=3e-3,
                err_msg=f"{'spectral' if spectral else 'weight'} {bkey}",
            )


def test_zone_grouped_layer_matches_grouped_conv():
    """The group time-fold transform is exact for every MSD geometry
    (standalone, via XLA conv on the folded layout)."""
    from hifigan_tpu.ops.pallas.conv_stack import (
        fold_group_zones, unfold_group_zones, zone_grouped_layer)

    rng = np.random.default_rng(0)
    cases = [  # (T, g, ci_g, co_g, K, s, pad, f_in, f_out)
        (256, 16, 8, 16, 41, 2, 20, 16, 8),
        (128, 16, 16, 32, 41, 4, 20, 8, 4),
        (64, 16, 64, 64, 41, 1, 20, 2, 2),
        (64, 4, 32, 32, 41, 2, 20, 4, 4),
    ]
    for (T, g, ci, co, K, s, pad, fi, fo) in cases:
        x = jnp.asarray(rng.standard_normal((2, T, g * ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, ci, g * co)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((g * co,)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (s,), [(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g) + b
        zk, zb, spec = zone_grouped_layer(w, b, s, pad, fi, fo, g, 1.0, T)
        yz = jax.lax.conv_general_dilated(
            fold_group_zones(x, g, fi), zk, (spec.stride,),
            [(spec.pad_l, spec.pad_r)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g) + zb
        got = unfold_group_zones(yz, g, fo)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4,
            err_msg=str((T, g, ci, co, K, s)))


def test_discriminator_s_fused_zoned_parity():
    """conv_impl='fused_zoned' (group time-fold chains, no densification
    pad) matches the XLA path: loss values and every parameter grad. The
    fmap layouts differ (zone permutation) but the elementwise fm-style
    loss is layout-invariant."""
    from hifigan_tpu.models.discriminators import DiscriminatorS

    d_ref = DiscriminatorS()
    d_zone = DiscriminatorS(conv_impl="fused_zoned", conv_interpret=True)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (2, 512))
    v = d_ref.init(jax.random.PRNGKey(0), x)
    v2 = d_zone.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(v, d):
        logits, fmap = d.apply(v, x)
        return jnp.sum(jnp.abs(logits)) + 0.1 * sum(
            jnp.mean(jnp.abs(f)) for f in fmap
        )

    lr, gr = jax.value_and_grad(functools.partial(loss, d=d_ref))(v)
    lf, gf = jax.value_and_grad(functools.partial(loss, d=d_zone))(v)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-4)
    flat_f = dict(
        (jax.tree_util.keystr(p), a)
        for p, a in jax.tree_util.tree_leaves_with_path(gf)
    )
    for p, a in jax.tree_util.tree_leaves_with_path(gr):
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(a), rtol=3e-3, atol=3e-3,
            err_msg=key,
        )


def test_discriminator_s_fused_zoned_odd_length():
    """Odd input lengths (the real MSD scale-1/2 sizes are 4097/2049) zone
    into partial rows that the kernel lane-masks: logits and logit-grads
    match the XLA path exactly, and every zone fmap unfolds to the XLA
    fmap."""
    from hifigan_tpu.models.discriminators import DiscriminatorS
    from hifigan_tpu.ops.pallas.conv_stack import unfold_group_zones

    d_ref = DiscriminatorS()
    # zone_min_groups=2 keeps the g=4 zone geometry covered (the shipped
    # default 8 leaves g<=4 layers on the std block-dense path)
    d_zone = DiscriminatorS(
        conv_impl="fused_zoned", conv_interpret=True, zone_min_groups=2
    )
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (2, 257))
    v = d_ref.init(jax.random.PRNGKey(0), x)

    def logit_loss(v, d):
        logits, fmap = d.apply(v, x)
        return jnp.sum(jnp.abs(logits)), fmap

    (lr, fm_r), gr = jax.value_and_grad(
        functools.partial(logit_loss, d=d_ref), has_aux=True)(v)
    (lf, fm_f), gf = jax.value_and_grad(
        functools.partial(logit_loss, d=d_zone), has_aux=True)(v)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-4)
    flat_f = dict(
        (jax.tree_util.keystr(p), a)
        for p, a in jax.tree_util.tree_leaves_with_path(gf)
    )
    for p, a in jax.tree_util.tree_leaves_with_path(gr):
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(a), rtol=3e-3, atol=3e-3,
            err_msg=key,
        )
    # zone fmaps (indices 1..5) unfold+slice to the XLA fmaps
    zone_geo = [(4, 4), (16, 8), (16, 4), (16, 2), (16, 2)]  # (g, f_out)
    for j, (g, fo) in enumerate(zone_geo, start=1):
        got = unfold_group_zones(fm_f[j], g, fo, t_out=fm_r[j].shape[1])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(fm_r[j]), atol=2e-4, rtol=2e-3,
            err_msg=f"fmap {j}",
        )


def test_backward_chunking_matches_monolithic(monkeypatch):
    """Force a tiny backward VMEM budget so every layer becomes its own
    backward chunk; grads must match the XLA reference exactly (the real
    MSD geometry splits its backward this way on hardware)."""
    import hifigan_tpu.ops.pallas.conv_stack as cs

    monkeypatch.setattr(cs, "_BWD_VMEM_BUDGET", 1)
    cs._get_stack_core.cache_clear()
    cs._plans.cache_clear()
    try:
        specs = _msd_specs()[:4]
        kernels, biases = _make_params(jax.random.PRNGKey(4), specs, 128)
        x = jax.random.normal(jax.random.PRNGKey(11), (2, 256, 128))
        weights = [0.5 + 0.1 * i for i in range(len(specs))]

        def loss_fused(x, kernels, biases):
            ys = fused_conv_stack(x, kernels, biases, specs, interpret=True)
            return sum(w * jnp.sum(jnp.abs(y.astype(jnp.float32)))
                       for w, y in zip(weights, ys))

        def loss_ref(x, kernels, biases):
            ys = _ref_chain(x, kernels, biases, specs)
            return sum(w * jnp.sum(jnp.abs(y.astype(jnp.float32)))
                       for w, y in zip(weights, ys))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, kernels, biases)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernels, biases)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                                   rtol=5e-4, atol=5e-4, err_msg="dx")
        for i, (a, b) in enumerate(zip(gf[1], gr[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=f"dW {i}")
    finally:
        cs._get_stack_core.cache_clear()
        cs._plans.cache_clear()


def test_bwd_chunks_respect_itemsize():
    """Backward chunking sizes VMEM by the ACTUAL activation itemsize: the
    f32 plan must never pack chunks larger than the bf16 plan (regression
    for the hardcoded bf16 itemsize)."""
    from hifigan_tpu.ops.pallas.conv_stack import _bwd_chunks, _bwd_vmem_bytes, _plans

    specs = tuple(_msd_specs())
    plans = _plans(specs, 8192, 128, 16, 256, 4)
    ch2 = _bwd_chunks(plans, specs, 2)
    ch4 = _bwd_chunks(plans, specs, 4)
    from hifigan_tpu.ops.pallas.conv_stack import _BWD_VMEM_BUDGET

    for _i0, k, plan in ch4:
        # multi-layer chunks fit the budget; a single layer is the
        # irreducible floor (scale-0 layer 0 alone is ~63 MB at f32)
        if k > 1:
            assert _bwd_vmem_bytes(plan, 4) <= _BWD_VMEM_BUDGET
    # the f32 chunking is never coarser than bf16's
    assert len(ch4) >= len(ch2)


def test_fused_conv_stack_mesh_rejects_indivisible_batch():
    import jax
    import pytest
    from jax.sharding import Mesh
    import numpy as np

    from hifigan_tpu.ops.pallas.conv_stack import LayerSpec, fused_conv_stack

    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
    specs = [LayerSpec(128, 15, 1, 1, 7, 7, 0.1)]
    kernels, biases = _make_params(jax.random.PRNGKey(0), specs, 128)
    x = jnp.zeros((6, 64, 128))  # 6 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        fused_conv_stack(x, kernels, biases, specs, interpret=True, mesh=mesh)


def test_fused_stack_input_grads_only():
    """weight_grads=False (the generator-update traversal: discriminator
    weights are frozen constants) still produces exact INPUT grads while
    the backward kernels skip every weight-grad dot; the weight/bias
    cotangents it hands back are declared-zero."""
    specs = _msd_specs()
    kernels, biases = _make_params(jax.random.PRNGKey(12), specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 256, 128))
    weights = [0.3 + 0.1 * i for i in range(len(specs))]

    def loss(x, weight_grads):
        ys = fused_conv_stack(x, kernels, biases, specs, interpret=True,
                              weight_grads=weight_grads)
        return sum(w * jnp.sum(jnp.abs(y.astype(jnp.float32)))
                   for w, y in zip(weights, ys))

    def loss_ref(x):
        ys = _ref_chain(x, kernels, biases, specs)
        return sum(w * jnp.sum(jnp.abs(y.astype(jnp.float32)))
                   for w, y in zip(weights, ys))

    g_nodw = jax.grad(lambda x: loss(x, False))(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_nodw), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4, err_msg="dx (no dw)")


def test_fused_stack_weight_grads_false_returns_zero_dw():
    specs = _msd_specs()[:3]
    kernels, biases = _make_params(jax.random.PRNGKey(14), specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 256, 128))

    def loss(ks):
        ys = fused_conv_stack(x, ks, biases, specs, interpret=True,
                              weight_grads=False)
        return jnp.sum(jnp.abs(ys[-1].astype(jnp.float32)))

    gk = jax.grad(loss)(kernels)
    for i, g in enumerate(gk):
        assert float(jnp.max(jnp.abs(g))) == 0.0, f"dW {i} not zero"


def test_discriminator_s_fused_input_grads_only_parity():
    """DiscriminatorS(weight_grads=False) input-grad parity with the XLA
    path — the exact shape of the train step's generator update."""
    from hifigan_tpu.models.discriminators import DiscriminatorS

    d_ref = DiscriminatorS()
    d_fused = DiscriminatorS(conv_impl="fused_stack", conv_interpret=True)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(16), (2, 512))
    v = d_ref.init(jax.random.PRNGKey(0), x)

    def loss(x, d, wg):
        logits, fmap = d.apply(v, x, False, wg)
        return jnp.sum(jnp.abs(logits)) + 0.1 * sum(
            jnp.mean(jnp.abs(f)) for f in fmap
        )

    gr = jax.grad(functools.partial(loss, d=d_ref, wg=True))(x)
    gf = jax.grad(functools.partial(loss, d=d_fused, wg=False))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=3e-3, atol=3e-3)


def test_fused_stack_dead_fmap_cotangents_skipped():
    """A loss that consumes only the LAST output (the D-update traversal:
    LSGAN on logits, fmaps unused) reaches the backward as SymbolicZero
    cotangents for every interior layer; the bwd drops those dy DMAs
    (LAST_BWD_DY_MASK records the liveness) and all grads — input, weight,
    bias — still match the XLA chain differentiated the same way."""
    from hifigan_tpu.ops.pallas import conv_stack as cs

    specs = _msd_specs()
    kernels, biases = _make_params(jax.random.PRNGKey(20), specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 256, 128))

    def loss(x, ks, bs):
        ys = fused_conv_stack(x, ks, bs, specs, interpret=True)
        return jnp.sum(ys[-1].astype(jnp.float32) ** 2)

    def loss_ref(x, ks, bs):
        ys = _ref_chain(x, ks, bs, specs)
        return jnp.sum(ys[-1].astype(jnp.float32) ** 2)

    gx, gk, gb = jax.grad(loss, argnums=(0, 1, 2))(x, kernels, biases)
    rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernels, biases)
    mask = cs.LAST_BWD_DY_MASK
    assert mask is not None and mask[-1] and not any(mask[:-1]), mask
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=5e-4, atol=5e-4, err_msg="dx")
    for i, (a, b) in enumerate(zip(gk, rk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=f"dW{i}")
    for i, (a, b) in enumerate(zip(gb, rb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=f"db{i}")


def test_fused_stack_dead_dys_with_weight_grads_false():
    """Combined declarations: frozen weights (weight_grads=False) AND a
    logits-only loss — the backward runs with no x DMA, no rebuild, no
    weight-grad dots and only one live dy; input grads stay exact."""
    from hifigan_tpu.ops.pallas import conv_stack as cs

    specs = _msd_specs()
    kernels, biases = _make_params(jax.random.PRNGKey(22), specs, 128)
    x = jax.random.normal(jax.random.PRNGKey(23), (2, 256, 128))

    def loss(x):
        ys = fused_conv_stack(x, kernels, biases, specs, interpret=True,
                              weight_grads=False)
        return jnp.sum(ys[-1].astype(jnp.float32) ** 2)

    def loss_ref(x):
        ys = _ref_chain(x, kernels, biases, specs)
        return jnp.sum(ys[-1].astype(jnp.float32) ** 2)

    gx = jax.grad(loss)(x)
    rx = jax.grad(loss_ref)(x)
    mask = cs.LAST_BWD_DY_MASK
    assert mask is not None and mask[-1] and not any(mask[:-1]), mask
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=5e-4, atol=5e-4)


def test_discriminator_s_d_update_traversal_parity():
    """The exact D-update shape: differentiate an LSGAN logits loss wrt the
    discriminator PARAMS (fmaps returned but unused). The fused path must
    (a) skip the dead fmap cotangents and (b) produce the same param grads
    as the plain XLA DiscriminatorS."""
    from hifigan_tpu.models.discriminators import DiscriminatorS
    from hifigan_tpu.ops.pallas import conv_stack as cs

    d_ref = DiscriminatorS()
    d_fused = DiscriminatorS(conv_impl="fused_stack", conv_interpret=True)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(24), (2, 512))
    v = d_ref.init(jax.random.PRNGKey(1), x)

    def d_loss(params, d):
        logits, _fmap = d.apply({"params": params}, x)
        return jnp.mean((logits - 1.0) ** 2)

    gr = jax.grad(functools.partial(d_loss, d=d_ref))(v["params"])
    gf = jax.grad(functools.partial(d_loss, d=d_fused))(v["params"])
    mask = cs.LAST_BWD_DY_MASK
    assert mask is not None and mask[-1] and not any(mask[:-1]), mask
    # the stack INPUT here is conv_0's output, and conv_0's weights are
    # being differentiated — so the input is correctly detected as
    # perturbed (its cotangent feeds conv_0's weight grad); the dx skip
    # only engages for stacks fed directly by data (see the standalone
    # fused_conv_stack tests / the distill stream kernels)
    assert cs.LAST_BWD_PERTURBED == (True, True), cs.LAST_BWD_PERTURBED
    flat_r = jax.tree_util.tree_leaves_with_path(gr)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    assert len(flat_r) == len(flat_f)
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf),
            rtol=3e-3, atol=3e-3, err_msg=jax.tree_util.keystr(path),
        )


def test_fused_conv_stack_multi_input_shares_tables():
    """The multi-input form (pack the weight tables once, run the kernels
    per input — the GAN's real/fake traversals) matches per-input calls on
    forward values, and its weight grads are the sum of the per-input
    weight grads."""
    key = jax.random.PRNGKey(11)
    specs = [
        LayerSpec(128, 9, 2, 4, 4, 4, 0.1),
        LayerSpec(256, 5, 1, 1, 2, 2, 1.0),
    ]
    kernels = [
        0.2 * jax.random.normal(jax.random.PRNGKey(1), (9, 32, 128)),
        0.2 * jax.random.normal(jax.random.PRNGKey(2), (5, 128, 256)),
    ]
    biases = [
        0.1 * jax.random.normal(jax.random.PRNGKey(3), (128,)),
        0.1 * jax.random.normal(jax.random.PRNGKey(4), (256,)),
    ]
    x1, x2 = jax.random.normal(key, (2, 2, 192, 128))

    def loss_multi(ks):
        ys1, ys2 = fused_conv_stack(
            [x1, x2], ks, biases, specs, interpret=True
        )
        return sum(jnp.mean(jnp.abs(y)) for y in ys1 + ys2)

    def loss_single(ks, x):
        ys = fused_conv_stack(x, ks, biases, specs, interpret=True)
        return sum(jnp.mean(jnp.abs(y)) for y in ys)

    lm, gm = jax.value_and_grad(loss_multi)(kernels)
    l1, g1 = jax.value_and_grad(functools.partial(loss_single, x=x1))(kernels)
    l2, g2 = jax.value_and_grad(functools.partial(loss_single, x=x2))(kernels)
    np.testing.assert_allclose(float(lm), float(l1) + float(l2), rtol=1e-6)
    for a, b, c in zip(gm, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b) + np.asarray(c), rtol=1e-5, atol=1e-6
        )


def test_discriminator_s_paired_call_parity():
    """DiscriminatorS(pair=...) — one packed weight set for the real/fake
    traversals — is exact vs two separate calls, fused_stack AND
    fused_zoned forms, values and grads."""
    from hifigan_tpu.models.discriminators import DiscriminatorS

    for impl in ("fused_stack", "fused_zoned"):
        d = DiscriminatorS(
            conv_impl=impl, conv_interpret=True, zone_min_groups=8
        )
        y = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (2, 512))
        y_hat = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (2, 512))
        v = d.init(jax.random.PRNGKey(0), y)

        def loss_pair(v):
            (lr, fr), (lg, fg) = d.apply(v, y, False, True, pair=y_hat)
            return (
                jnp.sum(jnp.abs(lr)) + jnp.sum(jnp.abs(lg))
                + 0.1 * sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(fr, fg))
            )

        def loss_two(v):
            lr, fr = d.apply(v, y)
            lg, fg = d.apply(v, y_hat)
            return (
                jnp.sum(jnp.abs(lr)) + jnp.sum(jnp.abs(lg))
                + 0.1 * sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(fr, fg))
            )

        lp, gp = jax.value_and_grad(loss_pair)(v)
        lt, gt = jax.value_and_grad(loss_two)(v)
        np.testing.assert_allclose(float(lp), float(lt), rtol=1e-6)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gt),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"{impl} {jax.tree_util.keystr(pa)}",
            )
