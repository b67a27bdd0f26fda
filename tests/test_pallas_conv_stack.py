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
