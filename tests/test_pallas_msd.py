"""Fused Pallas MSD conv parity: every DiscriminatorS layer geometry
(reference src/models.py:195-205), forward + input/weight/bias gradients,
against the lax.conv_general_dilated composition (interpreter mode on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.ops.pallas.msd_conv import msd_conv1d_lrelu

# (Cin, Cout, K, stride, groups, padding) — the 8 MSD layers at width 128,
# exercised at reduced width/time to keep the CPU interpreter fast
LAYERS = [
    (1, 16, 15, 1, 1, 7),
    (16, 16, 41, 2, 4, 20),
    (16, 32, 41, 2, 16, 20),
    (32, 64, 41, 4, 16, 20),
    (64, 128, 41, 4, 16, 20),
    (128, 128, 41, 1, 16, 20),
    (128, 128, 5, 1, 1, 2),
    (128, 1, 3, 1, 1, 1),
]


def _oracle(x, kernel, bias, *, stride, padding, groups, slope):
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return jnp.where(y >= 0, y, slope * y) if slope != 1.0 else y


@pytest.mark.parametrize("layer", LAYERS, ids=[f"l{i}" for i in range(len(LAYERS))])
def test_msd_conv_forward_and_grads_match_xla(layer):
    cin, cout, k, stride, groups, pad = layer
    rng = np.random.default_rng(hash(layer) % 2**32)
    batch, t = 2, 256
    x = jnp.asarray(rng.standard_normal((batch, t, cin)), jnp.float32) * 0.3
    kernel = jnp.asarray(
        rng.standard_normal((k, cin // groups, cout)), jnp.float32
    ) * 0.1
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32) * 0.1
    slope = 0.1 if cout != 1 else 1.0

    got = msd_conv1d_lrelu(
        x, kernel, bias, stride=stride, padding=pad, groups=groups, slope=slope,
        interpret=True,
    )
    want = _oracle(x, kernel, bias, stride=stride, padding=pad, groups=groups, slope=slope)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)

    # gradients: weighted sum so the cotangent is non-trivial
    w_out = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)

    def loss_pallas(x, kernel, bias):
        y = msd_conv1d_lrelu(
            x, kernel, bias, stride=stride, padding=pad, groups=groups, slope=slope,
            interpret=True,
        )
        return (y * w_out).sum()

    def loss_xla(x, kernel, bias):
        return (_oracle(x, kernel, bias, stride=stride, padding=pad, groups=groups,
                        slope=slope) * w_out).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, kernel, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, kernel, bias)
    for name, a, b in zip(("dx", "dkernel", "dbias"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4, err_msg=name
        )


def test_msd_conv_no_bias_and_asym_padding():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((5, 8, 16)), jnp.float32) * 0.2
    got = msd_conv1d_lrelu(
        x, kernel, None, stride=1, padding=(4, 2), groups=1, slope=0.2, interpret=True
    )
    want = jax.lax.conv_general_dilated(
        x, kernel, (1,), [(4, 2)], dimension_numbers=("NWC", "WIO", "NWC")
    )
    want = jnp.where(want >= 0, want, 0.2 * want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("dk", [(3, 3), (3, 9), (5, 2)])
def test_msd_conv_dilated(dk):
    """Dilated stride-1 convs (the keeper/hunter/sniffer 'same' stacks and
    the generator resblocks use d in {2,3,9,27})."""
    k, d = dk
    rng = np.random.default_rng(k * 100 + d)
    cin, cout = 8, 16
    pad = (k - 1) * d // 2 * 2 // 2  # torch 'same' for odd k
    pad = (k - 1) * d // 2
    x = jnp.asarray(rng.standard_normal((2, 96, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32) * 0.2
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32) * 0.1

    got = msd_conv1d_lrelu(
        x, kernel, bias, stride=1, padding=pad, dilation=d, groups=1, slope=0.1,
        interpret=True,
    )
    want = jax.lax.conv_general_dilated(
        x, kernel, (1,), [(pad, pad)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias
    want = jnp.where(want >= 0, want, 0.1 * want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)

    w_out = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
    gp = jax.grad(lambda a, b, c: (msd_conv1d_lrelu(
        a, b, c, stride=1, padding=pad, dilation=d, groups=1, slope=0.1,
        interpret=True) * w_out).sum(), argnums=(0, 1, 2))(x, kernel, bias)
    def xla_loss(a, b, c):
        y = jax.lax.conv_general_dilated(
            a, b, (1,), [(pad, pad)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC")) + c
        return (jnp.where(y >= 0, y, 0.1 * y) * w_out).sum()
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(x, kernel, bias)
    for name, a, b in zip(("dx", "dkernel", "dbias"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-4, err_msg=name)


def test_msd_conv_vmapped_members():
    """The op composes with nn.vmap-style member batching (the distill
    disc's vmapped ensembles): vmap over stacked weights matches a loop."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
    kernels = jnp.asarray(rng.standard_normal((3, 5, 8, 16)), jnp.float32) * 0.2
    biases = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32) * 0.1

    f = lambda kk, bb: msd_conv1d_lrelu(
        x, kk, bb, stride=1, padding=2, groups=1, slope=0.1, interpret=True
    )
    got = jax.vmap(f)(kernels, biases)
    want = jnp.stack([f(kernels[i], biases[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_dsl_discriminator_pallas_conv_parity():
    """The full all-in-one ensemble discriminator (DSL) with
    conv_impl='pallas_interpret' matches the XLA path — fwd and grads —
    including convs inside the vmapped ensemble."""
    from hifigan_tpu.dsl.module import ConfigurableModule
    from hifigan_tpu.dsl.parsing import parse_layers
    from hifigan_tpu.dsl.static_configs import get_discriminator_config

    layers = parse_layers(["roll:1,5,1", "roll:2,5,2", "all:3,5,1", "roll:4,3,1"])
    cfg = get_discriminator_config(layers, expansion_size=1, ensemble_size=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 1)), jnp.float32)

    mod_x = ConfigurableModule(config=cfg, conv_impl="xla")
    mod_p = ConfigurableModule(config=cfg, conv_impl="pallas_interpret")
    v = mod_x.init(jax.random.PRNGKey(0), x)

    out_x = mod_x.apply(v, x)
    out_p = mod_p.apply(v, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(out_x), jax.tree_util.tree_leaves(out_p)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)

    def loss(mod, v):
        out = mod.apply(v, x)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out["output"]))

    gx = jax.grad(lambda v: loss(mod_x, v))(v)
    gp = jax.grad(lambda v: loss(mod_p, v))(v)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gx), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=str(ka)
        )
