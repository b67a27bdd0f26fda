"""torch-equivalence tests for the conv primitives (NWC vs torch NCW)."""

import numpy as np
import pytest

from tests.conftest import requires_torch

import jax.numpy as jnp

from hifigan_tpu.ops.conv import (
    avg_pool1d,
    conv1d,
    conv2d,
    conv_transpose1d,
    leaky_relu,
    weight_norm_kernel,
)


@requires_torch
@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride,dilation,groups,pad",
    [
        (8, 16, 3, 1, 1, 1, 1),
        (16, 16, 7, 1, 3, 1, 9),
        (8, 32, 41, 2, 1, 4, 20),
        (32, 32, 41, 4, 1, 16, 20),
        (80, 64, 7, 1, 1, 1, 3),
    ],
)
def test_conv1d_matches_torch(rng, in_ch, out_ch, k, stride, dilation, groups, pad):
    import torch

    x = rng.standard_normal((2, in_ch, 64)).astype(np.float32)
    w = rng.standard_normal((out_ch, in_ch // groups, k)).astype(np.float32)
    b = rng.standard_normal((out_ch,)).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dilation, groups=groups,
    ).numpy()

    got = conv1d(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(w.transpose(2, 1, 0)),
        jnp.asarray(b),
        stride=stride, padding=pad, dilation=dilation, groups=groups,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=2e-5, rtol=1e-5)


@requires_torch
@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride",
    [(16, 8, 16, 8), (16, 8, 4, 2), (32, 16, 16, 8), (8, 4, 8, 4)],
)
def test_conv_transpose1d_matches_torch(rng, in_ch, out_ch, k, stride):
    import torch

    pad = (k - stride) // 2
    x = rng.standard_normal((2, in_ch, 32)).astype(np.float32)
    w = rng.standard_normal((in_ch, out_ch, k)).astype(np.float32)
    b = rng.standard_normal((out_ch,)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad,
    ).numpy()

    got = conv_transpose1d(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(w.transpose(2, 0, 1)),
        jnp.asarray(b),
        stride=stride, padding=pad,
    )
    assert got.shape[1] == ref.shape[2]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=2e-5, rtol=1e-5)


@requires_torch
def test_conv2d_matches_torch(rng):
    import torch

    x = rng.standard_normal((2, 4, 32, 8)).astype(np.float32)  # NCHW
    w = rng.standard_normal((16, 4, 5, 1)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=(3, 1), padding=(2, 0),
    ).numpy()

    got = conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        jnp.asarray(b),
        stride=(3, 1), padding=(2, 0),
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=2e-5, rtol=1e-5)


@requires_torch
def test_avg_pool1d_matches_torch(rng):
    import torch

    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    ref = torch.nn.functional.avg_pool1d(torch.from_numpy(x), 4, 2, padding=2).numpy()
    got = avg_pool1d(jnp.asarray(x.transpose(0, 2, 1)), 4, 2, padding=2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-6)


@requires_torch
def test_weight_norm_kernel_matches_torch(rng):
    import torch

    w = rng.standard_normal((16, 8, 3)).astype(np.float32)  # torch (O,I,K)
    lin = torch.nn.Conv1d(8, 16, 3, bias=False)
    lin.weight.data = torch.from_numpy(w.copy())
    wn = torch.nn.utils.weight_norm(lin)
    # Perturb g to a non-trivial value.
    wn.weight_g.data.mul_(1.7)
    ref_w = wn.weight_g.data.numpy().reshape(-1, 1, 1) * (
        wn.weight_v.data.numpy()
        / np.linalg.norm(wn.weight_v.data.numpy().reshape(16, -1), axis=1).reshape(-1, 1, 1)
    )

    v = jnp.asarray(w.transpose(2, 1, 0))  # (K,I,O)
    g = jnp.asarray(wn.weight_g.data.numpy().reshape(-1))
    got = weight_norm_kernel(v, g, axes=(0, 1))
    np.testing.assert_allclose(np.asarray(got).transpose(2, 1, 0), ref_w, atol=1e-5, rtol=1e-5)


def test_leaky_relu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(leaky_relu(x, 0.1), [-0.2, 0.0, 3.0])


@requires_torch
@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride,pad",
    [
        (16, 8, 16, 8, 4), (16, 8, 4, 2, 1), (32, 16, 16, 8, 4), (8, 4, 8, 4, 2),
        (8, 4, 7, 3, 2),   # k not a multiple of stride
        (8, 4, 5, 5, 0),   # k == stride, no padding
        (8, 4, 9, 2, 3),   # wide kernel, small stride
    ],
)
def test_conv_transpose1d_polyphase_matches_torch(rng, in_ch, out_ch, k, stride, pad):
    """The default polyphase decomposition is exact for every geometry."""
    import torch

    x = rng.standard_normal((2, in_ch, 20)).astype(np.float32)
    w = rng.standard_normal((in_ch, out_ch, k)).astype(np.float32)
    b = rng.standard_normal((out_ch,)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad,
    ).numpy()

    for method in ("polyphase", "polyphase_dot", "dilated"):
        got = conv_transpose1d(
            jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(w.transpose(2, 0, 1)),
            jnp.asarray(b),
            stride=stride, padding=pad, method=method,
        )
        assert got.shape[1] == ref.shape[2], method
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), ref, atol=2e-5, rtol=1e-5, err_msg=method
        )


def test_fold_weight_norm_square_transposed():
    """Square (I == O) transposed kernels fold on the input-channel axes via
    the structural ups_*/trans name marker, not shape sniffing."""
    import jax.numpy as jnp

    from hifigan_tpu.models.layers import fold_weight_norm
    from hifigan_tpu.ops.conv import weight_norm_kernel

    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((8, 6, 6)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    folded = fold_weight_norm({"ups_0": {"v": v, "g": g}, "convs_0": {"v": v, "g": g}})
    np.testing.assert_allclose(
        np.asarray(folded["ups_0"]["kernel"]),
        np.asarray(weight_norm_kernel(v, g, (0, 2))),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(folded["convs_0"]["kernel"]),
        np.asarray(weight_norm_kernel(v, g, (0, 1))),
        rtol=1e-6,
    )
    # explicit predicate override
    folded2 = fold_weight_norm({"up": {"v": v, "g": g}}, is_transposed=lambda p: True)
    np.testing.assert_allclose(
        np.asarray(folded2["up"]["kernel"]),
        np.asarray(weight_norm_kernel(v, g, (0, 2))),
        rtol=1e-6,
    )


def test_grouped_conv_block_dense_exact():
    """groups_impl='block_dense' computes the identical function to the
    native grouped lowering (off-block weights are zeros)."""
    import jax
    from hifigan_tpu.models.layers import NormConv1d

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 16)), jnp.float32)
    kw = dict(features=32, kernel_size=5, stride=2, padding=2, groups=4, norm="weight")
    m_native = NormConv1d(**kw, groups_impl="native")
    m_dense = NormConv1d(**kw, groups_impl="block_dense")
    params = m_native.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m_native.apply(params, x))
    got = np.asarray(m_dense.apply(params, x))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_grouped_conv_blocked_exact():
    """conv1d_grouped_blocked matches the native grouped conv on the MSD
    layer shapes (strided + grouped + non-square)."""
    from hifigan_tpu.ops.conv import conv1d, conv1d_grouped_blocked

    rng = np.random.default_rng(0)
    for ci, co, k, s, g, p, t in [
        (128, 128, 41, 2, 4, 20, 256),
        (128, 256, 41, 2, 16, 20, 256),
        (256, 512, 41, 4, 16, 20, 256),
        (16, 32, 5, 2, 4, 2, 64),
    ]:
        x = jnp.asarray(rng.standard_normal((2, t, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, ci // g, co)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        ref = conv1d(x, w, bias, stride=s, padding=p, groups=g)
        got = conv1d_grouped_blocked(x, w, bias, stride=s, padding=p, groups=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_conv1d_time_folded_matches_direct(rng):
    """The time-fold lowering is exact across the distill discriminator's
    conv geometries (narrow channels, dilation 1/2/5, odd lengths)."""
    import jax

    from hifigan_tpu.ops.conv import conv1d, conv1d_time_folded, torch_same_padding

    cases = [  # (T, ci, K, co, d)
        (2080, 63, 9, 21, 1), (1330, 66, 5, 33, 2), (3360, 26, 9, 13, 5),
        (5460, 16, 13, 8, 1), (14560, 6, 21, 3, 2), (437, 1, 33, 1, 1),
        (310, 144, 1, 144, 1), (813, 54, 3, 54, 5),
    ]
    for (t, ci, k, co, d) in cases:
        x = jnp.asarray(rng.standard_normal((2, t, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, ci, co)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        pad = torch_same_padding(k, d)
        want = conv1d(x, w, b, padding=pad, dilation=d)
        got = conv1d_time_folded(x, w, b, padding=pad, dilation=d)
        assert got.shape == want.shape, (t, ci, k, co, d, got.shape, want.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=2e-4,
            err_msg=str((t, ci, k, co, d)),
        )
        # grads through the pack + fold transposes
        gw_d = jax.grad(lambda w: conv1d(x, w, b, padding=pad, dilation=d).sum())(w)
        gw_f = jax.grad(lambda w: conv1d_time_folded(x, w, b, padding=pad, dilation=d).sum())(w)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_d),
                                   atol=3e-3, rtol=2e-3, err_msg=str((t, ci, k, co, d)))
