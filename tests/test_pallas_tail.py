"""Fused multi-ResBlock tail kernel vs the flax MRF (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.config import get_config
from hifigan_tpu.models import Generator, fold_weight_norm
from hifigan_tpu.models.generator import ResBlock1, ResBlock2
from hifigan_tpu.ops.pallas.resblock_tail import fused_tail_stage, pack_generator_tail


def _mrf_reference(h, fp, stage, x):
    nk = len(h["resblock_kernel_sizes"])
    cls = ResBlock1 if str(h["resblock"]) == "1" else ResBlock2
    ch = x.shape[-1]
    xs = None
    for j, (rk, rd) in enumerate(zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"])):
        out = cls(channels=ch, kernel_size=rk, dilation=tuple(rd), norm="none").apply(
            {"params": fp[f"resblocks_{stage * nk + j}"]}, x
        )
        xs = out if xs is None else xs + out
    return xs / nk


@pytest.mark.parametrize("version,stage,tile", [("v1", 3, 64), ("v1", 3, 250), ("v3", 2, 16)])
def test_fused_tail_matches_mrf(version, stage, tile):
    h = get_config(version)
    fp = fold_weight_norm(
        Generator(h).init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)))["params"]
    )
    ch = h["upsample_initial_channel"] // (2 ** (stage + 1))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1000, ch)).astype(np.float32) * 0.3
    )
    ref = _mrf_reference(h, fp, stage, x)
    packed = pack_generator_tail(h, fp, stage, block=4)
    got = fused_tail_stage(x, packed, interpret=True, tile_blocks=tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_blocked_trans_kernel_matches_conv_transpose():
    """The blocked ConvTranspose1d pack reproduces ops.conv.conv_transpose1d
    (torch semantics) when applied as out_block[t] = sum_q in_block[t+q] @ Kq."""
    from hifigan_tpu.ops.conv import conv_transpose1d
    from hifigan_tpu.ops.pallas.resblock_tail import _blocked_trans_kernel_np

    rng = np.random.default_rng(1)
    k, u, p, ci, co, block = 4, 2, 1, 8, 4, 4
    b_in = block // u
    kernel = rng.standard_normal((k, ci, co)).astype(np.float32)
    x = rng.standard_normal((1, 32, ci)).astype(np.float32)
    ref = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(kernel), stride=u, padding=p))

    big, live_q = _blocked_trans_kernel_np(kernel, u, p, block)
    xb = x.reshape(1, 32 // b_in, b_in * ci)
    n_blocks = xb.shape[1]
    out = np.zeros((n_blocks, block * co), np.float32)
    for qi, q in enumerate(live_q):
        for t in range(n_blocks):
            src = t + q
            if 0 <= src < n_blocks:
                out[t] += xb[0, src] @ big[qi]
    got = out.reshape(1, n_blocks * block, co)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("version,stage", [("v1", 3), ("v1", 2)])
def test_fused_tail_with_folded_upsampler(version, stage):
    """pre_pack folds lrelu + ConvTranspose1d into the kernel: the fused
    stage fed the PREVIOUS stage's output matches lrelu -> trans -> MRF."""
    from hifigan_tpu.ops.conv import LRELU_SLOPE, conv_transpose1d, leaky_relu
    from hifigan_tpu.ops.pallas.resblock_tail import prepare_upsample

    h = get_config(version)
    fp = fold_weight_norm(
        Generator(h).init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)))["params"]
    )
    u = h["upsample_rates"][stage]
    k = h["upsample_kernel_sizes"][stage]
    ch = h["upsample_initial_channel"] // (2 ** (stage + 1))
    block = 128 // ch
    assert block % u == 0

    x_prev = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 512, 2 * ch)).astype(np.float32) * 0.3
    )
    up = fp[f"ups_{stage}"]
    x_up = conv_transpose1d(
        leaky_relu(x_prev, LRELU_SLOPE), up["kernel"], up["bias"], stride=u, padding=(k - u) // 2
    )
    ref = _mrf_reference(h, fp, stage, x_up)

    packed = pack_generator_tail(h, fp, stage, block=block)
    pre = prepare_upsample(up, u, (k - u) // 2, block)
    got = fused_tail_stage(x_prev, packed, interpret=True, tile_blocks=64, pre_pack=pre)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_tail_block1_128ch_stage():
    """block=1 (128-channel stage, no time folding) — the max_fused_ch=128
    serving path (measured fastest at B=1 on v5e)."""
    h = get_config("v1")
    fp = fold_weight_norm(
        Generator(h).init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)))["params"]
    )
    stage = 1  # 128 channels
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 512, 128)).astype(np.float32) * 0.3
    )
    ref = _mrf_reference(h, fp, stage, x)
    packed = pack_generator_tail(h, fp, stage, block=1)
    got = fused_tail_stage(x, packed, interpret=True, tile_blocks=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
