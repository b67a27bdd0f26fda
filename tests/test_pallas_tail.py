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
