"""End-to-end parity of the fused-tail fast inference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.config import get_config
from hifigan_tpu.models import Generator, fold_weight_norm
from hifigan_tpu.models.fast_infer import make_fast_vocoder


@pytest.mark.parametrize("version,fold_post", [("v1", True), ("v1", False), ("v3", True)])
def test_fast_vocoder_matches_generator(version, fold_post):
    h = get_config(version)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 80, 24)).astype(np.float32) * 2 - 5
    )
    params = Generator(h).init(jax.random.PRNGKey(0), mel)["params"]
    fp = fold_weight_norm(params)
    ref = np.asarray(Generator(h, folded=True).apply({"params": fp}, mel))

    fast = make_fast_vocoder(h, fp, dtype=jnp.float32, tile_blocks=64, interpret=True,
                             fold_post=fold_post)
    got = np.asarray(fast(mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("wide_split", ["pair", "resblock", "bin", "none"])
def test_fast_vocoder_wide_stage0_split_modes(wide_split):
    """V1's 256-ch stage-0 fuses at block=1 (lanes = C = 256); every VMEM
    split granularity matches the reference generator, with the dot-form
    polyphase upsamplers (the measured serving default on TPU)."""
    h = get_config("v1")
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 80, 16)).astype(np.float32) * 2 - 5
    )
    params = Generator(h).init(jax.random.PRNGKey(0), mel)["params"]
    fp = fold_weight_norm(params)
    ref = np.asarray(Generator(h, folded=True).apply({"params": fp}, mel))

    fast = make_fast_vocoder(
        h, fp, dtype=jnp.float32, tile_blocks=64, interpret=True,
        wide_split=wide_split, trans_method="polyphase_dot",
    )
    got = np.asarray(fast(mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fast_vocoder_auto_tiles():
    """tile_blocks='auto' (the serving default) picks per-stage tiles —
    2048 blocks for narrow stages, 512 for weight-heavy wide ones — and
    stays exact; short inputs are handled by the per-call min() clamp."""
    h = get_config("v1")
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 80, 16)).astype(np.float32) * 2 - 5
    )
    params = Generator(h).init(jax.random.PRNGKey(0), mel)["params"]
    fp = fold_weight_norm(params)
    ref = np.asarray(Generator(h, folded=True).apply({"params": fp}, mel))

    fast = make_fast_vocoder(h, fp, dtype=jnp.float32, interpret=True,
                             trans_method="polyphase_dot")
    got = np.asarray(fast(mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
