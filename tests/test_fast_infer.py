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
