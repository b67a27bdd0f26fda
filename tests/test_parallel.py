"""Sequence-parallel (halo-exchange) and streaming inference tests: both
must match single-device full-sequence synthesis exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.config import AttrDict
from hifigan_tpu.models import Generator
from hifigan_tpu.parallel.halo import (
    generator_halo_frames,
    make_sharded_generator,
    streaming_vocode,
)
from hifigan_tpu.parallel.mesh import create_mesh


def tiny_gen_config():
    return AttrDict(
        resblock="2",
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 2]],
        num_mels=8,
    )


@pytest.fixture(scope="module")
def gen_setup():
    h = tiny_gen_config()
    gen = Generator(h)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 256)).astype(np.float32)
    )
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    full = np.asarray(gen.apply({"params": params}, mel))
    return h, gen, params, mel, full


def test_halo_sharded_generator_matches_full(gen_setup):
    h, gen, params, mel, full = gen_setup
    assert jax.device_count() == 8
    mesh = create_mesh()  # 8-way 'data' axis used as the sequence axis
    sharded = make_sharded_generator(h, mesh, folded=False, axis_name="data")
    got = np.asarray(sharded(params, mel))
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=1e-5, rtol=1e-5)


def test_streaming_vocode_matches_full(gen_setup):
    h, gen, params, mel, full = gen_setup
    halo = generator_halo_frames(h)
    hop = 16
    apply_fn = jax.jit(lambda p, m: gen.apply({"params": p}, m))
    got = streaming_vocode(apply_fn, params, mel, chunk_frames=16, halo_frames=halo, hop=hop)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=1e-5, rtol=1e-5)


def test_halo_frames_positive_for_all_variants():
    from hifigan_tpu.config import get_config

    for v in ("v1", "v2", "v3"):
        halo = generator_halo_frames(get_config(v))
        assert 4 < halo < 64, (v, halo)


def test_tensor_parallel_train_step():
    """Full vocoder GAN step on a ('data','model') dp x tp mesh with
    column-parallel param shardings (the dryrun_multichip path)."""
    import numpy as np

    from hifigan_tpu.parallel.mesh import create_mesh, shard_batch, tensor_parallel_shardings
    from hifigan_tpu.train.vocoder import create_train_state, make_train_step
    from tests.test_train import tiny_config

    h = tiny_config()
    mesh = create_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    state = create_train_state(h, jax.random.PRNGKey(0))
    state_sh = tensor_parallel_shardings(state, mesh, min_size=8)
    state = jax.device_put(state, state_sh)
    # at least one kernel leaf is actually sharded over 'model'
    shardings = jax.tree_util.tree_leaves(state_sh)
    assert any("model" in str(s.spec) for s in shardings)

    step = make_train_step(h, mesh=mesh, donate=False, state_shardings=state_sh)
    batch = shard_batch(
        {"audio": np.random.default_rng(0).standard_normal((4, h["segment_size"])).astype(np.float32) * 0.1},
        mesh,
    )
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_gen_all"]))
