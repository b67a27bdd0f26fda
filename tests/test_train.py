"""Vocoder trainer tests: single-step sanity + 8-device data-parallel mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from hifigan_tpu.config import AttrDict
from hifigan_tpu.train.vocoder import (
    VocoderTrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


def tiny_config(**over):
    h = dict(
        resblock="2",
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 2]],
        segment_size=256,
        num_mels=8,
        n_fft=64,
        hop_size=16,
        win_size=64,
        sampling_rate=8000,
        fmin=0,
        fmax=4000,
        fmax_for_loss=None,
        learning_rate=2e-4,
        adam_b1=0.8,
        adam_b2=0.99,
        lr_decay=0.999,
        seed=1234,
        batch_size=2,
        # small discriminators for the 1-core CPU test host
        mpd_periods=(2, 3),
        mpd_channels=(4, 8, 8, 8),
        msd_width=16,
        msd_num_scales=2,
    )
    h.update(over)
    return AttrDict(h)


def _batch(h, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "audio": rng.standard_normal((batch_size, h["segment_size"])).astype(np.float32) * 0.1
    }


def test_train_step_updates_and_is_finite():
    h = tiny_config()
    state = create_train_state(h, jax.random.PRNGKey(0))
    step = make_train_step(h, donate=False)

    state2, metrics = step(state, _batch(h))
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # generator params actually moved
    leaf0 = jax.tree_util.tree_leaves(state.params_g)[0]
    leaf1 = jax.tree_util.tree_leaves(state2.params_g)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
    # spectral u updated (MSD scale 0) — conv_post's u is 1-d (always +-1),
    # so assert that at least one multi-channel u moved.
    changed = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.spectral_msd),
            jax.tree_util.tree_leaves(state2.spectral_msd),
        )
        if np.asarray(a).size > 1
    ]
    assert any(changed)

    # loss decreases over a few steps on a fixed batch (sanity, not science)
    b = _batch(h, seed=1)
    s = state2
    first = None
    for i in range(3):
        s, m = step(s, b)
        if first is None:
            first = float(m["mel_error"])
    assert float(m["mel_error"]) < first * 1.5  # not exploding


def test_train_step_finetuning_batch_with_mel():
    h = tiny_config()
    state = create_train_state(h, jax.random.PRNGKey(0))
    step = make_train_step(h, donate=False)
    b = _batch(h)
    b["mel"] = np.random.default_rng(3).standard_normal(
        (2, h["num_mels"], h["segment_size"] // h["hop_size"])
    ).astype(np.float32)
    state2, metrics = step(state, b)
    assert np.isfinite(float(metrics["loss_gen_all"]))


def test_train_step_bf16_compute_dtypes():
    """Mixed-precision step (bf16 generator AND discriminator compute, f32
    params/losses) stays finite and close to the f32 step on the same batch."""
    b = _batch(tiny_config(), seed=7)
    losses = {}
    for tag, over in {
        "f32": {},
        "bf16": {"gen_compute_dtype": "bfloat16", "disc_compute_dtype": "bfloat16"},
    }.items():
        h = tiny_config(**over)
        state = create_train_state(h, jax.random.PRNGKey(0))
        step = make_train_step(h, donate=False)
        _, metrics = step(state, b)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (tag, k)
        # params must stay f32 regardless of compute dtype
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree_util.tree_leaves(state.params_g)
        )
        losses[tag] = float(metrics["loss_gen_all"])
    assert abs(losses["bf16"] - losses["f32"]) / abs(losses["f32"]) < 0.05


def test_eval_step():
    h = tiny_config()
    state = create_train_state(h, jax.random.PRNGKey(0))
    ev = make_eval_step(h)
    err, y_hat = ev(state.params_g, _batch(h))
    assert np.isfinite(float(err))
    assert y_hat.shape == (2, h["segment_size"])


def test_data_parallel_mesh_step():
    """Full train step jitted over an 8-device ('data',) mesh — validates the
    multi-chip sharding path on the virtual CPU mesh."""
    from hifigan_tpu.parallel.mesh import create_mesh, shard_batch

    h = tiny_config()
    assert jax.device_count() == 8
    mesh = create_mesh()
    state = create_train_state(h, jax.random.PRNGKey(0))
    step = make_train_step(h, mesh=mesh, donate=False)

    batch = shard_batch(_batch(h, batch_size=8), mesh)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert int(state2.step) == 1


def test_set_learning_rate():
    h = tiny_config()
    state = create_train_state(h, jax.random.PRNGKey(0))
    new_opt = set_learning_rate(state.opt_g, 1e-5)
    assert float(new_opt.hyperparams["learning_rate"]) == 1e-5
