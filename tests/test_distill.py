"""Distillation trainer tests: cycles, mixing ops, losses, full train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.distill.cycles import calculate_cycles, cycles_valid
from hifigan_tpu.distill.tensor_ops import expand, mix, unmix
from hifigan_tpu.distill.losses import (
    cosine_loss,
    recursive_loss,
    seg_bce_loss,
    seg_bias_bce_loss,
)
from hifigan_tpu.distill.model import DistillModels, flat_optimizer_groups
from hifigan_tpu.distill.train import DistillTrainer, calculate_losses


# ---------------------------------------------------------------------------
# cycles
# ---------------------------------------------------------------------------


def test_calculate_cycles_validity():
    """Contract parity with the reference's inline suite
    (cycle_calculator.py:98-119): same feasible/infeasible cases, and every
    produced tuple satisfies the reference's validity predicate."""
    for a, b in [(3, 3), (3, 6), (5, 8), (5, 13), (5, 11), (4, 3), (4, 11),
                 (5, 14), (6, 25), (6, 28), (10, 39), (10, 49), (10, 50),
                 (12, 12), (5, 20)]:
        cycles = calculate_cycles(a, b)
        assert cycles_valid(cycles, a, b, 3), (a, b, cycles)
    for a, b in [(3, 7), (4, 8), (3, 12), (7, 50), (5, 21)]:
        with pytest.raises(AssertionError):
            calculate_cycles(a, b)
    with pytest.raises(AssertionError):
        calculate_cycles(0, 0)


def test_mix_unmix_roundtrip_and_derangement():
    a, b = 5, 13
    cycles = calculate_cycles(a, b)
    rolls = (a, *cycles)
    n = sum(rolls)
    x = jnp.arange(n, dtype=jnp.float32)[:, None]
    mixed = mix(x, rolls, 0)
    back = unmix(mixed, rolls, 0)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # all mixed positions beyond the first (unrolled) segment moved
    moved = np.asarray(mixed)[a:, 0] != np.asarray(x)[a:, 0]
    assert moved.all()


def test_expand():
    x = jnp.arange(3, dtype=jnp.float32)[:, None]
    y = expand(x, 8, 0)
    assert y.shape == (8, 1)
    np.testing.assert_array_equal(np.asarray(y)[:, 0], [0, 1, 2, 0, 1, 2, 0, 1])


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_seg_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, T, C = 2, 6, 3
    probs = rng.uniform(0.01, 0.99, (B, T, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, T))
    ratios = {"true": (0.5, 0.3, 0.2), "false": (0.5, 0.7, 0.8)}

    got = float(seg_bce_loss(jnp.asarray(probs), jnp.asarray(labels), ratios))

    # independent torch oracle following custom_losses.py:78-116
    x = torch.from_numpy(probs)
    one_hot = torch.nn.functional.one_hot(torch.from_numpy(labels), C).float()
    ce = torch.nn.functional.binary_cross_entropy(x, one_hot, reduction="none")
    tw = torch.tensor(ratios["true"]) ** -1
    fw = torch.tensor(ratios["false"]) ** -1
    sum_dims = [1]
    tt, ft = one_hot, 1 - one_hot
    tpc = (tt * ce).sum(dim=sum_dims) / (tt.sum(dim=sum_dims) + 1)
    fpc = (ft * ce).sum(dim=sum_dims) / (ft.sum(dim=sum_dims) + 1)
    ref = float((tpc * tw).mean() + (fpc * fw).mean())
    assert abs(got - ref) < 1e-5


def test_seg_bias_bce_finite_and_grad():
    rng = np.random.default_rng(1)
    B, T, C = 2, 4, 3
    x = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, C)).astype(np.float32))
    bias = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, C)).astype(np.float32))
    truth = jnp.asarray(rng.integers(0, C, (B, T)))
    ratios = {"true": (0.4, 0.4, 0.2), "false": (0.6, 0.6, 0.8)}
    val, grad = jax.value_and_grad(lambda p: seg_bias_bce_loss(p, bias, truth, ratios))(x)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_cosine_loss_zero_for_parallel():
    x = jnp.ones((2, 3, 4))
    assert abs(float(cosine_loss(x, 2 * x))) < 1e-6


def test_recursive_loss_trees():
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    x = {"a": jnp.ones((2,)), "b": [jnp.zeros((2,)), jnp.ones((2,))]}
    y = {"a": jnp.zeros((2,)), "b": [jnp.zeros((2,)), jnp.zeros((2,))]}
    assert float(recursive_loss(l1, x, y)) == 2.0


def test_calculate_losses_backward_flags():
    data = {
        "g": {"recon": (jnp.ones(3), jnp.zeros(3))},
        "d": (jnp.full(3, 2.0), jnp.zeros(3)),
    }
    loss = lambda a, b: jnp.mean(jnp.abs(a - b))
    factors = {"g": 2.0, "d": 1.0}
    backward = {"g": True, "d": False}
    losses, trained = calculate_losses(loss, factors, backward, data)
    assert float(losses["g"]["total"]) == 2.0
    assert float(losses["d"]) == 2.0
    assert float(losses["total"]) == 4.0
    assert float(trained) == 2.0  # only 'g' flagged


def test_flat_optimizer_groups():
    flat = flat_optimizer_groups(
        {"generator,keepers": 0.002, "discriminator": 0.001, "hunters": {"style": 1e-3}}
    )
    assert flat == {"generator,keepers": 0.002, "discriminator": 0.001, "hunters/style": 1e-3}


# ---------------------------------------------------------------------------
# full trainer
# ---------------------------------------------------------------------------


def tiny_distill_config():
    labels = {
        "content": {"sex": [0, 1], "sad": [0, 1, 2]},
        "style": {"noise": [0, 1], "codec": [0, 1, 2, 3]},
    }
    ones = lambda n: {"true": tuple([1.0 / n] * n), "false": tuple([1.0 - 1.0 / n] * n)}
    weights = {
        g: {k: ones(len(v)) for k, v in group.items()} for g, group in labels.items()
    }
    label_factors = {
        g: {k: 1 for k in group} for g, group in labels.items()
    }
    config = {
        "loops": {"train": {"batch_size": 4, "mix_size": 4, "segment_length": 24}},
        "models": {
            "generator": {
                "expansion": 2,
                "layers": [
                    "res.1,none:1,3,1,1,1,1e-00",
                    "res.1,sub_res:1,3,2,1,1,1e-00",
                    "res.1|conv.1,sub_res:2,3,3,1,1,1e-00",
                ],
            },
            "discriminator": {"ensemble": 2, "expansion": 1,
                              "layers": ["roll:1,5,1", "all:2,5,1", "roll:4,3,1"]},
            "keepers": {"ensemble": 2, "layers": ["conv:6,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"]},
            "hunters": {"ensemble": 2, "layers": ["conv:6,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"]},
            "sniffers": {"ensemble": 2, "layers": ["conv:6,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"]},
        },
        "learning": {
            "lr_decay": 0.99999,
            "optimizers": {
                "generator,keepers": 0.002,
                "discriminator": 0.001,
                "hunters": {"style": 0.001, "content": 0.001},
                "sniffers": {"style": 0.001, "content": 0.001},
            },
            "loss_factors": {
                "generator": {
                    "emb_recon": 1,
                    "raw_recon": {"wav": 1, "mel": 1},
                    "adversarial": {"discriminator": {"disc": {"main": 1, "sub": 1}, "fmap": 1},
                                    "hunters": 1e-01},
                    "keepers": 1,
                },
                "discriminator": {"main": 1, "sub": 1},
                "hunters": 1,
                "sniffers": 1,
            },
            "loss_funcs": {
                "generator": {
                    "emb_recon": "l1",
                    "raw_recon": {"wav": "l1", "mel": "l1"},
                    "adversarial": {"discriminator": {"disc": "+", "fmap": "cos"},
                                    "hunters": "seg_bias_bce"},
                    "keepers": "seg_bce",
                },
                "discriminator": "-",
                "hunters": "seg_bce",
                "sniffers": "seg_bce",
            },
            "loss_backward": {
                "generator": {
                    "emb_recon": True,
                    "raw_recon": {"wav": True, "mel": True},
                    "adversarial": {"discriminator": True,
                                    "hunters": {"content": True, "style": True}},
                    "keepers": {"content": True, "style": True},
                },
                "discriminator": True,
                "hunters": {"content": True, "style": True},
                "sniffers": {"content": True, "style": True},
            },
            "accumulated_grad_batches": 2,
            "gradient_clip": 100,
            "adam_b1": 0.8,
            "adam_b2": 0.99,
        },
        "sampling_rate": 8000,
        "mel": {"num_mels": 4, "n_fft": 16, "hop_size": 4, "win_size": 16,
                "fmin": 0, "fmax": None},
    }
    return config, labels, weights


@pytest.fixture(scope="module")
def distill_setup():
    config, labels, weights = tiny_distill_config()
    models = DistillModels(config, labels, weights, sampling_rate=config["sampling_rate"])
    trainer = DistillTrainer(models, config)
    state = trainer.create_state(jax.random.PRNGKey(0), config["loops"]["train"]["segment_length"])
    return config, models, trainer, state


def _distill_batch(config, models, batch_size=4, seed=0):
    rng = np.random.default_rng(seed)
    seg = config["loops"]["train"]["segment_length"]
    t_emb = seg // models.embedding_size
    time_labels = {
        g: {k: rng.integers(0, len(v), (batch_size, t_emb)) for k, v in group.items()}
        for g, group in models.example_labels.items()
    }
    return {
        "audio": rng.standard_normal((batch_size, seg)).astype(np.float32) * 0.1,
        "time_labels": time_labels,
    }


def test_distill_models_build(distill_setup):
    config, models, trainer, state = distill_setup
    assert models.embedding_size == 6
    assert models.embedding_channels == 12
    assert set(state.variables.keys()) == {
        "encoder", "decoder", "discriminator", "keepers", "hunters", "sniffers"
    }
    assert set(trainer.flat_groups.keys()) == {
        "generator,keepers", "discriminator",
        "hunters/style", "hunters/content", "sniffers/style", "sniffers/content",
    }


def test_distill_train_step(distill_setup):
    config, models, trainer, state = distill_setup
    step = trainer.make_train_step(donate=False)
    batch = _distill_batch(config, models)
    state2, losses = step(state, batch, jax.random.PRNGKey(1))

    assert int(state2.step) == 1
    total = float(losses["total"])
    assert np.isfinite(total)
    # nested losses present for every model group
    for key in ("generator", "discriminator", "hunters", "sniffers"):
        assert key in losses

    # accumulate=2: no param change after first step, change after second
    enc0 = jax.tree_util.tree_leaves(state.variables["encoder"]["params"])[0]
    enc1 = jax.tree_util.tree_leaves(state2.variables["encoder"]["params"])[0]
    np.testing.assert_allclose(np.asarray(enc0), np.asarray(enc1))

    state3, losses3 = step(state2, batch, jax.random.PRNGKey(2))
    enc2 = jax.tree_util.tree_leaves(state3.variables["encoder"]["params"])[0]
    assert not np.allclose(np.asarray(enc0), np.asarray(enc2))

    # frozen copies refreshed from the live models
    d_live = jax.tree_util.tree_leaves(state3.variables["discriminator"]["params"])[0]
    d_copy = jax.tree_util.tree_leaves(state3.disc_copy["params"])[0]
    np.testing.assert_allclose(np.asarray(d_live), np.asarray(d_copy))


def test_distill_train_step_bf16_compute():
    """models.compute_dtype='bfloat16': conv stacks run in bf16, params and
    losses stay f32; losses track the f32 run to bf16 tolerance."""
    config, labels, weights = tiny_distill_config()
    config["models"]["compute_dtype"] = "bfloat16"
    models = DistillModels(config, labels, weights, sampling_rate=config["sampling_rate"])
    assert models.compute_dtype == "bfloat16"
    trainer = DistillTrainer(models, config)
    seg = config["loops"]["train"]["segment_length"]
    state = trainer.create_state(jax.random.PRNGKey(0), seg)
    for leaf in jax.tree_util.tree_leaves(state.variables):
        assert leaf.dtype != jnp.bfloat16  # params stay f32 (ints allowed)
    step = trainer.make_train_step(donate=False)
    batch = _distill_batch(config, models)
    state2, losses = step(state, batch, jax.random.PRNGKey(1))
    total = float(losses["total"])
    assert np.isfinite(total)
    assert losses["total"].dtype == jnp.float32

    # f32 reference run from identical init params
    config32, _, _ = tiny_distill_config()
    models32 = DistillModels(config32, labels, weights, sampling_rate=config32["sampling_rate"])
    trainer32 = DistillTrainer(models32, config32)
    state32 = trainer32.create_state(jax.random.PRNGKey(0), seg)
    step32 = trainer32.make_train_step(donate=False)
    _, losses32 = step32(state32, batch, jax.random.PRNGKey(1))
    total32 = float(losses32["total"])
    assert abs(total - total32) / max(abs(total32), 1e-6) < 0.1
