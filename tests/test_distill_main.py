"""Integration: synthetic corpus -> MultilabelWaveDataset -> distill
orchestration (initialize/train) with the full callback stack, plus the
standalone sniffer trainer."""

import numpy as np
import pytest

import jax

from tests.test_data_engine import AUG_CONFIG, SR, corpus, make_dataset  # noqa: F401


def small_distill_config():
    return {
        "experiment": {"name": "test_exp", "version": 1, "overwrite": True},
        "loops": {
            "train": {"batch_size": 3, "mix_size": 3, "segment_length": 2400},
            "validation": {"batch_size": 3, "mix_size": 3, "segment_length": 2400},
        },
        "models": {
            "generator": {
                "expansion": 2,
                "layers": [
                    "res.1,none:1,3,1,1,1,1e-00",
                    "res.1,sub_res:1,3,4,1,1,1e-00",
                    "res.1,sub_res:4,3,60,1,1,1e-00",
                ],
            },
            "discriminator": {"ensemble": 2, "expansion": 1,
                              "layers": ["roll:1,5,1", "roll:2,5,1", "roll:4,3,1"]},
            "keepers": {"ensemble": 2, "layers": ["conv:8,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"]},
            "hunters": {"ensemble": 2, "layers": ["conv:8,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"]},
            "sniffers": {"ensemble": 2, "layers": ["conv:8,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"]},
        },
        "debug": False,
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
            "accumulated_grad_batches": 1,
            "gradient_clip": 100,
            "adam_b1": 0.8,
            "adam_b2": 0.99,
        },
        "visualize": 1,
        "sampling_rate": SR,
        "mel": {"num_mels": 8, "n_fft": 64, "hop_size": 16, "win_size": 64,
                "fmin": 0, "fmax": None},
    }
    # embedding_size = 1*4*60 = 240, matches the corpus fixture


class _FakeWriter:
    def __init__(self):
        self.scalars = {}
        self.figures = []
        self.audio = []
        self.texts = []
        self.hists = []

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = (value, step)

    def add_figure(self, tag, fig, step):
        self.figures.append(tag)

    def add_audio(self, tag, wav, step, sr):
        self.audio.append(tag)

    def add_text(self, tag, text, step):
        self.texts.append(tag)

    def add_histogram(self, tag, values, step):
        self.hists.append(tag)


@pytest.mark.filterwarnings("ignore")
def test_distill_main_end_to_end(corpus, tmp_path):  # noqa: F811
    from hifigan_tpu.distill.main import initialize, load_distill_state, save_distill_state, train

    config = small_distill_config()
    ds = make_dataset(corpus)
    val_ds = make_dataset(corpus, deterministic=True)
    datasets = {"train": ds, "validation": val_ds}
    writer = _FakeWriter()

    # 240 embedding -> label tensors line up with the corpus fixture
    from hifigan_tpu.distill.model import embedding_size_from_layers
    from hifigan_tpu.dsl.parsing import parse_layers

    assert embedding_size_from_layers(parse_layers(config["models"]["generator"]["layers"])) == 240

    config["learning"]["accumulated_grad_batches"] = 1
    state = train(config, datasets, logs_base=str(tmp_path / "logs"), max_steps=2, writer=writer)
    assert int(state.step) == 2

    # checkpoints written by the continuous callback (interval 20 -> only
    # 'latest' at init resume path may not exist; save explicitly round-trips)
    path = str(tmp_path / "ck")
    save_distill_state(path, state)
    models, trainer, loop = initialize(config, datasets, logs_base=str(tmp_path / "logs2"))
    restored = load_distill_state(path, loop.state)
    assert int(restored.step) == 2
    leaf_a = jax.tree_util.tree_leaves(state.variables["encoder"]["params"])[0]
    leaf_b = jax.tree_util.tree_leaves(restored.variables["encoder"]["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b))

    # training losses were logged with depth-ranked tags
    assert any(t.startswith("train_losses") for t in writer.scalars)
    # model graph text emitted
    assert any(t.startswith("model_graph/") for t in writer.texts)


def test_sniffer_trainer(corpus):  # noqa: F811
    from hifigan_tpu.distill.sniffer import LabelBiasSnifferTrainer, generate_sniffers_by_example
    from hifigan_tpu.dsl.parsing import parse_layers

    ds = make_dataset(corpus, disable_wavs=True)
    example = ds.label_options_groups
    layers = parse_layers(["conv:8,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"])
    sniffers = generate_sniffers_by_example(example, layers=layers, one_hot=True)
    assert set(sniffers.keys()) == {"content", "style"}

    batch = next(ds.batches(2, seed=0))
    batch = {"time_labels": batch["time_labels"]}

    trainer = LabelBiasSnifferTrainer(sniffers["content"], "content")
    state = trainer.create_state(
        jax.random.PRNGKey(0),
        {k: np.asarray(v) for k, v in batch["time_labels"]["content"].items()},
    )
    step = trainer.make_train_step()
    s1, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    s2, out2 = step(s1, batch)
    assert int(s2.step) == 2
    # params moved
    a = jax.tree_util.tree_leaves(state.variables["params"])[0]
    b = jax.tree_util.tree_leaves(s2.variables["params"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))

    eval_step = trainer.make_eval_step()
    losses, preds = eval_step(s2, batch)
    assert "style" in preds  # content sniffer predicts the other group


def test_infer_autoencoding_cli(corpus, tmp_path, monkeypatch):  # noqa: F811
    """Autoencoding inference CLI: saved experiment -> wav -> wav files."""
    from hifigan_tpu.distill.main import initialize, save_distill_state

    config = small_distill_config()
    ds = make_dataset(corpus)
    datasets = {"train": ds, "validation": ds}
    logs = tmp_path / "logs"
    models, trainer, loop = initialize(config, datasets, logs_base=str(logs))
    exp_dir = logs / "test_exp" / "version_1"
    save_distill_state(str(exp_dir / "checkpoints" / "latest"), loop.state)

    # the CLI reads config.yaml (written by initialize) and autoencodes wavs
    import glob as _glob

    wav_dir = next(iter(_glob.glob(str(tmp_path / ".." / "**" / "wavs"), recursive=True)), None)
    from pathlib import Path
    wav_src = Path(corpus["data"]) / "mini" / "wavs"
    out_dir = tmp_path / "auto_out"

    import sys as _sys

    from hifigan_tpu.cli import infer_autoencoding

    monkeypatch.setattr(
        _sys, "argv",
        ["infer_autoencoding", "--input_wavs_dir", str(wav_src),
         "--output_dir", str(out_dir), "--experiment_dir", str(exp_dir)],
    )
    infer_autoencoding.main()
    outs = list(out_dir.glob("*_autoencoded.wav"))
    assert len(outs) == 4


def test_parameter_visualization_parity():
    """All-params + per-parameter histograms and snake weight images are
    logged per model (ref validation_visualization_callback.py:42-150)."""
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.callbacks.visualization import (
        log_model_parameters,
        parameter_snake_images,
    )
    from hifigan_tpu.config import AttrDict
    from hifigan_tpu.models import Generator

    h = AttrDict(
        resblock="2",
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 2]],
        num_mels=8,
    )
    gen = Generator(h)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)))["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))

    writer = _FakeWriter()
    log_model_parameters(writer, {"generator": {"params": params}}, step=7)
    # one all-params histogram + one per parameter
    assert len(writer.hists) == 1 + n_leaves
    # tags are depth-ranked (rank() -> models_N/...); the all-params histogram
    # tag ends at the model name
    assert any(t.endswith("/generator") for t in writer.hists)
    # snake images: at least one chained weight-matrix figure
    assert len(writer.figures) >= 1

    snakes = parameter_snake_images(params)
    assert snakes
    for name, img in snakes.items():
        assert img.ndim == 2 and img.size > 0 and np.isfinite(img).all(), name

    # single-variables form (sniffer trainer state)
    writer2 = _FakeWriter()
    log_model_parameters(writer2, {"params": params}, step=1)
    assert len(writer2.hists) == 1 + n_leaves
