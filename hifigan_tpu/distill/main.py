"""Distillation training orchestration — the reference's
`lightning_model.main()` surface (lightning_model.py:712-956), TPU-native.

- Experiment/log-dir contract: `<logs_base>/<name>/version_<v>` with
  overwrite/copy-from semantics and the config cached to config.yaml
  (ref create_config, :754-799).
- Model assembly from declarative configs with every generated module
  config cached to model_configs/*.yaml (ref create_models, :802-922) and
  flax-tabulate summaries replacing torchsummary.
- The callback stack: continuous/history/best checkpoints, interval loss
  sums -> TB scalars, validation classification/visualisation, model-graph
  text (ref create_trainer, :925-956).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization
from jax.sharding import Mesh

from hifigan_tpu.callbacks import (
    BestCheckpointCallback,
    ContinuousCheckpointCallback,
    HistoryCheckpointCallback,
    ModelGraphVisualizationCallback,
    OutputLoggingCallback,
    OutputSumCallback,
    TrainLoop,
    ValidationClassificationCallback,
    ValidationVisualizationCallback,
)
from hifigan_tpu.distill.model import DistillModels
from hifigan_tpu.distill.train import DistillTrainer, DistillTrainState
from hifigan_tpu.utils.caching import do_and_cache

DEFAULT_LOGS_BASE = "logs"


def experiment_log_dir(config: dict, logs_base: str = DEFAULT_LOGS_BASE) -> str:
    """TensorBoardLogger directory contract incl. overwrite/copy
    (ref lightning_model.py:766-799)."""
    experiment = config["experiment"]
    log_dir = Path(logs_base) / experiment["name"] / f"version_{experiment['version']}"

    source_dir = log_dir
    if experiment.get("copy", {}).get("enabled", False):
        if log_dir.exists() and not experiment.get("overwrite", False):
            raise RuntimeError("Cannot copy into existing version when overwrite is false.")
        copy_cfg = experiment["copy"]
        source_dir = (
            Path(logs_base)
            / copy_cfg.get("name", experiment["name"])
            / f"version_{copy_cfg.get('version', experiment['version'])}"
        )
    if experiment.get("overwrite", False) and log_dir.exists():
        shutil.rmtree(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    do_and_cache(
        lambda: config,
        os.path.join(log_dir, "config.yaml"),
        os.path.join(source_dir, "config.yaml"),
    )
    return str(log_dir)


# ---------------------------------------------------------------------------
# state (de)serialisation
# ---------------------------------------------------------------------------


def save_distill_state(path: str, state: DistillTrainState) -> None:
    data = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, serialization.to_state_dict(state))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_distill_state(path: str, template: DistillTrainState) -> DistillTrainState:
    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    # migrate checkpoints saved by the pre-vmap (unrolled-ensemble) layout
    from hifigan_tpu.utils.pytree import restack_legacy_ensembles

    restored = restack_legacy_ensembles(
        restored, serialization.to_state_dict(template)
    )
    return serialization.from_state_dict(template, restored)


# ---------------------------------------------------------------------------
# model summaries (torchsummary replacement, ref :841-920)
# ---------------------------------------------------------------------------


def summarize_params(name: str, variables: Any) -> str:
    lines = [f"{name}:"]
    total = 0
    params = variables.get("params", variables)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        lines.append(f"  {keys}: {tuple(leaf.shape)} = {n}")
    lines.append(f"  TOTAL: {total} params")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# end-to-end assembly
# ---------------------------------------------------------------------------


def resolve_mesh(config: dict, mesh="auto"):
    """Data-parallel mesh policy for the distillation trainer.

    ``mesh='auto'`` builds a ('data','model') mesh (model=1) over the
    LARGEST device subset whose size divides the train batch — the full
    device set when the batch divides it, otherwise a divisor subset (the
    production config trains at batch 3: on an 8-chip v5e slice that is a
    3-device data mesh — 3 chips each at batch 1 beat 1 chip at batch 3;
    the remaining chips idle). Every batch the step shards is a multiple of
    the train batch (the mix pipeline only expands/concats whole batches:
    distill/train.py compute_losses), so one divisor choice serves every
    internal batch. A batch with no divisor >1 among the device counts
    falls back to single-device rather than silently padding. Pass a Mesh
    to force one, or None to disable."""
    if mesh is None or isinstance(mesh, Mesh):
        return mesh
    devices = jax.devices()
    n = len(devices)
    if n <= 1:
        return None
    batch = config["loops"]["train"]["batch_size"]
    d = next((k for k in range(n, 1, -1) if batch % k == 0), 1)
    if d <= 1:
        print(
            f"distill: {n} devices visible but train batch {batch} shares no "
            f"divisor with any device subset; running single-device (set "
            f"loops.train.batch_size to a multiple of a device count to "
            f"enable data parallelism)"
        )
        return None
    from hifigan_tpu.parallel.mesh import create_mesh

    if d < n:
        print(
            f"distill: train batch {batch} does not divide {n} devices; "
            f"using a {d}-device data mesh (largest divisor subset)"
        )
    return create_mesh(model=1, devices=devices[:d])


def initialize(config: dict, datasets: dict, logs_base: str = DEFAULT_LOGS_BASE,
               cache_model_configs: bool = True, writer=None, mesh="auto"):
    """config + {loop: dataset} -> (trainer, loop) ready to run.

    Datasets must expose `label_options_groups` / `label_weights_groups`
    and a `batches()` iterator (MultilabelWaveDataset does).

    ``mesh``: 'auto' (default — data-parallel over all devices when the
    batch divides, see resolve_mesh), an explicit jax.sharding.Mesh, or
    None for single-device."""
    log_dir = experiment_log_dir(config, logs_base)
    mesh = resolve_mesh(config, mesh)

    train_ds = datasets["train"]
    example = train_ds.label_options_groups
    weights = train_ds.label_weights_groups

    models = DistillModels(
        config, example, weights, sampling_rate=config["sampling_rate"],
        mesh=mesh,  # fused member/stream kernels shard_map over its 'data'
    )
    if cache_model_configs:
        # cache every generated module config for reproducibility (ref :888-914)
        cfg_dir = Path(log_dir) / "model_configs"
        cfg_dir.mkdir(parents=True, exist_ok=True)
        do_and_cache(lambda: repr(models.encoder.config), str(cfg_dir / "encoder.yaml"))
        do_and_cache(lambda: repr(models.decoder.config), str(cfg_dir / "decoder.yaml"))
        do_and_cache(lambda: repr(models.discriminator.config), str(cfg_dir / "discriminator.yaml"))

    trainer = DistillTrainer(models, config)
    seg = config["loops"]["train"]["segment_length"]
    state = trainer.create_state(jax.random.PRNGKey(config.get("seed", 1234)), seg)

    intervals = {
        "train": config["learning"]["accumulated_grad_batches"],
        "validation": config["learning"]["accumulated_grad_batches"] * 20,
    }
    best_cb = BestCheckpointCallback()
    summaries = {
        name: summarize_params(name, vs)
        for name, vs in state.variables.items()
        if isinstance(vs, dict) and "params" in vs
    }
    callbacks = [
        HistoryCheckpointCallback(),
        ContinuousCheckpointCallback(intervals["validation"]),
        best_cb,
        OutputSumCallback(intervals, reset_callbacks=[OutputLoggingCallback(), best_cb]),
        ValidationVisualizationCallback(config["sampling_rate"], config.get("visualize", 1)),
        ModelGraphVisualizationCallback(summaries),
        ValidationClassificationCallback(example),
    ]
    loop = TrainLoop(
        state=state,
        step_fn=trainer.make_train_step(mesh=mesh, donate=False),
        log_dir=log_dir,
        callbacks=callbacks,
        writer=writer,
        save_state=save_distill_state,
        load_state=load_distill_state,
    )
    loop.mesh = mesh  # train() shards host batches over it (None = 1 device)
    return models, trainer, loop


def train(config: dict, datasets: dict, logs_base: str = DEFAULT_LOGS_BASE,
          max_steps: int = 1_000_000, writer=None, rng_seed: int = 0,
          mesh="auto"):
    """Run the full distillation training loop with validation."""
    models, trainer, loop = initialize(config, datasets, logs_base, writer=writer,
                                       mesh=mesh)
    eval_step = trainer.make_eval_step()
    val_interval = config["learning"]["accumulated_grad_batches"] * 20
    batch_size = config["loops"]["train"]["batch_size"]

    if loop.mesh is not None:
        from hifigan_tpu.parallel.mesh import shard_batch

        place = lambda b: shard_batch(b, loop.mesh)  # noqa: E731
    else:
        place = lambda b: b  # noqa: E731

    rng = jax.random.PRNGKey(rng_seed)

    # sanity validation at train start (the reference's GlobalSyncCallback
    # re-runs the sanity check manually, global_sync_callback.py:64-71)
    if loop.global_step == 0 and "validation" in datasets and config.get("visualize", 1):
        for vb in datasets["validation"].batches(batch_size, shuffle=False):
            vb = place({k: vb[k] for k in ("audio", "time_labels")})
            rng, sub = jax.random.split(rng)
            vlosses, vextra = eval_step(loop.state, vb, sub)
            loop.fire("on_validation_batch_end", vlosses, jax.device_get(vextra))
            break  # num_sanity_val_steps = visualize
        loop.fire("on_validation_end")

    step_count = loop.global_step
    epoch = 0
    while loop.global_step < max_steps and not loop.stop_requested:
        for batch in datasets["train"].batches(batch_size, seed=rng_seed + epoch):
            batch = place({k: batch[k] for k in ("audio", "time_labels")})
            rng, sub = jax.random.split(rng)
            loop.fire("on_step_start")
            loop.state, losses = loop.step_fn(loop.state, batch, sub)
            loop.fire("on_step_end", losses)
            step_count = loop.global_step
            if step_count % val_interval == 0 and "validation" in datasets:
                for vb in datasets["validation"].batches(batch_size, shuffle=False):
                    vb = place({k: vb[k] for k in ("audio", "time_labels")})
                    rng, sub = jax.random.split(rng)
                    vlosses, vextra = eval_step(loop.state, vb, sub)
                    loop.fire("on_validation_batch_end", vlosses, jax.device_get(vextra))
                loop.fire("on_validation_end")
            if step_count >= max_steps:
                break
        epoch += 1
    return loop.state


def main() -> None:
    import argparse

    from hifigan_tpu.data.multilabel import MultilabelWaveDataset

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        default=str(__import__("pathlib").Path(__file__).resolve().parents[2] / "configs" / "distill.json"),
        help="distillation config (default: the shipped production configs/distill.json)",
    )
    parser.add_argument("--datasets_dir", default="/datasets")
    parser.add_argument("--logs_base", default=DEFAULT_LOGS_BASE)
    parser.add_argument("--max_steps", default=1_000_000, type=int)
    a = parser.parse_args()

    with open(a.config) as f:
        config = json.load(f)

    from hifigan_tpu.dsl.parsing import parse_layers
    from hifigan_tpu.distill.model import embedding_size_from_layers

    embedding_size = embedding_size_from_layers(
        parse_layers(config["models"]["generator"]["layers"])
    )
    datasets = {
        key: MultilabelWaveDataset(
            data_dir=f"{a.datasets_dir}/data",
            aug_dir=f"{a.datasets_dir}/aug",
            cache_dir=f"{a.datasets_dir}/cache",
            name=key,
            segment_length=config["loops"][key]["segment_length"],
            sampling_rate=config["sampling_rate"],
            embedding_size=embedding_size,
            augmentation_config=config["augmentation"],
            **config["data"][key]["dataset"],
        )
        for key in config["loops"]
    }

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(experiment_log_dir(config, a.logs_base))
    except ImportError:
        pass

    train(config, datasets, a.logs_base, max_steps=a.max_steps, writer=writer)


if __name__ == "__main__":
    main()
