"""Standalone label-bias sniffer trainer.

Parity with reference speech_distillation/label_bias_sniffer.py: sniffers
are classifier ensembles that predict *other* groups' labels from one
group's (one-hot-encoded) labels — a bias detector. The reference trains
them on `time_labels[key]` directly; we build the configs with the one-hot
input layer (`one_hot=True`), which is the working variant of that path
(the shipped default feeds int labels into convs).

Loss: cross-entropy treating the sniffer's softmax outputs as the
reference's CrossEntropyLoss inputs (it passes probabilities as logits,
label_bias_sniffer.py:76-80 — reproduced exactly).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hifigan_tpu.distill.losses import recursive_loss
from hifigan_tpu.distill.model import flat_optimizer_groups  # noqa: F401 (API surface)
from hifigan_tpu.distill.train import make_optimizer
from hifigan_tpu.dsl.module import ConfigurableModule
from hifigan_tpu.dsl.static_configs import generate_sniffers_configs_by_example


def generate_sniffers_by_example(example_item, cache_hook=lambda k, x: x(), layers=(),
                                 one_hot=True) -> dict[str, ConfigurableModule]:
    cfgs = generate_sniffers_configs_by_example(
        example_item, layers=list(layers), one_hot=one_hot
    )
    return {
        key: ConfigurableModule(config=cache_hook(key, lambda c=cfg: c))
        for key, cfg in cfgs.items()
    }


def cross_entropy_as_logits(x: jax.Array, target: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss(input=x, target) with x already softmaxed —
    the reference's exact computation. x: (B, T, C); target: (B, T)."""
    log_z = jax.scipy.special.logsumexp(x, axis=-1)
    picked = jnp.take_along_axis(x, target[..., None], axis=-1)[..., 0]
    return jnp.mean(log_z - picked)


class SnifferTrainState(struct.PyTreeNode):
    step: jax.Array
    variables: Any
    opt_state: Any


class LabelBiasSnifferTrainer:
    def __init__(self, sniffer: ConfigurableModule, sniffer_key: str, config: dict | None = None):
        config = config or {
            "learning_rate": 0.0001,
            "lr_decay": 0.9999,
            "adam_b1": 0.8,
            "adam_b2": 0.99,
        }
        self.sniffer = sniffer
        self.sniffer_key = sniffer_key
        self.lr = config["learning_rate"]
        self.lr_decay = config["lr_decay"]
        self.tx = make_optimizer(self.lr, config["adam_b1"], config["adam_b2"])

    def create_state(self, key: jax.Array, example_labels: dict) -> SnifferTrainState:
        variables = self.sniffer.init(key, example_labels)
        return SnifferTrainState(
            step=jnp.zeros((), jnp.int32),
            variables=variables,
            opt_state=self.tx.init(variables["params"]),
        )

    def make_train_step(self):
        def loss_fn(params, variables, batch):
            vs = {**variables, "params": params}
            preds = self.sniffer.apply(vs, batch["time_labels"][self.sniffer_key])["mean"]
            return recursive_loss(cross_entropy_as_logits, preds, batch["time_labels"])

        def step_fn(state: SnifferTrainState, batch):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.variables["params"], state.variables, batch
            )
            new_step = state.step + 1
            opt_state = state.opt_state._replace(
                hyperparams={
                    **state.opt_state.hyperparams,
                    "learning_rate": self.lr
                    * jnp.power(jnp.asarray(self.lr_decay, jnp.float32), new_step.astype(jnp.float32)),
                }
            )
            updates, new_opt = self.tx.update(grads, opt_state, state.variables["params"])
            new_params = optax.apply_updates(state.variables["params"], updates)
            return (
                state.replace(
                    step=new_step,
                    variables={**state.variables, "params": new_params},
                    opt_state=new_opt,
                ),
                {"loss": loss},
            )

        return jax.jit(step_fn)

    def make_eval_step(self):
        def eval_fn(state: SnifferTrainState, batch):
            preds = self.sniffer.apply(
                state.variables, batch["time_labels"][self.sniffer_key]
            )["mean"]
            loss = recursive_loss(cross_entropy_as_logits, preds, batch["time_labels"])
            return {"loss": loss}, preds

        return jax.jit(eval_fn)
