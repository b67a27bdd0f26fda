"""GAN-autoencoder model assembly for speech distillation.

Builds every model of the reference's `GanAutoencoder`
(lightning_model.py:52-102) from the declarative configs:

- generator = encoder + decoder (DSL configs from layer strings,
  static_configs.get_generator_configs)
- all-in-one ensemble discriminator (+ a frozen copy refreshed per step)
- keepers / hunters (+ copies) / sniffers (classifier ensembles)

and the flat optimizer grouping from config keys like "generator,keepers"
(lightning_model.py:115-139). Everything is a (module, params) pair; copies
are just param pytrees (refreshing a copy is a tree copy, not a state_dict
dance).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from hifigan_tpu.dsl.classifiers import (
    generate_hunters_config_by_example,
    generate_keepers_config_by_example,
)
from hifigan_tpu.dsl.module import ConfigurableModule
from hifigan_tpu.dsl.parsing import parse_layers
from hifigan_tpu.dsl.static_configs import (
    generate_sniffers_configs_by_example,
    get_discriminator_config,
    get_generator_configs,
)


def embedding_size_from_layers(generator_layers) -> int:
    """prod of layer strides (reference lightning_model.py:732)."""
    return int(np.prod([lp[2] for _lt, lp in generator_layers]))


class DistillModels:
    """Host-side bundle: flax modules + initial params for every model."""

    def __init__(self, config: dict, example_labels: dict, label_weights: dict,
                 sampling_rate: int | None = None, compute_dtype=None,
                 conv_impl: str | None = None, member_impl: str | None = None,
                 stream_impl: str | None = None, mesh=None,
                 mesh_batch_axis: str = "data"):
        models_cfg = config["models"]
        # multi-chip data parallelism: the trainer's mesh, threaded into
        # every DSL model so the fused Pallas member/stream kernels run
        # under jax.shard_map over its data axis (ConfigurableModule.mesh)
        self.mesh = mesh
        self.mesh_batch_axis = mesh_batch_axis
        _mesh_kw = {"mesh": mesh, "mesh_batch_axis": mesh_batch_axis}
        # mixed precision for every DSL model (config key models.compute_dtype
        # or the ctor arg): conv stacks run in e.g. bf16, params/losses f32 —
        # same contract as the vocoder's gen/disc_compute_dtype
        compute_dtype = compute_dtype or models_cfg.get("compute_dtype")
        self.compute_dtype = compute_dtype
        # 1-D conv lowering for every DSL model (config key models.conv_impl
        # or the ctor arg; see ConfigurableModule.conv_impl) — 'folded'
        # routes the narrow stride-1 convs through ops.conv.conv1d_time_folded
        conv_impl = conv_impl or models_cfg.get("conv_impl", "auto")
        self.conv_impl = conv_impl
        # all-in-one discriminator member lowering (config key
        # models.member_impl or the ctor arg; see ConfigurableModule.member_impl)
        member_impl = member_impl or models_cfg.get("member_impl", "auto")
        self.member_impl = member_impl
        # generic stream-fusion for the other DSL models (config key
        # models.stream_impl; see ConfigurableModule.stream_impl) — the
        # encoder/decoder's narrow conv levels fuse into Pallas kernels
        stream_impl = stream_impl or models_cfg.get("stream_impl", "auto")
        self.stream_impl = stream_impl
        gen_layers = parse_layers(models_cfg["generator"]["layers"])
        self.generator_layers = gen_layers
        self.embedding_size = embedding_size_from_layers(gen_layers)
        expansion = models_cfg["generator"].get("expansion", 4)
        self.embedding_channels = expansion * self.embedding_size

        gen_cfgs = get_generator_configs(
            gen_layers, expansion_size=expansion, embedding_size=self.embedding_size
        )
        self.encoder = ConfigurableModule(config=gen_cfgs["encoder"], compute_dtype=compute_dtype, conv_impl=conv_impl, stream_impl=stream_impl, **_mesh_kw)
        self.decoder = ConfigurableModule(config=gen_cfgs["decoder"], compute_dtype=compute_dtype, conv_impl=conv_impl, stream_impl=stream_impl, **_mesh_kw)

        disc_layers = parse_layers(models_cfg["discriminator"]["layers"])
        disc_cfg = get_discriminator_config(
            disc_layers,
            expansion_size=models_cfg["discriminator"].get("expansion", 1),
            ensemble_size=models_cfg["discriminator"].get("ensemble", 3),
        )
        self.discriminator = ConfigurableModule(config=disc_cfg, update_spectral=True,
                                                mel_sampling_rate_override=sampling_rate,
                                                compute_dtype=compute_dtype,
                                                conv_impl=conv_impl,
                                                member_impl=member_impl, **_mesh_kw)
        # weight_grads=False: discriminator_eval only ever runs the FROZEN
        # disc_copy (distill/train.py disc_apply(update=False) — the
        # reference's no-grad judge copy, lightning_model.py:108-113), so
        # the fused member kernels' backward may skip every weight-grad dot;
        # grads still flow to the generated AUDIO through it.
        self.discriminator_eval = ConfigurableModule(config=disc_cfg, update_spectral=False,
                                                     mel_sampling_rate_override=sampling_rate,
                                                     compute_dtype=compute_dtype, conv_impl=conv_impl,
                                                     member_impl=member_impl,
                                                     weight_grads=False, **_mesh_kw)

        # classifiers operate on the split halves of the embedding
        half = self.embedding_channels // 2
        keeper_layers = parse_layers(models_cfg["keepers"]["layers"])
        hunter_layers = parse_layers(models_cfg["hunters"]["layers"])
        sniffer_layers = parse_layers(models_cfg["sniffers"]["layers"])

        keeper_cfgs = generate_keepers_config_by_example(
            half, example_labels, layers=keeper_layers,
            ensemble_size=models_cfg["keepers"].get("ensemble", 3),
        )
        hunter_cfgs = generate_hunters_config_by_example(
            half, example_labels, layers=hunter_layers,
            ensemble_size=models_cfg["hunters"].get("ensemble", 3),
        )
        sniffer_cfgs = generate_sniffers_configs_by_example(
            example_labels, layers=sniffer_layers,
            ensemble_size=models_cfg["sniffers"].get("ensemble", 3),
        )
        self.keepers = {k: ConfigurableModule(config=c, compute_dtype=compute_dtype, conv_impl=conv_impl, **_mesh_kw) for k, c in keeper_cfgs.items()}
        self.hunters = {k: ConfigurableModule(config=c, compute_dtype=compute_dtype, conv_impl=conv_impl, **_mesh_kw) for k, c in hunter_cfgs.items()}
        self.sniffers = {k: ConfigurableModule(config=c, compute_dtype=compute_dtype, conv_impl=conv_impl, **_mesh_kw) for k, c in sniffer_cfgs.items()}

        self.example_labels = example_labels
        self.label_weights = label_weights
        self.config = config

    # ------------------------------------------------------------------

    def init_variables(self, key: jax.Array, segment_length: int) -> dict:
        """Initialise all model variables with a dummy batch."""
        import jax.numpy as jnp

        ks = jax.random.split(key, 8)
        wav = jnp.zeros((1, segment_length, 1))
        emb_t = segment_length // self.embedding_size
        half = self.embedding_channels // 2

        variables: dict[str, Any] = {}
        variables["encoder"] = self.encoder.init(ks[0], wav)
        emb_example = self.encoder.apply(variables["encoder"], wav)
        variables["decoder"] = self.decoder.init(ks[1], emb_example)
        variables["discriminator"] = self.discriminator.init(
            {"params": ks[2]}, wav, mutable=["params", "spectral", "valves"]
        )
        emb_half = jnp.zeros((1, emb_t, half))
        variables["keepers"] = {
            k: m.init(jax.random.fold_in(ks[3], i), emb_half)
            for i, (k, m) in enumerate(self.keepers.items())
        }
        variables["hunters"] = {
            k: m.init(jax.random.fold_in(ks[4], i), emb_half)
            for i, (k, m) in enumerate(self.hunters.items())
        }
        # sniffers take a keeper's own-group label predictions as input
        variables["sniffers"] = {}
        for i, (k, m) in enumerate(self.sniffers.items()):
            keeper_out = self.keepers[k].apply(variables["keepers"][k], emb_half)
            variables["sniffers"][k] = m.init(jax.random.fold_in(ks[5], i), keeper_out["mean"][k])
        return variables


def flat_optimizer_groups(optimizers_config: dict) -> dict[str, float]:
    """Flatten the optimizers config into {group_key: lr}
    (reference _create_flat_models, lightning_model.py:115-139):
    {'generator,keepers': 2e-3, 'hunters': {'style': 1e-3}} ->
    {'generator,keepers': 2e-3, 'hunters/style': 1e-3}."""
    flat = {}
    for key, value in optimizers_config.items():
        if isinstance(value, dict):
            for sub, lr in value.items():
                flat[f"{key}/{sub}"] = lr
        else:
            flat[key] = value
    return flat


def group_param_selector(group_key: str):
    """Map a flat group key to the list of variable-tree paths it trains.

    'generator' spans encoder+decoder; 'hunters/style' is hunters['style'].
    Returns a list of path tuples into the variables dict.
    """
    paths = []
    for model_key in group_key.split(","):
        if "/" in model_key:
            root, sub = model_key.split("/", 1)
            paths.append((root, sub))
        elif model_key == "generator":
            paths.append(("encoder",))
            paths.append(("decoder",))
        else:
            paths.append((model_key,))
    return paths


def expand_group_paths(group_key: str, variables: dict) -> list[tuple]:
    """Like group_param_selector but expands dict-of-model nodes (keepers)
    to their leaf models."""
    out = []
    for path in group_param_selector(group_key):
        node = variables
        for p in path:
            node = node[p]
        if isinstance(node, dict) and "params" not in node:
            out.extend(path + (k,) for k in node)
        else:
            out.append(path)
    return out
