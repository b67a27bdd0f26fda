"""Distillation trainer: the TPU-native `GanAutoencoder` training step.

Re-designs reference lightning_model.py:297-482 for functional JAX:

- The reference's nested data dict of lazy ``(func, params)`` thunks walked
  by `_calculate_losses` with ``manual_backward(retain_graph=True)`` at
  flagged nodes becomes ONE pure loss function over the dict of all model
  params: every flagged subtree contributes to a single scalar, and the
  detach/copy topology (disc copy for G, detached fakes for D, no-grad
  keeper/sniffer in the hunt loss, detached embeddings for hunters/
  sniffers; ref :338-373) is reproduced with `stop_gradient` walls and
  copy param trees — one backward pass total, no graph retention.
- Frozen copies (discriminator_copy, hunters_copies; ref :108-113) are
  param pytrees refreshed after each step.
- Gradient accumulation (x N), 1/N scaling, global-norm clip and NaN/Inf
  step-skip (manual_optimization_callback.py:18-57) run *inside* the jitted
  step with `lax.cond`.
- Per-step exponential LR `base * decay^global_step`
  (global_sync_lr_scheduler.py:80-83) is computed in-step.

Mels for reconstruction use the distillation mel config (config['mel'],
fork pipeline conventions).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
from hifigan_tpu.distill.cycles import calculate_cycles
from hifigan_tpu.distill.losses import get_losses_by_types, recursive_loss
from hifigan_tpu.distill.model import DistillModels, expand_group_paths, flat_optimizer_groups
from hifigan_tpu.distill.tensor_ops import expand, mix, unmix

sg = jax.lax.stop_gradient


class DistillTrainState(struct.PyTreeNode):
    step: jax.Array
    variables: Any  # {'encoder','decoder','discriminator','keepers':{k},...}
    disc_copy: Any  # frozen discriminator variables
    hunter_copies: Any  # {key: frozen hunter variables}
    opt_states: Any  # {group_key: optax state}
    grad_accum: Any  # {group_key: grads pytree}  (params-only trees)


# ---------------------------------------------------------------------------
# tree helpers
# ---------------------------------------------------------------------------


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_path(tree, path, value):
    if not path:
        return value
    return {**tree, path[0]: _set_path(tree[path[0]], path[1:], value)}


def _merge_dicts(*dicts):
    out: dict = {}

    def merge(base, remote):
        for k, v in remote.items():
            if k in base and isinstance(base[k], dict) and isinstance(v, Mapping):
                merge(base[k], v)
            else:
                base[k] = v

    for d in dicts:
        merge(out, d)
    return out


# ---------------------------------------------------------------------------
# loss-tree walk (reference _calculate_losses, lightning_model.py:420-449)
# ---------------------------------------------------------------------------


def calculate_losses(loss, factor, backward, data):
    """Walk loss/factor/backward trees over the data tree.

    Returns (nested losses dict with 'total's, trained_total) where
    trained_total sums exactly the subtrees whose backward flag is True.
    Everything else is metrics-only by construction: jax.grad is taken of
    trained_total alone, so unflagged subtrees never contribute gradients
    (no stop_gradient needed — they are simply not part of the
    differentiated output).

    ``'total'`` is a RESERVED key in every losses dict level (the logging /
    best-checkpoint callbacks read it); a data tree using it would be
    silently shadowed, so it is rejected.
    """

    def walk(loss, factor, backward, data):
        if isinstance(data, Mapping):
            if "total" in data:
                raise ValueError(
                    "'total' is a reserved key in loss data trees (it holds the "
                    "per-subtree sum in the returned losses dict)"
                )
            losses = {}
            total = 0.0
            trained = 0.0
            for key in data.keys():
                sub_losses, sub_total, sub_trained = walk(
                    loss[key] if isinstance(loss, Mapping) else loss,
                    factor[key] if isinstance(factor, Mapping) else factor,
                    backward[key] if isinstance(backward, Mapping) else False,
                    data[key],
                )
                losses[key] = sub_losses
                total = sub_total + total
                trained = sub_trained + trained
            losses["total"] = total
        else:
            value = recursive_loss(loss, *data)
            value = value * factor
            losses, total, trained = value, value, 0.0
        if isinstance(backward, bool) and backward:
            trained = total  # this whole subtree is trained
        return losses, total, trained

    losses, total, trained = walk(loss, factor, backward, data)
    return losses, trained


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


def make_optimizer(lr: float, b1: float, b2: float):
    """AdamW(amsgrad) equivalent (reference lightning_model.py:206-211)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.scale_by_amsgrad(b1=b1, b2=b2),
            optax.add_decayed_weights(0.01),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=lr)


def _params_only(tree):
    """Strip non-trainable collections from a variables(-of-models) tree."""
    if isinstance(tree, Mapping):
        if "params" in tree:
            return tree["params"]
        return {k: _params_only(v) for k, v in tree.items()}
    return tree


def _with_params(variables, params):
    """Re-attach params into a variables(-of-models) tree."""
    if isinstance(variables, Mapping) and "params" in variables:
        return {**variables, "params": params}
    return {k: _with_params(variables[k], params[k]) for k in params}


class DistillTrainer:
    def __init__(self, models: DistillModels, config: dict, loop_type: str = "train"):
        self.models = models
        self.config = config
        learning = config["learning"]
        self.loss_funcs = get_losses_by_types(learning["loss_funcs"])
        self.loss_factors = learning["loss_factors"]
        self.loss_backward = learning["loss_backward"]
        self.flat_groups = flat_optimizer_groups(learning["optimizers"])
        self.b1, self.b2 = learning["adam_b1"], learning["adam_b2"]
        self.lr_decay = learning["lr_decay"]
        self.accumulate = learning.get("accumulated_grad_batches", 1)
        self.clip_value = learning.get("gradient_clip", 1000.0)

        loop_cfg = config["loops"][loop_type]
        batch = loop_cfg["batch_size"]
        self.rolls = (batch, *calculate_cycles(batch, loop_cfg["mix_size"]))
        self.batch_size = batch

        self.mel_cfg = MelConfig(
            n_fft=config["mel"]["n_fft"],
            num_mels=config["mel"]["num_mels"],
            sampling_rate=config["sampling_rate"],
            hop_size=config["mel"]["hop_size"],
            win_size=config["mel"]["win_size"],
            fmin=config["mel"]["fmin"],
            fmax=config["mel"]["fmax"],
        )

    # ------------------------------------------------------------------

    def create_state(self, key: jax.Array, segment_length: int) -> DistillTrainState:
        variables = self.models.init_variables(key, segment_length)
        opt_states = {}
        accum = {}
        for group, lr in self.flat_groups.items():
            params = self._group_params(variables, group)
            tx = make_optimizer(lr, self.b1, self.b2)
            opt_states[group] = tx.init(params)
            accum[group] = jax.tree_util.tree_map(jnp.zeros_like, params)
        return DistillTrainState(
            step=jnp.zeros((), jnp.int32),
            variables=variables,
            disc_copy=jax.tree_util.tree_map(lambda x: x, variables["discriminator"]),
            hunter_copies=jax.tree_util.tree_map(lambda x: x, variables["hunters"]),
            opt_states=opt_states,
            grad_accum=accum,
        )

    def _group_params(self, variables, group):
        """Params-only pytree for a flat optimizer group."""
        return {
            "/".join(path): _params_only(_get_path(variables, path))
            for path in expand_group_paths(group, variables)
        }

    def _apply_group_params(self, variables, group, params):
        for path in expand_group_paths(group, variables):
            key = "/".join(path)
            node = _get_path(variables, path)
            variables = _set_path(variables, path, _with_params(node, params[key]))
        return variables

    # ------------------------------------------------------------------
    # the forward + loss computation (pure in all params)
    # ------------------------------------------------------------------

    def compute_losses(self, variables, disc_copy, hunter_copies, batch, rng):
        m = self.models
        wav = batch["audio"]  # (B, T)
        time_labels = batch["time_labels"]  # {group: {label: (B, T_emb) int}}
        weights = m.label_weights

        noise_rngs = {"noise": rng}
        x = wav[:, :, None]  # NWC
        emb_narrow = m.encoder.apply(variables["encoder"], x, rngs=noise_rngs)
        mix_key = next(iter(emb_narrow.keys()))
        mix_size = sum(self.rolls)

        wav_order = expand(x, mix_size, 0)
        emb_order = {k: expand(v, mix_size, 0) for k, v in emb_narrow.items()}
        emb_mix = dict(emb_order)
        emb_mix[mix_key] = mix(emb_mix[mix_key], self.rolls, 0)

        wav_generated_mix = m.decoder.apply(variables["decoder"], emb_mix, rngs=noise_rngs)
        wav_generated_narrow = wav_generated_mix[: self.batch_size]
        emb_generated_mix = m.encoder.apply(variables["encoder"], wav_generated_mix, rngs=noise_rngs)
        emb_generated_order = dict(emb_generated_mix)
        emb_generated_order[mix_key] = unmix(emb_generated_order[mix_key], self.rolls, 0)
        wav_regenerated_order = m.decoder.apply(
            variables["decoder"], emb_generated_order, rngs=noise_rngs
        )

        wav_generated_all = jnp.concatenate([wav_regenerated_order, wav_generated_mix], axis=0)
        wav_generated_order_all = jnp.concatenate([wav_regenerated_order, wav_generated_narrow], axis=0)
        wav_order_all = jnp.concatenate([wav_order, x], axis=0)

        det_emb = sg(emb_narrow)
        det_wav_generated_all = sg(wav_generated_all)

        def mel(w):
            return log_mel_spectrogram(w[..., 0], self.mel_cfg)

        # ---- generator data (ref :342-358) ----
        def disc_apply(disc_vars, w, update):
            module = m.discriminator if update else m.discriminator_eval
            out, mutated = module.apply(
                disc_vars, w, mutable=["spectral"], rngs=noise_rngs
            )
            return out, mutated

        def adversarial_data():
            t, _ = disc_apply(disc_copy, wav_order_all, False)
            g, _ = disc_apply(disc_copy, wav_generated_all, False)
            t_mean, t_fmap = t["output"]["mean"], t["features"]
            g_mean, g_fmap = g["output"]["mean"], g["features"]
            g_fmap_clipped = [f[: wav_order_all.shape[0]] for f in g_fmap]
            return {
                "disc": {
                    "main": {"truth": t_mean["output"], "generated": -g_mean["output"]},
                    "sub": {
                        "truth": t_mean["features"],
                        "generated": [-lo for lo in g_mean["features"]],
                    },
                },
                "fmap": (g_fmap_clipped, t_fmap),
            }

        def keeper_apply(key, emb_half, vars_src=None):
            vs = (vars_src or variables["keepers"])[key]
            return m.keepers[key].apply(vs, emb_half, rngs=noise_rngs)

        keepers_data = {}
        for key in m.keepers:
            preds = keeper_apply(key, emb_narrow[key])["mean"]
            keepers_data[key] = {
                k1: {
                    k2: (cls2, time_labels[k1][k2], weights[k1][k2])
                    for k2, cls2 in cls.items()
                }
                for k1, cls in preds.items()
            }

        hunt_data = {}
        for key in m.hunters:
            keeper_preds = sg(keeper_apply(key, det_emb[key])["mean"])
            bias = sg(
                m.sniffers[key].apply(
                    variables["sniffers"][key], keeper_preds[key], rngs=noise_rngs
                )["mean"]
            )
            hunter_preds = m.hunters[key].apply(
                hunter_copies[key], emb_narrow[key], rngs=noise_rngs
            )["mean"]
            hunt_data[key] = {
                l1: {
                    l2: (hunter_preds[l1][l2], b2, time_labels[l1][l2], weights[l1][l2])
                    for l2, b2 in b.items()
                }
                for l1, b in bias.items()
            }

        generator_data = _merge_dicts(
            {
                "raw_recon": {
                    "wav": (wav_generated_order_all, wav_order_all),
                    "mel": (mel(wav_generated_order_all), mel(wav_order_all)),
                },
                "emb_recon": (emb_generated_order, emb_order),
            },
            {"adversarial": {"discriminator": adversarial_data()}},
            {"keepers": keepers_data},
            {"adversarial": {"hunters": hunt_data}},
        )

        # ---- discriminator data (ref :360-363, live disc on detached) ----
        def discriminator_data():
            # torch runs the spectral power iteration once per forward; chain
            # the two calls and surface the final u vectors (sg: they are
            # state, not differentiable quantities).
            t_full, mut1 = disc_apply(variables["discriminator"], x, True)
            disc_vars2 = {**variables["discriminator"], **sg(mut1)}
            g_full, mut2 = disc_apply(disc_vars2, det_wav_generated_all, True)
            t = t_full["output"]["mean"]
            g = g_full["output"]["mean"]
            data = {
                "main": {"truth": t["output"], "generated": -g["output"]},
                "sub": {"truth": t["features"], "generated": [-lo for lo in g["features"]]},
            }
            return data, sg(mut2)

        # ---- hunters data (live hunters on detached embeddings, ref :365-368) ----
        hunters_data = {}
        for key in m.hunters:
            preds = m.hunters[key].apply(
                variables["hunters"][key], det_emb[key], rngs=noise_rngs
            )["mean"]
            hunters_data[key] = {
                k1: {
                    k2: (cls2, time_labels[k1][k2], weights[k1][k2])
                    for k2, cls2 in cls.items()
                }
                for k1, cls in preds.items()
            }

        # ---- sniffers data (live sniffer on no-grad keeper preds, ref :370-373) ----
        sniffers_data = {}
        for key in m.sniffers:
            keeper_preds = sg(keeper_apply(key, det_emb[key])["mean"])
            bias = m.sniffers[key].apply(
                variables["sniffers"][key], keeper_preds[key], rngs=noise_rngs
            )["mean"]
            sniffers_data[key] = {
                l1: {
                    l2: (b2, time_labels[l1][l2], weights[l1][l2]) for l2, b2 in b.items()
                }
                for l1, b in bias.items()
            }

        disc_data, disc_mutated = discriminator_data()
        all_data = {
            "generator": generator_data,
            "discriminator": disc_data,
            "hunters": hunters_data,
            "sniffers": sniffers_data,
        }
        losses, trained_total = calculate_losses(
            self.loss_funcs, self.loss_factors, self.loss_backward, all_data
        )
        extra = {"wav": {"truth": x, "generated": wav_generated_all}}
        return trained_total, (losses, extra, disc_mutated)

    # ------------------------------------------------------------------

    def make_train_step(self, mesh: Mesh | None = None, donate: bool | None = None):
        """Build the jitted distillation step; with ``mesh``, a data-parallel
        step over the mesh's ``'data'`` axis.

        Sharding layout (measured + reasoned, SURVEY §2.6):

        - batch leaves shard over ``'data'`` (leading batch axis);
        - the train state — variables, frozen copies, and ALL six optimizer
          groups — is REPLICATED. At production scale the whole state is
          ~0.4 GB (26.4M params x amsgrad mu/nu/vmax), a few % of one chip's
          HBM, so sharding it (ZeRO-style over 'data', or whole groups to
          devices) would buy nothing while costing an all-gather in every
          forward; group-to-device sharding additionally load-imbalances
          (the generator group dominates). Replication leaves exactly ONE
          collective per step: the gradient psum over 'data' that GSPMD
          inserts at the loss boundary. The batch-mixing rolls
          (tensor_ops.mix) become collective-permutes over the sharded
          batch axis — also GSPMD-inserted, also over ICI.
        """
        # donate=None: HIFIGAN_TPU_NO_DONATE override, then dev-tunnel
        # autodetect (donated outputs can't be fetched through the axon
        # tunnel), then donate-by-default (docs/OPERATIONS.md)
        if donate is None:
            from hifigan_tpu.utils.runtime import donation_default

            donate = donation_default()
        group_keys = list(self.flat_groups.keys())
        txs = {g: make_optimizer(self.flat_groups[g], self.b1, self.b2) for g in group_keys}

        def step_fn(state: DistillTrainState, batch, rng):
            variables = state.variables

            def loss_fn(group_params):
                vs = variables
                for g in group_keys:
                    vs = self._apply_group_params(vs, g, group_params[g])
                total, aux = self.compute_losses(
                    vs, state.disc_copy, state.hunter_copies, batch, rng
                )
                return total, aux

            group_params = {g: self._group_params(variables, g) for g in group_keys}
            (_, (losses, _extra, disc_mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(group_params)
            # live discriminator's spectral power-iteration state
            variables = {
                **variables,
                "discriminator": {**variables["discriminator"], **disc_mutated},
            }

            # accumulate
            accum = jax.tree_util.tree_map(jnp.add, state.grad_accum, grads)
            new_step = state.step + 1
            do_update = (new_step % self.accumulate) == 0

            lr_scale = jnp.power(
                jnp.asarray(self.lr_decay, jnp.float32), new_step.astype(jnp.float32)
            )

            def apply_updates(operand):
                variables, accum, opt_states = operand
                new_vars, new_opts = variables, {}
                # global-norm clip + NaN/Inf skip per group
                for g in group_keys:
                    g_grads = jax.tree_util.tree_map(
                        lambda x: x / self.accumulate, accum[g]
                    )
                    gnorm = optax.global_norm(g_grads)
                    scale = jnp.minimum(1.0, self.clip_value / (gnorm + 1e-6))
                    g_grads = jax.tree_util.tree_map(lambda x: x * scale, g_grads)
                    corrupted = ~jnp.isfinite(gnorm)
                    params = self._group_params(new_vars, g)
                    opt_state = opt_states[g]
                    opt_state = opt_state._replace(
                        hyperparams={
                            **opt_state.hyperparams,
                            "learning_rate": self.flat_groups[g] * lr_scale,
                        }
                    )
                    updates, new_opt = txs[g].update(g_grads, opt_state, params)
                    updates = jax.tree_util.tree_map(
                        lambda u: jnp.where(corrupted, jnp.zeros_like(u), u), updates
                    )
                    new_params = optax.apply_updates(params, updates)
                    new_vars = self._apply_group_params(new_vars, g, new_params)
                    new_opts[g] = new_opt
                zero_accum = jax.tree_util.tree_map(jnp.zeros_like, accum)
                return new_vars, zero_accum, new_opts

            def no_update(operand):
                return operand

            new_vars, new_accum, new_opts = jax.lax.cond(
                do_update, apply_updates, no_update, (variables, accum, state.opt_states)
            )

            new_state = state.replace(
                step=new_step,
                variables=new_vars,
                disc_copy=jax.tree_util.tree_map(lambda x: x, new_vars["discriminator"]),
                hunter_copies=jax.tree_util.tree_map(lambda x: x, new_vars["hunters"]),
                opt_states=new_opts,
                grad_accum=new_accum,
            )
            return new_state, losses

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data_sh = NamedSharding(mesh, P("data"))
            return jax.jit(
                step_fn,
                in_shardings=(repl, data_sh, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,) if donate else (),
            )
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # ------------------------------------------------------------------

    def make_eval_step(self):
        """Validation step: (losses, data) where data mirrors the reference's
        transform_data output (lightning_model.py:226-274): wav/mel pairs and
        the label truth/keep/sniff/hunt prediction trees for the confusion
        and visualisation callbacks."""
        m = self.models

        def eval_fn(state: DistillTrainState, batch, rng):
            total, (losses, extra, _mut) = self.compute_losses(
                state.variables, state.disc_copy, state.hunter_copies, batch, rng
            )
            variables = state.variables
            noise_rngs = {"noise": rng}
            x = batch["audio"][:, :, None]
            emb = m.encoder.apply(variables["encoder"], x, rngs=noise_rngs)
            wav_generated = m.decoder.apply(variables["decoder"], emb, rngs=noise_rngs)

            def mel(w):
                return log_mel_spectrogram(w[..., 0], self.mel_cfg)

            keeps, sniffs, hunts = {}, {}, {}
            for key in m.keepers:
                kp = m.keepers[key].apply(variables["keepers"][key], emb[key], rngs=noise_rngs)["mean"]
                keeps.update(kp)
                sn = m.sniffers[key].apply(variables["sniffers"][key], kp[key], rngs=noise_rngs)["mean"]
                for g, t in sn.items():
                    sniffs[g] = t
                hp = m.hunters[key].apply(variables["hunters"][key], emb[key], rngs=noise_rngs)["mean"]
                hunts.update(hp)
            data = {
                "wav": {"truth": x, "generated": wav_generated},
                "mel": {"truth": mel(x), "generated": mel(wav_generated)},
                "label": {
                    "truth": batch["time_labels"],
                    "keep": keeps,
                    "sniff": sniffs,
                    "hunt": hunts,
                },
            }
            return losses, data

        return jax.jit(eval_fn)
