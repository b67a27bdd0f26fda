"""Vocoder GAN trainer — the TPU-native reconstruction of the reference's
deleted `train.py` (its CLI surface is documented at reference README.md:33-39
and its checkpoint layout implied by src/utils.py:96-101 / src/inference.py:41).

Recipe (HiFi-GAN paper + src/models.py:251-282): LSGAN discriminator loss on
MPD+MSD, generator adversarial + feature-matching (x2) + 45x mel-L1; two
AdamW optimizers (betas 0.8/0.99, per-epoch ExponentialLR decay).

TPU-first design:
- ONE jitted train step computes the D update and then the G update against
  the refreshed discriminators (same ordering as the torch recipe), with the
  generator forward/backward executed exactly once via `jax.vjp`.
- Mels (both the generator-input mel and the fmax_for_loss mel target) are
  computed on device inside the step — two MXU matmuls, not host DSP.
- Data parallelism: batch sharded over the mesh 'data' axis; pjit inserts
  the gradient psum. State is replicated.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
from hifigan_tpu.models import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from hifigan_tpu.models.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    mel_l1_loss,
)


class VocoderTrainState(struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_mpd: Any
    params_msd: Any
    spectral_msd: Any  # spectral-norm u vectors (MSD scale 0)
    opt_g: Any
    opt_d: Any


def make_optimizers(h):
    """AdamW pair matching the torch recipe (upstream train.py surface);
    lr is injected as a state hyperparameter so the per-epoch exponential
    decay is a host-side leaf update, not a recompile."""
    tx_g = optax.inject_hyperparams(optax.adamw)(
        learning_rate=h["learning_rate"], b1=h["adam_b1"], b2=h["adam_b2"], weight_decay=0.01
    )
    tx_d = optax.inject_hyperparams(optax.adamw)(
        learning_rate=h["learning_rate"], b1=h["adam_b1"], b2=h["adam_b2"], weight_decay=0.01
    )
    return tx_g, tx_d


def set_learning_rate(opt_state, lr: float):
    """Functional ExponentialLR step (torch scheduler equivalent)."""
    return opt_state._replace(hyperparams={**opt_state.hyperparams, "learning_rate": lr})


def build_discriminators(h, mesh: Mesh | None = None):
    """MPD/MSD with reference widths by default; overridable via optional
    h keys (mpd_periods/mpd_channels/msd_width/msd_num_scales) for smaller
    footprints and tests. ``disc_compute_dtype: 'bfloat16'`` runs the
    discriminator conv stacks in bf16 (params and losses stay f32) — ~2x MXU
    throughput on TPU for the D+G passes. ``mesh`` lets the MSD's fused
    Pallas stacks run batch-sharded via shard_map on multi-device meshes
    (DiscriminatorS.mesh)."""
    dtype = h.get("disc_compute_dtype")
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    fused = h.get("disc_fused", False)  # fused 2B pass measured 200x slower on v5e
    mpd = MultiPeriodDiscriminator(
        periods=tuple(h.get("mpd_periods", (2, 3, 5, 7, 11))),
        channels=tuple(h.get("mpd_channels", (32, 128, 512, 1024))),
        dtype=dtype,
        fused=fused,
    )
    msd = MultiScaleDiscriminator(
        width=h.get("msd_width", 128), num_scales=h.get("msd_num_scales", 3),
        dtype=dtype,
        fused=fused,
        # 'auto' resolves to the whole-stack fused Pallas form on
        # accelerators (measured faster: step 79.9 vs 82.0 ms at B16x8192),
        # XLA on CPU / when a multi-device run has no mesh wiring.
        conv_impl=h.get("msd_conv_impl", "auto"),
        conv_interpret=h.get("msd_conv_interpret", False),
        mesh=mesh,
    )
    return mpd, msd


def create_train_state(h, key: jax.Array, segment_size: int | None = None) -> VocoderTrainState:
    segment_size = segment_size or h["segment_size"]
    frames = segment_size // h["hop_size"]
    gen = Generator(h)
    # init through the XLA form: the param tree is impl-independent (the
    # fused path collects weights through the same NormConv1d names), and
    # this skips compiling a throwaway B=1 fused Pallas stack (2-15 min per
    # graph through the dev tunnel)
    mpd, msd = build_discriminators({**h, "msd_conv_impl": "xla"})

    k1, k2, k3 = jax.random.split(key, 3)
    mel0 = jnp.zeros((1, h["num_mels"], frames))
    wav0 = jnp.zeros((1, segment_size))
    vg = gen.init(k1, mel0)
    vmpd = mpd.init(k2, wav0, wav0)
    vmsd = msd.init(k3, wav0, wav0)

    tx_g, tx_d = make_optimizers(h)
    params_d = {"mpd": vmpd["params"], "msd": vmsd["params"]}
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=vg["params"],
        params_mpd=vmpd["params"],
        params_msd=vmsd["params"],
        spectral_msd=vmsd.get("spectral", {}),
        opt_g=tx_g.init(vg["params"]),
        opt_d=tx_d.init(params_d),
    )


def _gen_apply(h, params_g, mel):
    """Generator forward for the train/eval steps.

    ``gen_compute_dtype: 'bfloat16'`` runs the generator conv stack (fwd AND
    the vjp backward) in bf16 — params, the tanh output, and every loss stay
    f32 (same mixed-precision contract as ``disc_compute_dtype``)."""
    dtype = h.get("gen_compute_dtype") or jnp.float32
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    wav = Generator(h, dtype=dtype).apply({"params": params_g}, mel)
    return wav[:, 0, :]  # (B, T)


def make_train_step(h, mesh: Mesh | None = None, donate: bool | None = None,
                    state_shardings=None):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    batch: {'audio': (B, T) float32, optional 'mel': (B, 80, F)} — when
    'mel' is absent (normal training) it is computed on device; when present
    (fine-tuning on teacher-forced mels, reference src/meldataset.py:155-172)
    it is used as the generator input.

    ``donate=None`` resolves via utils.runtime.donation_default():
    HIFIGAN_TPU_NO_DONATE override first, dev-tunnel autodetect second,
    donate-on-real-hardware default last.
    """
    if donate is None:
        from hifigan_tpu.utils.runtime import donation_default

        donate = donation_default()
    mel_cfg = MelConfig.from_hparams(h)
    mel_loss_cfg = MelConfig.from_hparams(h, fmax_key="fmax_for_loss")
    mpd, msd = build_discriminators(h, mesh=mesh)
    tx_g, tx_d = make_optimizers(h)

    def step_fn(state: VocoderTrainState, batch: dict):
        y = batch["audio"]  # (B, T)
        mel_in = batch.get("mel")
        if mel_in is None:
            mel_in = log_mel_spectrogram(y, mel_cfg)
        y_mel = log_mel_spectrogram(y, mel_loss_cfg)

        # Generator forward ONCE, keeping the pullback for the G update.
        y_g_hat, g_vjp = jax.vjp(lambda pg: _gen_apply(h, pg, mel_in), state.params_g)
        y_hat_sg = jax.lax.stop_gradient(y_g_hat)

        # ---------------- discriminator update ----------------
        def d_loss_fn(params_d, spectral_msd):
            (f_r, f_g, _, _), _ = mpd.apply(
                {"params": params_d["mpd"]}, y, y_hat_sg, True, mutable=["spectral"]
            )
            (s_r, s_g, _, _), new_spec = msd.apply(
                {"params": params_d["msd"], "spectral": spectral_msd},
                y,
                y_hat_sg,
                True,
                mutable=["spectral"],
            )
            loss_f, _, _ = discriminator_loss(f_r, f_g)
            loss_s, _, _ = discriminator_loss(s_r, s_g)
            return loss_f + loss_s, (new_spec.get("spectral", spectral_msd), loss_f, loss_s)

        params_d = {"mpd": state.params_mpd, "msd": state.params_msd}
        (loss_disc_all, (spec1, loss_disc_f, loss_disc_s)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(params_d, state.spectral_msd)
        updates_d, new_opt_d = tx_d.update(grads_d, state.opt_d, params_d)
        params_d = optax.apply_updates(params_d, updates_d)

        # ---------------- generator update (vs refreshed D) ----------------
        def g_loss_wrt_yhat(y_hat):
            y_hat_mel = log_mel_spectrogram(y_hat, mel_loss_cfg)
            loss_mel = mel_l1_loss(y_mel, y_hat_mel) * 45.0
            (_, y_df_g, fmap_f_r, fmap_f_g), _ = mpd.apply(
                {"params": params_d["mpd"]}, y, y_hat, True, mutable=["spectral"]
            )
            # weight_grads=False: this traversal differentiates only wrt
            # y_hat (D params are frozen constants here), so the fused MSD
            # backward kernels skip every weight-grad dot — XLA cannot DCE
            # inside a Mosaic call, hence the explicit declaration.
            (_, y_ds_g, fmap_s_r, fmap_s_g), spec2 = msd.apply(
                {"params": params_d["msd"], "spectral": spec1},
                y,
                y_hat,
                True,
                False,
                mutable=["spectral"],
            )
            loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
            loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
            loss_gen_f, _ = generator_loss(y_df_g)
            loss_gen_s, _ = generator_loss(y_ds_g)
            total = loss_gen_f + loss_gen_s + loss_fm_f + loss_fm_s + loss_mel
            return total, (loss_mel, spec2.get("spectral", spec1))

        (loss_gen_all, (loss_mel45, new_spec)), grad_yhat = jax.value_and_grad(
            g_loss_wrt_yhat, has_aux=True
        )(y_g_hat)
        (grads_g,) = g_vjp(grad_yhat)
        updates_g, new_opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        metrics = {
            "loss_gen_all": loss_gen_all,
            "loss_disc_all": loss_disc_all,
            "loss_disc_f": loss_disc_f,
            "loss_disc_s": loss_disc_s,
            "mel_error": loss_mel45 / 45.0,
        }
        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_mpd=params_d["mpd"],
            params_msd=params_d["msd"],
            spectral_msd=new_spec,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
        )
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        state_sh = state_shardings if state_shardings is not None else repl
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, data),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(h):
    """Validation: full-band mel L1 between real audio and resynthesis."""
    mel_cfg = MelConfig.from_hparams(h)
    mel_loss_cfg = MelConfig.from_hparams(h, fmax_key="fmax_for_loss")

    @jax.jit
    def eval_fn(params_g, batch):
        y = batch["audio"]
        mel_in = batch.get("mel")
        if mel_in is None:
            mel_in = log_mel_spectrogram(y, mel_cfg)
        y_hat = _gen_apply(h, params_g, mel_in)
        y_mel = log_mel_spectrogram(y, mel_loss_cfg)
        y_hat_mel = log_mel_spectrogram(y_hat, mel_loss_cfg)
        return mel_l1_loss(y_mel, y_hat_mel), y_hat

    return eval_fn


# ---------------------------------------------------------------------------
# Host training loop
# ---------------------------------------------------------------------------


def train(a, h, mesh: Mesh | None = None, writer=None) -> VocoderTrainState:
    """Full training loop with checkpointing/validation/TensorBoard, driving
    the jitted step. `a` carries the CLI surface of the reconstructed
    train.py (checkpoint_path, training_epochs, *_interval, fine_tuning...)."""
    import os

    from hifigan_tpu.data.meldataset import MelDataset, get_dataset_filelist
    from hifigan_tpu.parallel.mesh import shard_batch
    from hifigan_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        scan_checkpoint,
    )

    os.makedirs(a.checkpoint_path, exist_ok=True)
    key = jax.random.PRNGKey(h["seed"])
    state = create_train_state(h, key)
    last_epoch = -1

    cp_g = scan_checkpoint(a.checkpoint_path, "g_")
    cp_do = scan_checkpoint(a.checkpoint_path, "do_")
    if cp_g is not None:
        g_ck = load_checkpoint(cp_g)
        gen_params = g_ck["generator"]
        if any("." in k for k in gen_params):  # reference torch checkpoint
            from hifigan_tpu.train.checkpoint import convert_torch_generator

            gen_params = convert_torch_generator(gen_params)["params"]
            print(f"Converted reference torch generator checkpoint {cp_g}")
        state = state.replace(params_g=gen_params)
    if cp_do is not None:
        do_ck = load_checkpoint(cp_do)
        if any(isinstance(k, str) and "." in k for k in do_ck.get("mpd", {})):
            from hifigan_tpu.train.checkpoint import convert_torch_discriminators

            conv = convert_torch_discriminators(do_ck)
            do_ck = {
                "mpd": conv["mpd"]["params"],
                "msd": conv["msd"]["params"],
                "spectral_msd": conv["msd"].get("spectral", state.spectral_msd),
                "steps": do_ck.get("steps", 0),
                "epoch": do_ck.get("epoch", -1),
            }
            print(f"Converted reference torch discriminator checkpoint {cp_do}")
        state = state.replace(
            params_mpd=do_ck["mpd"],
            params_msd=do_ck["msd"],
            spectral_msd=do_ck.get("spectral_msd", state.spectral_msd),
            step=jnp.asarray(do_ck["steps"], jnp.int32),
        )
        if "opt_g" in do_ck and "opt_d" in do_ck:
            from flax import serialization as _ser

            state = state.replace(
                opt_g=_ser.from_state_dict(state.opt_g, do_ck["opt_g"]),
                opt_d=_ser.from_state_dict(state.opt_d, do_ck["opt_d"]),
            )
        last_epoch = int(do_ck.get("epoch", -1))
        print(f"Restored checkpoint at step {int(state.step)}, epoch {last_epoch}")

    training_files, validation_files = get_dataset_filelist(
        a.input_training_file, a.input_validation_file, a.input_wavs_dir
    )
    ds_kwargs = dict(
        segment_size=h["segment_size"],
        n_fft=h["n_fft"],
        num_mels=h["num_mels"],
        hop_size=h["hop_size"],
        win_size=h["win_size"],
        sampling_rate=h["sampling_rate"],
        fmin=h["fmin"],
        fmax=h["fmax"],
        fmax_loss=h.get("fmax_for_loss"),
        fine_tuning=getattr(a, "fine_tuning", False),
        base_mels_path=getattr(a, "input_mels_dir", None),
    )
    trainset = MelDataset(training_files, **ds_kwargs)
    validset = MelDataset(
        validation_files, **{**ds_kwargs, "segment_size": h["segment_size"]}, shuffle=False
    )

    train_step = make_train_step(h, mesh=mesh)
    eval_step = make_eval_step(h)

    steps = int(state.step)
    for epoch in range(max(0, last_epoch), a.training_epochs):
        lr = h["learning_rate"] * (h["lr_decay"] ** epoch)
        state = state.replace(
            opt_g=set_learning_rate(state.opt_g, lr),
            opt_d=set_learning_rate(state.opt_d, lr),
        )
        t_epoch = time.time()
        for batch in trainset.batches(h["batch_size"]):
            batch.pop("filenames", None)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            t0 = time.time()
            state, metrics = train_step(state, batch)
            steps += 1

            if steps % a.stdout_interval == 0:
                m = jax.device_get(metrics)
                print(
                    f"Steps: {steps}, Gen Loss Total: {m['loss_gen_all']:.3f}, "
                    f"Mel-Spec. Error: {m['mel_error']:.3f}, s/b: {time.time()-t0:.3f}"
                )
            if writer is not None and steps % a.summary_interval == 0:
                m = jax.device_get(metrics)
                for k, v in m.items():
                    writer.add_scalar(f"training/{k}", float(v), steps)
                writer.add_scalar("training/learning_rate", lr, steps)
            if steps % a.checkpoint_interval == 0 and steps != 0:
                save_checkpoint(
                    os.path.join(a.checkpoint_path, f"g_{steps:08d}"),
                    {"generator": state.params_g},
                )
                from flax import serialization as _ser

                save_checkpoint(
                    os.path.join(a.checkpoint_path, f"do_{steps:08d}"),
                    {
                        "mpd": state.params_mpd,
                        "msd": state.params_msd,
                        "spectral_msd": state.spectral_msd,
                        # optimizer moments (upstream do_* saves optim_g/optim_d
                        # state_dicts; without them resume silently reinits Adam)
                        "opt_g": _ser.to_state_dict(state.opt_g),
                        "opt_d": _ser.to_state_dict(state.opt_d),
                        "steps": steps,
                        "epoch": epoch,
                    },
                )
            if steps % a.validation_interval == 0 and steps != 0:
                val_err = 0.0
                n = 0
                # upstream validates at batch size 1 (train.py surface)
                for vb in validset.batches(1, shuffle=False, drop_last=False):
                    vb.pop("filenames", None)
                    err, y_hat = eval_step(state.params_g, vb)
                    val_err += float(err)
                    if writer is not None and n < 4:
                        # validation audio + mel figures (upstream train.py logs
                        # y_hat audio and generated-spec figures per val item)
                        import numpy as _np

                        from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
                        from hifigan_tpu.utils.plotting import plot_spectrogram

                        wav_np = _np.asarray(y_hat[0]).reshape(-1, 1)
                        writer.add_audio(f"generated/y_hat_{n}", wav_np, steps, h["sampling_rate"])
                        mel_hat = log_mel_spectrogram(y_hat[:1], MelConfig.from_hparams(h))
                        writer.add_figure(
                            f"generated/y_hat_spec_{n}",
                            plot_spectrogram(_np.asarray(mel_hat[0])),
                            steps,
                        )
                    n += 1
                if n:
                    val_err /= n
                    print(f"Steps: {steps}, Validation Mel-Spec. Error: {val_err:.4f}")
                    if writer is not None:
                        writer.add_scalar("validation/mel_spec_error", val_err, steps)
        print(f"Epoch {epoch + 1} took {time.time()-t_epoch:.1f}s")
    return state
