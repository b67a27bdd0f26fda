"""Autoencoding inference CLI: wav -> encoder -> decoder -> wav.

The reference's `inference_autoencoding.py` is latently broken (imports a
`Generator` that doesn't exist and calls `get_generator_configs()` without
its required `layers`, see SURVEY §2.6 misc) — this is the working
equivalent of its intended surface: load a distillation experiment
(config.yaml + checkpoints/latest), autoencode every wav in a directory.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from hifigan_tpu.audio import load_wav, save_wav


def main() -> None:
    print("Initializing Autoencoding Inference Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_wavs_dir", default="test_files")
    parser.add_argument("--output_dir", default="autoencoded_files")
    parser.add_argument("--experiment_dir", required=True,
                        help="logs/<name>/version_<v> directory with config.yaml + checkpoints/")
    a = parser.parse_args()

    with open(os.path.join(a.experiment_dir, "config.yaml")) as f:
        config = yaml.load(f, yaml.FullLoader)

    from flax import serialization

    from hifigan_tpu.distill.model import DistillModels
    from hifigan_tpu.distill.train import DistillTrainer

    # Labels/weights only shape the classifiers; autoencoding needs
    # encoder+decoder, so placeholders suffice when no dataset is mounted —
    # and only the encoder/decoder subtrees are restored from the checkpoint
    # (the classifier trees depend on the label taxonomy).
    placeholder = {"content": {"sad": ("none", "silence", "speech")}, "style": {"mic-brand": ("none",)}}
    weights = {
        g: {k: {"true": tuple([1.0] * len(v)), "false": tuple([1.0] * len(v))} for k, v in gg.items()}
        for g, gg in placeholder.items()
    }
    models = DistillModels(config, placeholder, weights, sampling_rate=config["sampling_rate"])
    trainer = DistillTrainer(models, config)
    state = trainer.create_state(
        jax.random.PRNGKey(0), config["loops"]["train"]["segment_length"]
    )
    ckpt = os.path.join(a.experiment_dir, "checkpoints", "latest")
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        from hifigan_tpu.utils.pytree import restack_legacy_ensembles

        variables = dict(state.variables)
        for key in ("encoder", "decoder"):
            variables[key] = serialization.from_state_dict(
                state.variables[key],
                restack_legacy_ensembles(
                    restored["variables"][key],
                    serialization.to_state_dict(state.variables[key]),
                ),
            )
        state = state.replace(variables=variables)
        print(f"Loaded {ckpt} (encoder/decoder restored, step {restored.get('step')})")

    encode = jax.jit(lambda v, x: models.encoder.apply(v, x))
    decode = jax.jit(lambda v, e: models.decoder.apply(v, e))

    os.makedirs(a.output_dir, exist_ok=True)
    seg = models.embedding_size
    for filename in sorted(os.listdir(a.input_wavs_dir)):
        if not filename.lower().endswith(".wav"):
            continue
        wav, sr = load_wav(os.path.join(a.input_wavs_dir, filename))
        mono = wav[0]
        trim = (len(mono) // seg) * seg
        x = jnp.asarray(mono[:trim])[None, :, None]
        emb = encode(state.variables["encoder"], x)
        y = decode(state.variables["decoder"], emb)
        out = os.path.join(a.output_dir, os.path.splitext(filename)[0] + "_autoencoded.wav")
        save_wav(out, np.asarray(y[0, :, 0]), config["sampling_rate"])
        print(out)


if __name__ == "__main__":
    main()
