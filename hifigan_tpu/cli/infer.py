"""Vocoder inference CLI: wav -> mel -> wav.

Flag surface matches reference src/inference.py:68-71
(--input_wavs_dir/--output_dir/--checkpoint_file), config.json loaded from
the checkpoint's directory (src/inference.py:74). Accepts both our native
checkpoints and the reference's PyTorch ``g_*`` files (converted on load).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.audio import MAX_WAV_VALUE, load_wav, save_wav
from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
from hifigan_tpu.config import AttrDict
from hifigan_tpu.models import Generator, fold_weight_norm
from hifigan_tpu.train.checkpoint import convert_torch_generator, load_checkpoint


def load_generator_params(checkpoint_file: str, fold: bool = True):
    """Load a generator checkpoint (native or torch) -> (params, folded?)."""
    ckpt = load_checkpoint(checkpoint_file)
    gen_sd = ckpt["generator"] if "generator" in ckpt else ckpt
    if any("." in k for k in gen_sd):  # flat torch state_dict
        variables = convert_torch_generator(gen_sd)
    else:
        variables = {"params": gen_sd}
    params = variables["params"]
    already_folded = "kernel" in params.get("conv_pre", {})
    if fold and not already_folded:
        params = fold_weight_norm(params)
        already_folded = True
    return params, already_folded


def inference(a, h) -> None:
    params, folded = load_generator_params(a.checkpoint_file)
    gen = Generator(h, folded=folded)
    mel_cfg = MelConfig.from_hparams(h)
    apply = jax.jit(lambda p, m: gen.apply({"params": p}, m))

    os.makedirs(a.output_dir, exist_ok=True)
    for filename in sorted(os.listdir(a.input_wavs_dir)):
        if not filename.lower().endswith(".wav"):
            continue
        wav, sr = load_wav(os.path.join(a.input_wavs_dir, filename))
        x = log_mel_spectrogram(jnp.asarray(wav), mel_cfg)
        y = apply(params, x)
        audio = np.asarray(y[0, 0])
        audio = (audio * MAX_WAV_VALUE).astype(np.int16)
        out = os.path.join(a.output_dir, os.path.splitext(filename)[0] + "_generated.wav")
        save_wav(out, audio, h["sampling_rate"])
        print(out)


def main() -> None:
    print("Initializing Inference Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_wavs_dir", default="test_files")
    parser.add_argument("--output_dir", default="generated_files")
    parser.add_argument("--checkpoint_file", required=True)
    a = parser.parse_args()

    config_file = os.path.join(os.path.split(a.checkpoint_file)[0], "config.json")
    with open(config_file) as f:
        h = AttrDict(json.load(f))
    inference(a, h)


if __name__ == "__main__":
    main()
