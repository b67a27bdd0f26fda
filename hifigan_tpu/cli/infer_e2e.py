"""End-to-end inference CLI: precomputed mel (.npy) -> wav.

Flag surface matches reference src/inference_e2e.py:63-66
(--input_mels_dir/--output_dir/--checkpoint_file); outputs
``*_generated_e2e.wav`` (src/inference_e2e.py:55).
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from hifigan_tpu.audio import MAX_WAV_VALUE, save_wav
from hifigan_tpu.config import AttrDict
from hifigan_tpu.cli.infer import load_generator_params, make_apply, synthesize


def inference_e2e(a, h) -> None:
    params, folded = load_generator_params(a.checkpoint_file)
    apply = make_apply(a, h, params, folded)

    os.makedirs(a.output_dir, exist_ok=True)
    for filename in sorted(os.listdir(a.input_mels_dir)):
        if not filename.endswith(".npy"):
            continue
        x = np.load(os.path.join(a.input_mels_dir, filename))
        if x.ndim == 2:
            x = x[None]
        y = synthesize(a, h, apply, params, jnp.asarray(x))
        audio = np.asarray(y[0, 0])
        audio = (audio * MAX_WAV_VALUE).astype(np.int16)
        out = os.path.join(
            a.output_dir, os.path.splitext(filename)[0] + "_generated_e2e.wav"
        )
        save_wav(out, audio, h["sampling_rate"])
        print(out)


def main() -> None:
    print("Initializing Inference Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_mels_dir", default="test_mel_files")
    parser.add_argument("--output_dir", default="generated_files_from_mel")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--fast", action="store_true",
                        help="fused-Pallas low-latency tail (folded WN)")
    parser.add_argument("--streaming_chunk", type=int, default=0,
                        help="vocode in fixed windows of N mel frames with "
                             "receptive-field overlap (0 = whole utterance)")
    a = parser.parse_args()

    config_file = os.path.join(os.path.split(a.checkpoint_file)[0], "config.json")
    with open(config_file) as f:
        h = AttrDict(json.load(f))
    inference_e2e(a, h)


if __name__ == "__main__":
    main()
