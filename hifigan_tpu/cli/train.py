"""Vocoder training CLI — reconstructs the reference's deleted `train.py`
surface (`python train.py --config config_v1.json [--checkpoint_path]
[--fine_tuning True]`, reference README.md:33-39,73-77).
"""

from __future__ import annotations

import argparse
import json
import os

from hifigan_tpu.config import AttrDict, build_env
from hifigan_tpu.parallel.mesh import create_mesh
from hifigan_tpu.train.vocoder import train


def main() -> None:
    print("Initializing Training Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--group_name", default=None)
    parser.add_argument("--input_wavs_dir", default="LJSpeech-1.1/wavs")
    parser.add_argument("--input_mels_dir", default="ft_dataset")
    parser.add_argument("--input_training_file", default="LJSpeech-1.1/training.txt")
    parser.add_argument("--input_validation_file", default="LJSpeech-1.1/validation.txt")
    parser.add_argument("--checkpoint_path", default="cp_hifigan")
    parser.add_argument("--config", default="")
    parser.add_argument("--training_epochs", default=3100, type=int)
    parser.add_argument("--stdout_interval", default=5, type=int)
    parser.add_argument("--checkpoint_interval", default=5000, type=int)
    parser.add_argument("--summary_interval", default=100, type=int)
    parser.add_argument("--validation_interval", default=1000, type=int)
    parser.add_argument("--fine_tuning", default=False, type=bool)
    a = parser.parse_args()

    with open(a.config) as f:
        h = AttrDict(json.load(f))
    build_env(a.config, "config.json", a.checkpoint_path)

    mesh = create_mesh()
    print(f"mesh: {mesh}")

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(a.checkpoint_path, "logs"))
    except ImportError:
        pass

    train(a, h, mesh=mesh, writer=writer)


if __name__ == "__main__":
    main()
