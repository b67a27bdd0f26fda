"""Round-5: production-scale distillation-trainer CONVERGENCE run on
hardware — training-quality evidence for the reference's PRIMARY trainer
(lightning_model.py:297-482), complementing the round-4 20k-step vocoder
curve (experiments/artifacts/r4_convergence_20k.*).

The reference's /datasets corpus is not available here, so the corpus is a
synthetic speech-like one where every LABEL IS A REAL PROPERTY OF THE
AUDIO, giving the whole adversarial stack learnable signal:

- speaker (40): per-speaker base f0 + formant-bandwidth profile;
- sex (3): derived from the speaker's f0 band (<140 / <200 / higher Hz);
- phones (72): each segment is a random phone SEQUENCE; each phone is a
  formant-triple preset that shapes the harmonic envelope over its span,
  labelled at embedding granularity (273 samples = 17 ms @ 16 kHz);
- sad (2): speech-activity from the syllable AM gate (silence spans = 0);
- mic-brand (5): per-utterance spectral tilt (5 fixed "microphone"
  colorations applied in the time domain);
- the seven augmentation labels: class 0 (augmentations off) — matching
  the reference's label scheme when an augmentor does not fire
  (multilabel_wave_dataset.py:33-40).

Logs the full nested loss tree (flattened) every 25 steps; writes
experiments/artifacts/r5_distill_convergence.json + .png. Healthy
convergence = raw_recon/mel decreasing, keeper losses decreasing
(labels learnable), GAN losses oscillating bounded.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/r5_distill_convergence.py [steps]
"""
import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.distill.model import DistillModels
from hifigan_tpu.distill.train import DistillTrainer

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
LOG_EVERY = 25
CORPUS = 96  # utterances, cycled in epochs (batch 3)

config = json.load(open("/root/repo/configs/distill.json"))
labels = {
    "content": {"speaker": list(range(40)), "sex": list(range(3)),
                "phones": list(range(72)), "sad": list(range(2))},
    "style": {"mic-brand": list(range(5)), "noise": list(range(5)),
              "rir": list(range(3)), "lowpass": list(range(2)),
              "highpass": list(range(2)), "reverb": list(range(2)),
              "hilbert": list(range(2)), "codec": list(range(5))},
}
uniform = lambda n: {"true": tuple([1.0 / n] * n),
                     "false": tuple([1.0 - 1.0 / n] * n)}
weights = {g: {k: uniform(len(v)) for k, v in group.items()}
           for g, group in labels.items()}

seg = config["loops"]["train"]["segment_length"]
sr = config["sampling_rate"]

rng = np.random.default_rng(0)

# ---- speakers, phones, mics ------------------------------------------------
N_SPK = 40
speakers = [
    {"f0": rng.uniform(85.0, 280.0), "fbw": rng.uniform(60.0, 160.0, 3)}
    for _ in range(N_SPK)
]
sex_of = [0 if s["f0"] < 140 else (1 if s["f0"] < 200 else 2) for s in speakers]
N_PHONE = 72
phone_formants = rng.uniform([250, 800, 1800], [950, 2500, 3500], (N_PHONE, 3))
# 5 "microphones": fixed first-order spectral tilts (y[n] = x[n] + a*x[n-1])
mic_tilt = np.linspace(-0.35, 0.35, 5)


def synth_utterance():
    spk_id = int(rng.integers(N_SPK))
    spk = speakers[spk_id]
    mic = int(rng.integers(5))
    emb = 273  # embedding granularity @16 kHz
    t_emb = seg // emb

    # phone sequence: random ids, 4-12 embedding frames each
    phone_lab = np.zeros(t_emb, np.int64)
    pos = 0
    while pos < t_emb:
        dur = int(rng.integers(4, 13))
        phone_lab[pos : pos + dur] = int(rng.integers(N_PHONE))
        pos += dur

    # f0 contour (slow walk) + harmonics under the ACTIVE PHONE's formants
    n_ctl = 8
    ctl = spk["f0"] * (1.0 + rng.uniform(-0.25, 0.25, n_ctl))
    f0 = np.interp(np.linspace(0, 1, seg), np.linspace(0, 1, n_ctl), ctl)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    formants = phone_formants[phone_lab]  # (t_emb, 3)
    formants_t = np.repeat(formants, emb, axis=0)[:seg]  # (seg, 3)
    wav = np.zeros(seg, np.float32)
    for k in range(1, 17):
        fk = f0 * k
        gain = np.zeros(seg)
        for j in range(3):
            gain += 1.0 / (1.0 + ((fk - formants_t[:, j]) / (spk["fbw"][j] * 2.5)) ** 2)
        gain *= 1.0 / k
        gain[fk > sr / 2 * 0.95] = 0.0
        wav += (gain * np.sin(k * phase)).astype(np.float32)

    # syllable AM with hard silence gates -> sad label
    t = np.arange(seg) / sr
    am = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t + rng.uniform(0, 6.28))
    wav *= am.astype(np.float32)
    sad_lab = np.ones(t_emb, np.int64)
    for _ in range(int(rng.integers(1, 4))):
        a = int(rng.integers(0, t_emb - 8))
        d = int(rng.integers(4, 16))
        wav[a * emb : (a + d) * emb] = 0.0
        sad_lab[a : a + d] = 0

    # microphone coloration: first-order tilt
    wav = wav + mic_tilt[mic] * np.concatenate([[0.0], wav[:-1]])
    peak = np.max(np.abs(wav)) + 1e-6
    wav = (wav / peak * rng.uniform(0.5, 0.95)).astype(np.float32)

    zeros = np.zeros(t_emb, np.int64)
    tl = {
        "content": {"speaker": np.full(t_emb, spk_id), "sex": np.full(t_emb, sex_of[spk_id]),
                    "phones": phone_lab, "sad": sad_lab},
        "style": {"mic-brand": np.full(t_emb, mic), "noise": zeros, "rir": zeros,
                  "lowpass": zeros, "highpass": zeros, "reverb": zeros,
                  "hilbert": zeros, "codec": zeros},
    }
    return wav, tl


print(f"generating corpus ({CORPUS} utterances x {seg / sr:.2f}s)...", flush=True)
t0 = time.perf_counter()
corpus = [synth_utterance() for _ in range(CORPUS)]
print(f"corpus done in {time.perf_counter() - t0:.0f}s", flush=True)

models = DistillModels(config, labels, weights, sampling_rate=sr,
                       compute_dtype="bfloat16")
trainer = DistillTrainer(models, config)
state = trainer.create_state(jax.random.PRNGKey(0), seg)
step = trainer.make_train_step(donate=False)
bsz = trainer.batch_size

order = rng.permutation(CORPUS)
pos = 0


def next_batch():
    global order, pos
    if pos + bsz > CORPUS:
        order = rng.permutation(CORPUS)
        pos = 0
    idx = order[pos : pos + bsz]
    pos += bsz
    items = [corpus[i] for i in idx]
    audio = np.stack([w for w, _ in items])
    tls = [tl for _, tl in items]
    time_labels = {
        g: {k: np.stack([tl[g][k] for tl in tls]) for k in tls[0][g]}
        for g in tls[0]
    }
    return {"audio": audio, "time_labels": time_labels}


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten(v, key + "/"))
        elif getattr(v, "ndim", 1) == 0:
            out[key] = float(v)
    return out


t0 = time.perf_counter()
state, losses = step(state, next_batch(), jax.random.PRNGKey(1))
jax.block_until_ready(losses)
print(f"compile+first {time.perf_counter() - t0:.0f}s "
      f"total={float(losses['total']):.3f}", flush=True)

traj = []
t0 = time.perf_counter()
for i in range(1, STEPS + 1):
    state, losses = step(state, next_batch(), jax.random.PRNGKey(1 + i))
    if i % LOG_EVERY == 0:
        rec = {"step": i, **flatten(losses)}
        assert all(np.isfinite(v) for v in rec.values()), rec
        traj.append(rec)
        if i % 200 == 0:
            dt = (time.perf_counter() - t0) / i * 1000
            keys = [k for k in rec if "mel" in k or k == "total"][:3]
            print(f"step {i}: total={rec['total']:.3f} "
                  + " ".join(f"{k}={rec[k]:.4f}" for k in keys)
                  + f" ({dt:.1f} ms/step avg incl host)", flush=True)

art = Path("/root/repo/experiments/artifacts")
art.mkdir(exist_ok=True)
out = {"steps": STEPS, "corpus": CORPUS, "batch": bsz, "segment": seg,
       "sampling_rate": sr, "trajectory": traj}
(art / "r5_distill_convergence.json").write_text(json.dumps(out))

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = [r["step"] for r in traj]
    fig, ax = plt.subplots(1, 2, figsize=(11, 4))
    ax[0].plot(steps, [r["total"] for r in traj], label="total")
    ax[0].set_title("distill total loss")
    ax[0].set_xlabel("step")
    mel_keys = sorted(k for k in traj[0] if "mel" in k)
    for k in mel_keys[:4]:
        ax[1].plot(steps, [r[k] for r in traj], label=k.split("/", 1)[-1])
    ax[1].set_title("mel reconstruction losses")
    ax[1].set_xlabel("step")
    ax[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(art / "r5_distill_convergence.png", dpi=110)
except Exception as e:  # matplotlib is optional on minimal hosts
    print(f"plot skipped: {e!r}", flush=True)
print("DONE", flush=True)
