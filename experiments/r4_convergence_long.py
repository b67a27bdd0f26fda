"""Round-4: LONG (20k-step) V1 GAN convergence run on hardware — the
training-quality evidence against the reference's published curve
(/root/reference/validation_loss.png: mel-L1 converging to ~0.10-0.15 on
LJSpeech; referenced at README.md:41-42).

LJSpeech is not available in this environment, so the corpus is a RICHER
speech-like synthetic (vs the round-3 static harmonics): a finite multi-
speaker corpus of segments with per-speaker base pitch + formant envelopes,
time-varying f0 contours, syllable-rate amplitude modulation, unvoiced
fricative bursts and silences — the spectro-temporal structure a vocoder
must actually learn (harmonics moving under formants). The corpus is
PREGENERATED (finite, epochs like a real dataset) so host datagen stays off
the step's critical path.

Writes the mel-L1/loss trajectory to experiments/artifacts/
r4_convergence_20k.json and a PNG plot next to it (committed artifacts —
BASELINE config #5 evidence).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_convergence_long.py [steps]
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.config import get_config
from hifigan_tpu.train.vocoder import create_train_state, make_train_step

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
B, T = 16, 8192
SR = 22050
CORPUS = 512  # segments; ~3.2 min of audio, cycled in epochs

h = dict(get_config("v1"))
h["gen_compute_dtype"] = "bfloat16"
h["disc_compute_dtype"] = "bfloat16"

rng = np.random.default_rng(0)

# ---- speaker profiles: base f0 + 3 formant resonances -------------------
N_SPK = 12
speakers = [
    {
        "f0": rng.uniform(85.0, 280.0),
        "formants": rng.uniform([300, 900, 1900], [900, 2400, 3400]),
        "fbw": rng.uniform(60.0, 160.0, 3),
    }
    for _ in range(N_SPK)
]


def synth_segment():
    """One speech-like segment: voiced harmonic runs with moving f0 under a
    formant envelope, syllable AM, interleaved fricative noise + silence."""
    spk = speakers[rng.integers(N_SPK)]
    t = np.arange(T) / SR
    # f0 contour: slow random walk (declination + accents)
    n_ctl = 8
    ctl = spk["f0"] * (1.0 + rng.uniform(-0.25, 0.25, n_ctl))
    f0 = np.interp(np.linspace(0, 1, T), np.linspace(0, 1, n_ctl), ctl)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = np.zeros(T, np.float32)
    n_h = 24
    for k in range(1, n_h + 1):
        fk = f0 * k
        # formant envelope: sum of resonance gains at the harmonic frequency
        gain = np.zeros(T)
        for fc, bw in zip(spk["formants"], spk["fbw"]):
            gain += 1.0 / (1.0 + ((fk - fc) / (bw * 2.5)) ** 2)
        gain *= 1.0 / k  # glottal rolloff
        gain[fk > SR / 2 * 0.95] = 0.0
        wav += (gain * np.sin(k * phase)).astype(np.float32)
    # syllable-rate AM (~2.5-5 Hz), with hard unvoiced/silence spans
    am = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t + rng.uniform(0, 6.28))
    wav *= am.astype(np.float32)
    # fricative burst: band-passed noise over a random span
    if rng.random() < 0.7:
        a = rng.integers(0, T - T // 8)
        span = slice(a, a + rng.integers(T // 16, T // 8))
        noise = rng.standard_normal(span.stop - span.start).astype(np.float32)
        noise = np.diff(noise, prepend=0.0)  # high-pass-ish
        wav[span] = wav[span] * 0.2 + 0.15 * noise
    if rng.random() < 0.5:
        a = rng.integers(0, T - T // 10)
        wav[a : a + rng.integers(T // 32, T // 10)] = 0.0
    peak = np.max(np.abs(wav)) + 1e-6
    return (wav / peak * rng.uniform(0.5, 0.95)).astype(np.float32)


print(f"generating corpus ({CORPUS} segments)...", flush=True)
t0 = time.perf_counter()
corpus = np.stack([synth_segment() for _ in range(CORPUS)])
print(f"corpus done in {time.perf_counter() - t0:.0f}s", flush=True)

state = create_train_state(h, jax.random.PRNGKey(0), segment_size=T)
step = make_train_step(h, donate=False)

order = rng.permutation(CORPUS)
pos = 0


def next_batch():
    global order, pos
    if pos + B > CORPUS:
        order = rng.permutation(CORPUS)
        pos = 0
    idx = order[pos : pos + B]
    pos += B
    return {"audio": jnp.asarray(corpus[idx])}


t0 = time.perf_counter()
state, m = step(state, next_batch())
jax.block_until_ready(m)
print(f"compile+first {time.perf_counter() - t0:.0f}s", flush=True)

traj = []
t0 = time.perf_counter()
for i in range(1, STEPS + 1):
    state, m = step(state, next_batch())
    if i % 100 == 0:
        rec = {
            "step": i,
            "mel": round(float(m["mel_error"]), 4),
            "gen": round(float(m["loss_gen_all"]), 3),
            "disc": round(float(m["loss_disc_all"]), 3),
        }
        traj.append(rec)
        if i % 1000 == 0 or i == 100:
            print(
                f"step {i}: mel={rec['mel']:.3f} gen={rec['gen']:.2f} "
                f"disc={rec['disc']:.2f} "
                f"({(time.perf_counter() - t0) / i * 1000:.1f} ms/step avg)",
                flush=True,
            )

art = Path(__file__).parent / "artifacts"
art.mkdir(exist_ok=True)
out = {
    "config": "v1 bf16 G+D, fused-zoned MSD (auto), B16xT8192, speech-like corpus",
    "steps": STEPS,
    "ms_per_step_avg": round((time.perf_counter() - t0) / STEPS * 1000, 2),
    "trajectory": traj,
}
(art / "r4_convergence_20k.json").write_text(json.dumps(out, indent=1))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(7, 4))
xs = [r["step"] for r in traj]
ax.plot(xs, [r["mel"] for r in traj], label="mel L1 (train)", lw=1.2)
ax.set_xlabel("step")
ax.set_ylabel("mel-spectrogram L1")
ax.set_title("V1 GAN training, 20k steps on TPU v5e (speech-like corpus)")
ax.legend()
ax.grid(alpha=0.3)
fig.tight_layout()
fig.savefig(art / "r4_convergence_20k.png", dpi=120)
print("DONE", flush=True)
