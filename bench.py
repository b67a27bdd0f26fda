"""Headline benchmark: V1 generator mel->wav real-time factor on one chip.

Baseline (reference README.md:17-18, HiFi-GAN paper): 167.9x real-time on a
V100 at 22.05 kHz. North star (BASELINE.json): >=500x per TPU v5e chip.

Prints one JSON line per metric ({"metric", "value", "unit", "vs_baseline"});
the headline inference RTF is the LAST line (the driver parses the last
line). Also emitted: v1_train_step_ms, v1_b1_serving_rtf.

Method: folded-weight-norm V1 generator, bfloat16 compute (MXU path),
batch 128 x 256 mel frames (= 8.4 M samples = 380 s of audio per call).
Timing chains each call's output into an on-device accumulator and fetches
once at the end — block_until_ready alone under-reports through the axon
tunnel (async completion), so sequential data dependency forces real
execution. Measured on TPU v5e: ~1285x real-time at batch 32,
~2644x at batch 128 (throughput scales sub-linearly with batch; the
32-channel tail stages are MXU-utilisation-bound).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: verified working through the axon tunnel
# (V3 forward recompile 4.9 s -> 0.5 s on a warm cache)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.config import get_config, upsample_hop
from hifigan_tpu.models import Generator, fold_weight_norm

BASELINE_RTF = 167.9  # V100, reference README.md:17-18
R01_TRAIN_STEP_MS = 133.5  # round-1 measured step time (docs/OPERATIONS.md)


def bench_train() -> None:
    """Full V1 GAN train step (D+G update, in-step mels, BASELINE config #4)
    at batch 16 x 8192 samples; emits v1_train_step_ms with vs_baseline =
    speedup over the round-1 implementation's 133.5 ms."""
    h = get_config("v1")
    # bf16 conv compute in BOTH the discriminators and the generator
    # (params/losses stay f32): 133.5 -> 106.0 -> 99.4 ms measured on v5e
    h = type(h)(
        {**h, "disc_compute_dtype": "bfloat16", "gen_compute_dtype": "bfloat16"}
    )
    batch, seg = 16, 8192

    from hifigan_tpu.train.vocoder import create_train_state, make_train_step

    state = create_train_state(h, jax.random.PRNGKey(0), segment_size=seg)
    step = make_train_step(h)
    audio = jax.random.normal(jax.random.PRNGKey(1), (batch, seg), jnp.float32) * 0.1
    batch_d = {"audio": audio}

    # compile + REAL fetch: block_until_ready lies through the axon tunnel,
    # and the first fetch of a big-state executable settles a large one-time
    # pipeline cost that must stay out of the timed window
    for _ in range(3):
        state, metrics = step(state, batch_d)
    float(metrics["loss_gen_all"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        # state chains through the loop — the final fetch forces every step
        state, metrics = step(state, batch_d)
    float(metrics["loss_gen_all"])
    dt = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": "v1_train_step_ms",
                "value": round(dt * 1000, 1),
                "unit": "ms_b16x8192",
                "vs_baseline": round(R01_TRAIN_STEP_MS / (dt * 1000), 2),
            }
        )
    )


def bench_b1_serving() -> None:
    """Single-stream (B=1) serving latency on the fast path (polyphase
    upsamplers + fused-Pallas MRF tail + folded conv_post); emits
    v1_b1_serving_rtf with vs_baseline vs the paper's 167.9x (which was
    itself measured single-stream on a V100)."""
    from hifigan_tpu.models.fast_infer import make_fast_vocoder

    h = get_config("v1")
    frames = 256
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (1, h["num_mels"], frames), jnp.float32) * 2.0 - 5.0
    params = Generator(h).init(key, mel)["params"]
    fast = make_fast_vocoder(h, fold_weight_norm(params))
    step = jax.jit(lambda m, acc: acc + fast(m).astype(jnp.float32).sum())

    acc = step(mel, jnp.zeros(()))
    float(acc)  # compile + warm

    iters = 50
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(mel, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / iters

    hop = upsample_hop(h)
    rtf = frames * hop / h["sampling_rate"] / dt
    print(
        json.dumps(
            {
                "metric": "v1_b1_serving_rtf",
                "value": round(rtf, 1),
                "unit": "x_realtime_22k05",
                "vs_baseline": round(rtf / BASELINE_RTF, 2),
            }
        )
    )


def main() -> None:
    h = get_config("v1")
    batch, frames = 128, 256
    sr = h["sampling_rate"]

    gen = Generator(h, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (batch, h["num_mels"], frames), jnp.float32) * 2.0 - 5.0
    params = gen.init(key, mel)["params"]
    folded_params = fold_weight_norm(params)
    gen_folded = Generator(h, folded=True, dtype=jnp.bfloat16)

    # Chained accumulator: each call depends on the previous one, so a single
    # host fetch at the end forces every call to have executed.
    step = jax.jit(
        lambda p, m, acc: acc + gen_folded.apply({"params": p}, m).astype(jnp.float32).sum()
    )

    acc = jnp.zeros(())
    acc = step(folded_params, mel, acc)
    float(acc)  # compile + warm

    iters = 20
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(folded_params, mel, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / iters

    hop = upsample_hop(h)
    total_samples = batch * frames * hop
    audio_seconds = total_samples / sr
    rtf = audio_seconds / dt

    print(
        json.dumps(
            {
                "metric": "v1_mel_to_wav_rtf_per_chip",
                "value": round(rtf, 1),
                "unit": "x_realtime_22k05",
                "vs_baseline": round(rtf / BASELINE_RTF, 2),
            }
        )
    )


if __name__ == "__main__":
    bench_train()
    bench_b1_serving()
    main()  # headline inference RTF stays the LAST line for the driver parser
