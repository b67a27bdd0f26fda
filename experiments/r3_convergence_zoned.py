"""Round-3: 2000-step V1 GAN convergence smoke on hardware with the new
defaults (bf16 G+D, msd_conv_impl auto -> fused_zoned with zone_min_groups=8).
Randomized harmonic corpus like the round-2 long run; prints the mel-L1
trajectory so the dynamics can be compared against the earlier 3.0 -> ~1.3-1.5
run (docs/OPERATIONS.md)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.config import get_config
from hifigan_tpu.train.vocoder import create_train_state, make_train_step

B, T = 16, 8192
SR = 22050
h = dict(get_config("v1"))
h["gen_compute_dtype"] = "bfloat16"
h["disc_compute_dtype"] = "bfloat16"

state = create_train_state(h, jax.random.PRNGKey(0), segment_size=T)
step = make_train_step(h, donate=False)

rng = np.random.default_rng(0)


def make_batch():
    """Multi-speaker-like randomized harmonics (same family as the round-2
    long run): random f0 per element, random per-harmonic amplitudes."""
    t = np.arange(T) / SR
    wavs = np.zeros((B, T), np.float32)
    for b in range(B):
        f0 = rng.uniform(80.0, 320.0)
        n_h = rng.integers(3, 12)
        amps = rng.uniform(0.05, 1.0, n_h)
        amps /= amps.sum() * 2.0
        ph = rng.uniform(0, 2 * np.pi, n_h)
        for k in range(n_h):
            wavs[b] += amps[k] * np.sin(2 * np.pi * f0 * (k + 1) * t + ph[k])
    return {"audio": jnp.asarray(wavs)}


t0 = time.perf_counter()
state, m = step(state, make_batch())
jax.block_until_ready(m)
print(f"compile+first {time.perf_counter() - t0:.0f}s", flush=True)

t0 = time.perf_counter()
for i in range(1, 2000):
    state, m = step(state, make_batch())
    if i % 100 == 0:
        print(
            f"step {i}: mel={float(m['mel_error']):.3f} "
            f"gen={float(m['loss_gen_all']):.3f} "
            f"disc={float(m['loss_disc_all']):.3f} "
            f"({(time.perf_counter() - t0) / i * 1000:.1f} ms/step avg incl host datagen)",
            flush=True,
        )
print("DONE", flush=True)
