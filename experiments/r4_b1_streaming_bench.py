"""Round-4: B=1 serving variants + streaming chunk-size sweep (VERDICT #7).

Measures the fast-path vocoder at B=1 (default resblock-split stage-0 vs
monolithic wide_split='none') and streaming RTF at chunk sizes 32/64/128
frames (receptive-field halo windows, exact synthesis).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_b1_streaming_bench.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.config import get_config, upsample_hop
from hifigan_tpu.models import Generator, fold_weight_norm
from hifigan_tpu.models.fast_infer import make_fast_vocoder
from hifigan_tpu.parallel.halo import generator_halo_frames

h = get_config("v1")
hop = upsample_hop(h)
sr = h["sampling_rate"]
frames = 256
key = jax.random.PRNGKey(0)
mel = jax.random.normal(key, (1, h["num_mels"], frames), jnp.float32) * 2.0 - 5.0
params = fold_weight_norm(Generator(h).init(key, mel)["params"])

def timeit(step, arg, iters=100):
    acc = step(arg, jnp.zeros(()))
    float(acc)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(arg, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters

for name, kw in (("split(default)", {}), ("mono0", {"wide_split": "none"})):
    fast = make_fast_vocoder(h, params, **kw)
    step = jax.jit(lambda m, acc: acc + fast(m).astype(jnp.float32).sum())
    dt = timeit(step, mel)
    rtf = frames * hop / sr / dt
    print(f"[b1_{name}] {dt*1000:.3f} ms = {rtf:.0f}x RT", flush=True)

# ---- streaming: per-chunk latency at several chunk sizes ----
halo = generator_halo_frames(h)
fast = make_fast_vocoder(h, params)
for chunk in (32, 64, 128):
    window = chunk + 2 * halo
    melw = jax.random.normal(key, (1, h["num_mels"], window), jnp.float32) * 2.0 - 5.0
    step = jax.jit(lambda m, acc: acc + fast(m).astype(jnp.float32).sum())
    dt = timeit(step, melw)
    audio_s = chunk * hop / sr
    print(f"[stream_chunk{chunk}] window={window}f {dt*1000:.3f} ms per "
          f"{audio_s*1000:.0f} ms chunk = {audio_s/dt:.0f}x RT "
          f"(halo={halo}f)", flush=True)
print("DONE", flush=True)


# ---- stateful streamer (models/streaming.py): per-stage state, no halo
# recompute — measure per-chunk latency at the same chunk sizes ----
from hifigan_tpu.models.streaming import make_streaming_vocoder

for chunk in (32, 64):
    init_state, sstep, delay = make_streaming_vocoder(h, params)
    state = init_state(1)
    melc = jax.random.normal(key, (1, h["num_mels"], chunk), jnp.float32) * 2.0 - 5.0

    @jax.jit
    def one(state, m, acc):
        state, wav = sstep(state, m)
        return state, acc + wav.astype(jnp.float32).sum()

    state, acc = one(state, melc, jnp.zeros(()))
    float(acc)
    acc = jnp.zeros(())
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        state, acc = one(state, melc, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    audio_s = chunk * hop / sr
    print(f"[stream_state_chunk{chunk}] {dt*1000:.3f} ms per "
          f"{audio_s*1000:.0f} ms chunk = {audio_s/dt:.0f}x RT "
          f"(delay {delay} samples = {delay/sr*1000:.0f} ms)", flush=True)
print("DONE2", flush=True)
