"""Round-3: 200-step distillation trainer stability smoke on hardware with
member_impl='auto' (now fused Pallas member kernels on single-device TPU).
Random audio/labels — checks loss trajectories stay finite and the in-step
NaN-skip never engages, not corpus convergence."""
import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.distill.model import DistillModels
from hifigan_tpu.distill.train import DistillTrainer

config = json.load(open("/root/repo/configs/distill.json"))
labels = {
    "content": {
        "speaker": list(range(40)),
        "sex": list(range(3)),
        "phones": list(range(72)),
        "sad": list(range(2)),
    },
    "style": {
        "mic-brand": list(range(5)),
        "noise": list(range(5)),
        "rir": list(range(3)),
        "lowpass": list(range(2)),
        "highpass": list(range(2)),
        "reverb": list(range(2)),
        "hilbert": list(range(2)),
        "codec": list(range(5)),
    },
}
uniform = lambda n: {"true": tuple([1.0 / n] * n), "false": tuple([1.0 - 1.0 / n] * n)}
weights = {g: {k: uniform(len(v)) for k, v in group.items()} for g, group in labels.items()}

seg = config["loops"]["train"]["segment_length"]
sr = config["sampling_rate"]
models = DistillModels(config, labels, weights, sampling_rate=sr,
                       compute_dtype="bfloat16")
trainer = DistillTrainer(models, config)
state = trainer.create_state(jax.random.PRNGKey(0), seg)
step = trainer.make_train_step(donate=False)
rng = np.random.default_rng(0)
bsz = trainer.batch_size
t_emb = seg // models.embedding_size


def make_batch():
    return {
        "audio": rng.standard_normal((bsz, seg)).astype(np.float32) * 0.1,
        "time_labels": {
            g: {k: rng.integers(0, len(v), (bsz, t_emb)) for k, v in group.items()}
            for g, group in models.example_labels.items()
        },
    }


t0 = time.perf_counter()
state, losses = step(state, make_batch(), jax.random.PRNGKey(1))
jax.block_until_ready(losses)
print(f"compile+first {time.perf_counter()-t0:.0f}s total={float(losses['total']):.3f}",
      flush=True)
t0 = time.perf_counter()
for i in range(1, 200):
    state, losses = step(state, make_batch(), jax.random.PRNGKey(1 + i))
    if i % 25 == 0:
        vals = {k: float(v) for k, v in losses.items() if getattr(v, "ndim", 1) == 0}
        assert all(np.isfinite(v) for v in vals.values()), vals
        print(f"step {i}: total={vals.get('total', float('nan')):.3f} "
              f"({(time.perf_counter()-t0)/i*1000:.1f} ms/step avg incl host datagen)",
              flush=True)
print("DONE", flush=True)
