"""Round-3: fused all-in-one member kernels (member_impl='fused') vs the
interpreter, production scale. Isolated disc fwd / fwd+bwd + full step."""
import json
import sys
import time

import jax
import jax.numpy as jnp
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

impls = sys.argv[1:] or ["interpret", "fused"]
seg = config["loops"]["train"]["segment_length"]
sr = config["sampling_rate"]
full_step = "--step" in impls
impls = [i for i in impls if not i.startswith("--")]

for impl in impls:
    t0 = time.perf_counter()
    member_impl, _, stream_impl = impl.partition("+")
    models = DistillModels(config, labels, weights, sampling_rate=sr,
                           compute_dtype="bfloat16", member_impl=member_impl,
                           stream_impl=stream_impl or "auto")
    disc = models.discriminator
    dvars = disc.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, seg, 1)), mutable=["params", "spectral", "valves"])
    wav = jax.random.normal(jax.random.PRNGKey(1), (3, seg, 1), jnp.float32) * 0.1
    print(f"[{impl}] disc built {time.perf_counter()-t0:.0f}s", flush=True)

    def tree_sum(t):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t))

    def fwd(w, dvars=dvars, disc=disc):
        out = disc.apply(dvars, w, mutable=["spectral"])[0]
        return tree_sum(out)

    def bench(tag, fn, *args, iters=20):
        t0 = time.perf_counter()
        step = jax.jit(lambda acc, *a: acc + fn(*a))
        acc = step(jnp.zeros(()), *args)
        print(f"[{tag}] value {float(acc):.4f}", flush=True)
        c = time.perf_counter() - t0
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(acc, *args)
        float(acc)
        print(f"[{tag}] {(time.perf_counter()-t0)/iters*1000:.2f} ms (compile {c:.0f}s)", flush=True)

    bench(f"disc_fwd_{impl}", fwd, wav)
    gb = jax.grad(lambda w: fwd(w))
    bench(f"disc_fwd_bwd_{impl}", lambda w: tree_sum(gb(w)), wav)

    if full_step:
        trainer = DistillTrainer(models, config)
        state = trainer.create_state(jax.random.PRNGKey(0), seg)
        rng = np.random.default_rng(0)
        bsz = trainer.batch_size
        t_emb = seg // models.embedding_size
        batch = {
            "audio": rng.standard_normal((bsz, seg)).astype(np.float32) * 0.1,
            "time_labels": {
                g: {k: rng.integers(0, len(v), (bsz, t_emb)) for k, v in group.items()}
                for g, group in models.example_labels.items()
            },
        }
        step = trainer.make_train_step(donate=False)
        t0 = time.perf_counter()
        state, losses = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(losses)
        print(f"[{impl}] step compile+first {time.perf_counter()-t0:.0f}s "
              f"total={float(losses['total']):.3f}", flush=True)
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            state, losses = step(state, batch, jax.random.PRNGKey(2 + i))
        total = float(losses["total"])
        dt = (time.perf_counter() - t0) / iters
        audio_s = bsz * seg / sr
        print(f"[distill_step_{impl}] {dt*1000:.1f} ms ({audio_s/dt:.1f}x RT) total={total:.3f}",
              flush=True)
print("DONE", flush=True)
