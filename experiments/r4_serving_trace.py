"""Round-4: trace the B=1 fast-path serving step and print the per-kernel
timeline (device lane) — drives the dispatch-gap work (round-3 VERDICT #7:
2.34 ms total, ~1.50 ms in 13 Pallas stage kernels, ~0.7 ms gaps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_serving_trace.py [variants...]
Variants: default | mono0 (stage-0 monolithic, wide_split='none') | ...
"""
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.config import get_config, upsample_hop
from hifigan_tpu.models import Generator, fold_weight_norm
from hifigan_tpu.models.fast_infer import make_fast_vocoder

h = get_config("v1")
frames = 256
key = jax.random.PRNGKey(0)
mel = jax.random.normal(key, (1, h["num_mels"], frames), jnp.float32) * 2.0 - 5.0
params = fold_weight_norm(Generator(h).init(key, mel)["params"])

variants = sys.argv[1:] or ["default"]
results = {}
for name in variants:
    # variant grammar: base[_tN] — base in {default, mono0}; tN sets
    # tile_blocks=N (bigger tiles = fewer grid steps AND less halo
    # overcompute: per-stage compute is n_tiles * (tile_b + 2*halo_b))
    kw = {}
    base = name
    if "_t" in name:
        base, tb = name.rsplit("_t", 1)
        if tb.isdigit():
            kw["tile_blocks"] = int(tb)
        else:
            base = name
    if base == "mono0":
        kw["wide_split"] = "none"
    elif base == "bin0":  # round-5: greedy-binned stage-0 split (3 -> 2 calls)
        kw["wide_split"] = "bin"
    fast = make_fast_vocoder(h, params, **kw)
    step = jax.jit(lambda m, acc: acc + fast(m).astype(jnp.float32).sum())
    acc = step(mel, jnp.zeros(()))
    float(acc)
    iters = 100
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(mel, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    rtf = frames * upsample_hop(h) / h["sampling_rate"] / dt
    results[name] = (dt * 1000, rtf)
    print(f"[{name}] {dt*1000:.3f} ms = {rtf:.0f}x RT", flush=True)

    trace_dir = f"/tmp/r4_serving_trace_{name}"
    with jax.profiler.trace(trace_dir):
        acc = jnp.zeros(())
        for _ in range(20):
            acc = step(mel, acc)
        float(acc)

    traces = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not traces:
        print("no chrome trace found", flush=True)
        continue
    evs = json.loads(gzip.open(traces[-1]).read()).get("traceEvents", [])
    # find the device lane (pid/tid with xla ops)
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    spans = []
    for e in evs:
        if e.get("ph") != "X":
            continue
        cat = str(e.get("args", {}).get("l", "")) + str(e.get("name", ""))
        nm = e.get("name", "")
        pidtid = (e.get("pid"), e.get("tid"))
        spans.append((pidtid, e.get("ts", 0), e.get("dur", 0), nm))
    # heaviest (pid,tid) lane by total duration that contains 'fusion' or pallas ops
    lane_tot = defaultdict(float)
    for pt, ts, dur, nm in spans:
        lane_tot[pt] += dur
    lanes = sorted(lane_tot.items(), key=lambda kv: -kv[1])[:4]
    for pt, tot in lanes:
        ops = [(ts, dur, nm) for p, ts, dur, nm in spans if p == pt]
        ops.sort()
        agg = defaultdict(lambda: [0.0, 0])
        for _, dur, nm in ops:
            agg[nm][0] += dur
            agg[nm][1] += 1
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:18]
        print(f"--- lane {pt} total {tot/1e3:.2f} ms over 20 iters ---", flush=True)
        for nm, (dur, c) in top:
            print(f"  {dur/20:9.1f} us/iter x{c//20:3d}  {nm[:90]}", flush=True)
print("DONE", results, flush=True)
