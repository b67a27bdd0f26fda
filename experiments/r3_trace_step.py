"""Trace the full V1 GAN train step and print a per-op time breakdown.

Purpose: the measured components (G fwd+bwd 15.3 ms, MPD 6.9, MSD fused
34.4, mels 1.5) do not sum to the 79.9 ms step — find where the remaining
~20 ms of glue goes (loss terms, optimizer, weight-norm re-normalisation,
second MSD traversal for the G update, dispatch gaps).

Usage: python experiments/r3_trace_step.py [fused_stack|fused_zoned|xla]
Writes the xplane/trace to /tmp/r3_step_trace_dir and prints the top ops
by accumulated device time from the chrome trace JSON.
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

from hifigan_tpu.config import get_config
from hifigan_tpu.train.vocoder import create_train_state, make_train_step

impl = sys.argv[1] if len(sys.argv) > 1 else "fused_stack"
B, T = 16, 8192
h = dict(get_config("v1"))
h["gen_compute_dtype"] = "bfloat16"
h["disc_compute_dtype"] = "bfloat16"
h["msd_conv_impl"] = impl

state = create_train_state(h, jax.random.PRNGKey(0), segment_size=T)
step = make_train_step(h, donate=False)
batch = {"audio": jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32) * 0.1}

t0 = time.perf_counter()
state, m = step(state, batch)
jax.block_until_ready(m)
print(f"compile+first {time.perf_counter() - t0:.0f}s", flush=True)

iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, m = step(state, batch)
float(m["loss_gen_all"])
print(f"[step_{impl}] {(time.perf_counter() - t0) / iters * 1000:.2f} ms", flush=True)

trace_dir = "/tmp/r3_step_trace_dir"
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        state, m = step(state, batch)
    float(m["loss_gen_all"])
print("trace captured", flush=True)

# ---- analyse the chrome trace: accumulate device-lane op durations ----
traces = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
if not traces:
    print("NO TRACE FILES FOUND", flush=True)
    sys.exit(1)
with gzip.open(traces[-1], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
# device lanes: pid whose process_name mentions TPU/device; fall back to all X events
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
agg = defaultdict(float)
count = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    if dev_pids and e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # us -> ms
    agg[name] += dur
    count[name] += 1
    total += dur
print(f"lanes={sorted(pid_names.items())[:8]}")
print(f"total device op time {total:.2f} ms over 5 steps -> {total / 5:.2f} ms/step")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
    print(f"  {dur / 5:7.3f} ms/step  x{count[name] // 5:<4d} {name[:110]}")
print("DONE", flush=True)
