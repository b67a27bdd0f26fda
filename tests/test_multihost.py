"""REAL-process multi-host tests: two `jax.distributed.initialize` CPU
processes on localhost (2 local devices each -> 4 global) exercising

- `initialize_distributed` / `create_mesh` across processes,
- `MultilabelWaveDataset.batches(process_index=..., process_count=...)`
  per-host input sharding (disjoint coverage, the DistributedSampler
  replacement), and
- `shard_batch` (make_array_from_process_local_data) assembling a GLOBAL
  batch from per-host slices, verified by a jitted global reduction both
  hosts agree on.

This replaces mocked-host coverage with actual multi-process execution
(SURVEY §2.6 multi-host row). Real multi-host TPU hardware is not available
in this environment; the coordination service, gloo collectives, and global
array assembly are the same code path.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

SR = 16000

_CHILD = r"""
import json, sys
repo, pid, port, data, aug, cache = sys.argv[1:7]
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")

from hifigan_tpu.parallel.mesh import create_mesh, initialize_distributed, shard_batch

initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=int(pid)
)

from hifigan_tpu.data.multilabel import MultilabelWaveDataset

ds = MultilabelWaveDataset(
    data_dir=data, aug_dir=aug, cache_dir=cache, name="train", source="train",
    segment_length=2400, sampling_rate=16000, embedding_size=240,
    augmentation_config=None, disable_wavs=True, deterministic=True,
    num_workers=1,
)
mesh = create_mesh(model=1)

paths, global_sum = [], None
for b in ds.batches(2, shuffle=True, seed=7, drop_last=False,
                    process_index=jax.process_index(),
                    process_count=jax.process_count()):
    paths.extend(b["paths"])
    if global_sum is None:
        gb = shard_batch({"phones": b["time_labels"]["content"]["phones"]}, mesh)
        assert gb["phones"].shape[0] == 4  # GLOBAL batch: both hosts' rows
        total = jax.jit(lambda x: x.sum())(gb["phones"])
        global_sum = int(jax.device_get(total))

print("RESULT " + json.dumps({
    "process_index": jax.process_index(),
    "process_count": jax.process_count(),
    "num_global_devices": len(jax.devices()),
    "num_local_devices": len(jax.local_devices()),
    "paths": paths,
    "global_sum": global_sum,
}), flush=True)
"""


def _build_corpus(root: Path):
    from test_data_engine import _textgrid

    from hifigan_tpu.audio.io import save_wav

    data = root / "data" / "mini"
    (data / "wavs").mkdir(parents=True)
    (data / "tg").mkdir(parents=True)
    (data / "data_configs" / "train").mkdir(parents=True)
    dur = 2.0
    t = np.arange(int(SR * dur)) / SR
    for name, sex in [("spk1_a", "m"), ("spk2_b", "f"), ("spk1_c", "m"), ("spk2_d", "f")]:
        save_wav(str(data / "wavs" / f"{name}_{sex}.wav"),
                 (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), SR)
        _textgrid(data / "tg" / f"{name}_{sex}.TextGrid", dur,
                  words=[(0, 0.4, ""), (0.4, 1.5, "hello"), (1.5, 2.0, "")],
                  phones=[(0, 0.4, "sil"), (0.4, 0.9, "HH"), (0.9, 1.5, "EH"), (1.5, 2.0, "sil")])
    manifest = {
        "name": "mini",
        "result": "wavs",
        "config": [{
            "group-name": "wavs",
            "sources": [{"type": "glob", "glob": "**/wavs/*.wav", "label": "path"}],
            "group-labels": {"mic-brand": "blueyeti"},
            "enrichments": [
                {"type": "regex",
                 "patterns": {"path": r"(?P<name>(?P<speaker>spk\d)_\w+_(?P<sex>[mf]))\.wav$"}},
                {"type": "files",
                 "labels": {"wav": "**/wavs/{name}.wav", "textgrid": "**/tg/{name}.TextGrid"}},
                {"type": "select",
                 "labels": ["wav", "textgrid", "speaker", "sex", "mic-brand"]},
            ],
        }],
    }
    (data / "data_configs" / "train" / "mini.json").write_text(json.dumps(manifest))
    return str(root / "data"), str(root / "aug"), str(root / "cache")


def test_two_process_distributed_input_sharding(tmp_path):
    # hang-bound: each child is reaped via communicate(timeout=540) below
    data, aug, cache = _build_corpus(tmp_path)

    # parent warms every cache single-process (children share the cache dir;
    # warming first avoids concurrent pickle writes) and computes the
    # expected values the children must reproduce
    from hifigan_tpu.data.multilabel import MultilabelWaveDataset

    ds = MultilabelWaveDataset(
        data_dir=data, aug_dir=aug, cache_dir=cache, name="train", source="train",
        segment_length=2400, sampling_rate=SR, embedding_size=240,
        augmentation_config=None, disable_wavs=True, deterministic=True,
        num_workers=1,
    )
    for i in range(len(ds)):
        ds.create_pickle_label(i)
    expected_sum = sum(
        int(ds[p][2]["content"]["phones"].sum()) for p in range(len(ds))
    )
    all_paths = {ds[p][1] for p in range(len(ds))}

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    child_py = tmp_path / "child.py"
    child_py.write_text(_CHILD)
    repo = str(Path(__file__).resolve().parent.parent)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, str(child_py), repo, str(pid), str(port), data, aug, cache],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    results = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-3000:]
        results.append(json.loads(line[-1][len("RESULT "):]))

    by_pid = {r["process_index"]: r for r in results}
    assert set(by_pid) == {0, 1}
    for r in results:
        assert r["process_count"] == 2
        assert r["num_global_devices"] == 4
        assert r["num_local_devices"] == 2
        # the jitted global reduction over the assembled 4-row batch saw
        # BOTH hosts' data and matches the single-process ground truth
        assert r["global_sum"] == expected_sum

    # per-host input shards are disjoint and jointly cover the corpus
    paths0, paths1 = set(by_pid[0]["paths"]), set(by_pid[1]["paths"])
    assert paths0.isdisjoint(paths1)
    assert paths0 | paths1 == all_paths
