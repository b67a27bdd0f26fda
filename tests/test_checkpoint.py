"""Checkpoint I/O: roundtrip, scan, async, torch-converter integration."""

import os

import numpy as np
import jax

from hifigan_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    scan_checkpoint,
    wait_for_checkpoints,
)


def test_roundtrip_and_scan(tmp_path):
    obj = {"generator": {"conv": {"v": np.ones((3, 2)), "g": np.full((2,), 2.0)}},
           "steps": 1500}
    for step in (1000, 1500):
        save_checkpoint(os.path.join(tmp_path, f"g_{step:08d}"), obj)
    latest = scan_checkpoint(str(tmp_path), "g_")
    assert latest.endswith("g_00001500")
    restored = load_checkpoint(latest)
    np.testing.assert_array_equal(restored["generator"]["conv"]["v"], obj["generator"]["conv"]["v"])
    assert restored["steps"] == 1500
    assert scan_checkpoint(str(tmp_path), "do_") is None


def test_async_save(tmp_path):
    obj = {"x": np.arange(10.0)}
    path = os.path.join(tmp_path, "g_00000001")
    save_checkpoint(path, obj, async_=True)
    wait_for_checkpoints()
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["x"], obj["x"])


def test_compile_report():
    from hifigan_tpu.utils.debug import compile_report

    import jax.numpy as jnp

    rep = compile_report(lambda x: (x @ x).sum(), jnp.ones((64, 64)))
    assert rep["flops"] is None or rep["flops"] > 0
