"""Debugging / profiling / failure-detection utilities.

TPU-native equivalents of the reference's aux subsystems (SURVEY §5):

- `set_debug_apis` (reference lightning_model.py:959-962: torch profiler /
  NVTX / anomaly detection): here jax_debug_nans / jax_debug_infs toggles.
- `profile_trace`: context manager around jax.profiler (TensorBoard profile
  plugin replaces nsight/NVTX ranges).
- `compile_report`: ahead-of-time lower/compile cost analysis — the
  functional replacement for torchsummary's construction-time dry runs
  (flops/bytes per executable before running it).
- `finite_or_skip`: NaN/Inf gradient detection with step-skip (reference
  manual_optimization_callback.py:28-37) as a reusable transform.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import jax.numpy as jnp


def set_debug_apis(state: bool = False) -> None:
    jax.config.update("jax_debug_nans", state)
    jax.config.update("jax_debug_infs", state)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compile_report(fn: Callable, *args: Any, **kwargs: Any) -> dict:
    """AOT compile and report cost analysis for a jitted function."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):  # some backends return a list per computation
        cost = cost[0] if cost else {}
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_analysis": str(compiled.memory_analysis()),
    }


def finite_or_skip(updates: Any, fallback: Any) -> tuple[Any, jax.Array]:
    """Zero out updates if any leaf is non-finite; returns (updates, ok)."""
    leaves = jax.tree_util.tree_leaves(updates)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.isfinite(leaf).all()
    safe = jax.tree_util.tree_map(
        lambda u, f: jnp.where(ok, u, f), updates, fallback
    )
    return safe, ok
