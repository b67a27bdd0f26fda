"""Valve-decay schedule callback.

Parity with reference valve_decay_callback.py: valve/anti-valve ratio pairs
follow exponential schedules gated by (start, limit) step windows. The
reference mutates ValveBlock.ratio attributes found by module tag; here the
ratios live in the 'valves' variable collections of the train state, with
the valve tags embedded in the leaf path (see dsl/module.py), so an update
is a functional pytree edit.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from hifigan_tpu.callbacks.base import Callback, TrainLoop
from hifigan_tpu.callbacks.logging import rank


class ValveDecayCallback(Callback):
    def __init__(self, valves_config: dict, valves_steps: int, initial_value: float = 1.0):
        self.valves_config = valves_config
        self.valves_steps = valves_steps
        self.initial_value = initial_value

    def _get_ratio(self, global_step: int, valve_tag: str) -> float:
        cfg = self.valves_config[valve_tag]
        if cfg["limit"] < global_step:
            return 0.0
        if cfg["start"] > global_step:
            return 1.0
        return math.pow(cfg["decay"], global_step - cfg["start"])

    def _get_anti_ratio(self, global_step: int, valve_tag: str) -> float:
        cfg = self.valves_config[valve_tag]
        if cfg["limit"] < global_step:
            return 0.0
        if cfg["start"] > global_step:
            return 1.0
        return 1.0 - math.pow(cfg["anti_decay"], global_step - cfg["start"])

    def update_valves(self, variables: Any, global_step: int, writer=None) -> Any:
        """Set every tagged valve ratio leaf across the variables tree."""
        ratios = {}
        for tag, cfg in self.valves_config.items():
            ratios[tag] = self._get_ratio(global_step, tag) * self.initial_value
            ratios[cfg["anti"]] = self._get_anti_ratio(global_step, tag) * self.initial_value
            if writer is not None:
                writer.add_scalar(rank(f"params/valves/{tag}"), ratios[tag], global_step)
                writer.add_scalar(
                    rank(f"params/valves/{cfg['anti']}"), ratios[cfg["anti"]], global_step
                )

        def rewrite(path, leaf):
            keys = [getattr(p, "key", str(p)) for p in path]
            joined = "/".join(str(k) for k in keys)
            if "valves" in keys:
                for tag, value in ratios.items():
                    if f"__{tag}" in joined or f"+{tag}" in joined:
                        # preserve the leaf's shape: vmapped ensembles may
                        # stack valve ratios to (n,), and replacing with a
                        # 0-d scalar would break the next vmapped unstack
                        return jnp.full(leaf.shape, value, leaf.dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(rewrite, variables)

    def on_init_end(self, loop: TrainLoop) -> None:
        self._apply(loop)

    def on_step_end(self, loop: TrainLoop, losses) -> None:
        if loop.global_step % self.valves_steps == 0:
            self._apply(loop)

    def _apply(self, loop: TrainLoop) -> None:
        state = loop.state
        new_vars = self.update_valves(state.variables, loop.global_step, loop.writer)
        loop.state = state.replace(variables=new_vars)
