"""Interval loss aggregation + TensorBoard scalar logging.

Parity with reference output_sum_callback.py / output_logging_callback.py /
logging_utils.py: nested loss dicts are summed per loop type over an
interval, then reset callbacks fire (logging, best-checkpointing); scalar
tags are depth-ranked (`train_losses_2/generator`).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

import jax

from hifigan_tpu.callbacks.base import Callback, TrainLoop


def rank(prefix: str) -> str:
    """Depth-ranked scalar tag (reference logging_utils.py:1-4)."""
    elements = prefix.split("/")
    elements[0] = f"{elements[0]}_{len(elements)}"
    return "/".join(elements)


class OutputSumResetCallback:
    def on_sum_reset(self, loop, batch_type, sums, amounts, global_step) -> None:
        raise NotImplementedError


class OutputSumCallback(Callback):
    """Accumulate nested loss dicts per loop type; fire resets on interval
    (reference output_sum_callback.py:10-83)."""

    def __init__(self, reset_intervals: dict[str, int],
                 reset_callbacks: list[OutputSumResetCallback] | None = None):
        self.reset_intervals = reset_intervals
        self.reset_callbacks = reset_callbacks or []
        self.loss_sums = {key: None for key in reset_intervals}
        self.loss_amounts = {key: 0 for key in reset_intervals}
        self.last_reset_steps = {key: -1 for key in reset_intervals}

    def _accumulate(self, batch_type: str, losses: Any) -> None:
        losses = jax.device_get(losses)
        if self.loss_sums[batch_type] is None:
            self.loss_sums[batch_type] = losses
        else:
            self.loss_sums[batch_type] = self._add(self.loss_sums[batch_type], losses)
        self.loss_amounts[batch_type] += 1

    def _add(self, a: Any, b: Any) -> Any:
        if isinstance(a, Mapping):
            return {k: self._add(a[k], b[k]) for k in a}
        if isinstance(a, (list, tuple)):
            return [self._add(x, y) for x, y in zip(a, b)]
        return a + float(b)

    def on_step_end(self, loop: TrainLoop, losses: Any) -> None:
        self._accumulate("train", losses)
        step = loop.global_step
        for batch_type, interval in self.reset_intervals.items():
            if (
                step % interval == 0
                and self.last_reset_steps[batch_type] != step
                and self.loss_sums[batch_type] is not None
            ):
                self.on_sum_reset(
                    loop, batch_type, self.loss_sums[batch_type],
                    self.loss_amounts[batch_type], step,
                )
                self.last_reset_steps[batch_type] = step
                self.loss_sums[batch_type] = None
                self.loss_amounts[batch_type] = 0

    def on_validation_batch_end(self, loop: TrainLoop, losses: Any, data: Any) -> None:
        if "validation" in self.loss_sums:
            self._accumulate("validation", losses)

    def on_validation_end(self, loop: TrainLoop) -> None:
        if self.loss_sums.get("validation") is not None:
            self.on_sum_reset(
                loop, "validation", self.loss_sums["validation"],
                self.loss_amounts["validation"], loop.global_step,
            )
            self.loss_sums["validation"] = None
            self.loss_amounts["validation"] = 0

    def on_sum_reset(self, loop, batch_type, sums, amounts, global_step) -> None:
        for cb in self.reset_callbacks:
            cb.on_sum_reset(loop, batch_type, sums, amounts, global_step)


class OutputLoggingCallback(OutputSumResetCallback):
    """Walk nested sums -> depth-ranked TB scalars (output_logging_callback.py)."""

    def on_sum_reset(self, loop, batch_type, sums, amounts, global_step) -> None:
        if loop.writer is None:
            return
        self._log(loop.writer, f"{batch_type}_losses", sums, amounts, global_step)

    def _log(self, writer, prefix, sums, amounts, step) -> None:
        if isinstance(sums, Mapping):
            for key, value in sums.items():
                self._log(writer, f"{prefix}/{key}", value, amounts, step)
        elif isinstance(sums, (list, tuple)):
            for i, value in enumerate(sums):
                self._log(writer, f"{prefix}/{i}", value, amounts, step)
        else:
            writer.add_scalar(rank(prefix), float(sums) / amounts, step)
