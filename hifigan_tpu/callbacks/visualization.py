"""Validation observability callbacks.

Parity with reference confusion_logging_callback.py /
validation_classification_callback.py / validation_visualization_callback.py
/ gan_models_graph_visualization_callback.py:

- per-label confusion matrices with per-class recall scalars + figures,
- validation audio (add_audio) / mel (plot_spectrogram) / categorical label
  plots, parameter histograms,
- a one-shot model "graph" dump (flax tabulate replaces torch graph export
  — the functional analogue of torchsummary/add_graph).
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np

from hifigan_tpu.callbacks.base import Callback, TrainLoop
from hifigan_tpu.callbacks.logging import rank
from hifigan_tpu.utils.plotting import plot_categorical, plot_matrix, plot_spectrogram


class ConfusionLoggingCallback:
    """Log a confusion matrix: figure + per-class recall scalars
    (reference confusion_logging_callback.py:10-59)."""

    def log_confusion(self, writer, prefix, matrix: np.ndarray, class_names, step) -> None:
        if writer is None:
            return
        with np.errstate(invalid="ignore", divide="ignore"):
            recalls = np.diag(matrix) / matrix.sum(axis=1)
        for name, recall in zip(class_names, recalls):
            if np.isfinite(recall):
                writer.add_scalar(rank(f"{prefix}/recall/{name}"), float(recall), step)
        norm = matrix / np.maximum(matrix.sum(axis=1, keepdims=True), 1)
        writer.add_figure(rank(f"{prefix}/confusion"), plot_matrix(norm), step)


class ValidationClassificationCallback(Callback, ConfusionLoggingCallback):
    """Accumulate confusion matrices over validation batches from the
    transform_data 'label' dict ({'truth','keep','sniff','hunt'} trees,
    reference validation_classification_callback.py) and flush at the end."""

    def __init__(self, label_options_groups: dict, interval: int = 1):
        self.label_options_groups = label_options_groups
        self.interval = interval
        self._matrices: dict = {}

    def _accumulate(self, kind: str, group: str, label: str, truth, pred) -> None:
        options = self.label_options_groups[group][label]
        n = len(options)
        key = (kind, group, label)
        mat = self._matrices.setdefault(key, np.zeros((n, n), np.int64))
        truth = np.asarray(truth).reshape(-1)
        pred = np.asarray(pred)
        if pred.ndim > truth.ndim:  # probabilities -> argmax class
            pred = pred.argmax(-1)
        pred = pred.reshape(-1)
        np.add.at(mat, (truth, pred), 1)

    def on_validation_batch_end(self, loop: TrainLoop, losses, data) -> None:
        if not isinstance(data, Mapping) or "label" not in data:
            return
        labels = data["label"]
        truth = labels.get("truth")
        if truth is None:
            return
        for kind in ("keep", "sniff", "hunt"):
            preds = labels.get(kind)
            if preds is None:
                continue
            for group, group_truth in truth.items():
                for label, label_truth in group_truth.items():
                    if group in preds and label in preds[group]:
                        self._accumulate(kind, group, label, label_truth, preds[group][label])

    def on_validation_end(self, loop: TrainLoop) -> None:
        for (kind, group, label), mat in self._matrices.items():
            self.log_confusion(
                loop.writer,
                f"validation_classification/{kind}/{group}/{label}",
                mat,
                self.label_options_groups[group][label],
                loop.global_step,
            )
        self._matrices = {}


class ValidationVisualizationCallback(Callback):
    """Audio/mel/label visualisations on validation
    (reference validation_visualization_callback.py:18-40,216-234)."""

    def __init__(self, sampling_rate: int, amount_to_log: int = 1):
        self.sampling_rate = sampling_rate
        self.amount_to_log = amount_to_log
        self._logged = 0

    def on_validation_batch_end(self, loop: TrainLoop, losses, data) -> None:
        if loop.writer is None or self._logged >= self.amount_to_log:
            return
        if not isinstance(data, Mapping):
            return
        step = loop.global_step
        i = self._logged
        wavs = data.get("wav", {})
        for name, wav in wavs.items():
            wav = np.asarray(wav)
            mono = wav[0].reshape(-1)
            loop.writer.add_audio(
                rank(f"validation_wavs/{i}/{name}"), mono[:, None], step, self.sampling_rate
            )
        mels = data.get("mel", {})
        for name, mel_val in mels.items():
            mel_val = np.asarray(mel_val)
            loop.writer.add_figure(
                rank(f"validation_mels/{i}/{name}"), plot_spectrogram(mel_val[0]), step
            )
        labels = data.get("label", {})
        for name, group_tree in labels.items():
            rows = []
            for group, label_tree in sorted(group_tree.items()):
                for label, values in sorted(label_tree.items()):
                    values = np.asarray(values)
                    if values.ndim > 2:
                        values = values.argmax(-1)
                    rows.append(values[0].reshape(-1))
            if rows:
                width = max(len(r) for r in rows)
                mat = np.stack([np.pad(r, (0, width - len(r))) for r in rows])
                loop.writer.add_figure(
                    rank(f"validation_labels/{i}/{name}"), plot_categorical(mat), step
                )
        self._logged += 1

    def on_validation_end(self, loop: TrainLoop) -> None:
        self._logged = 0
        # parameter histograms (ref validation_visualization_callback.py:42-150)
        if loop.writer is not None and hasattr(loop.state, "variables"):
            import jax

            for path, leaf in jax.tree_util.tree_leaves_with_path(loop.state.variables):
                keys = "/".join(str(getattr(p, "key", p)) for p in path)
                if "params" in keys:
                    loop.writer.add_histogram(
                        f"params/{keys}", np.asarray(leaf).reshape(-1), loop.global_step
                    )
                    break  # one representative histogram per flush (cost control)


class ModelGraphVisualizationCallback(Callback):
    """One-shot model structure dump (reference
    gan_models_graph_visualization_callback.py logs torch graphs; the
    functional analogue is a flax tabulate text summary)."""

    def __init__(self, summaries: dict[str, str]):
        self.summaries = summaries  # {model_name: tabulate text}

    def on_init_end(self, loop: TrainLoop) -> None:
        if loop.writer is None or loop.global_step > 0:
            return
        for name, text in self.summaries.items():
            loop.writer.add_text(f"model_graph/{name}", f"```\n{text}\n```", 0)
