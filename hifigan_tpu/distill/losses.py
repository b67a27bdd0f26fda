"""Distillation loss system (reference speech_distillation/custom_losses.py).

- recursive_loss: fold a leaf loss over parallel nested structures (:8).
- loss registry '-'/'+'/'seg_bce'/'seg_bias_bce'/'l2'/'l1'/'cos' (:119-127).
- SegBCE family: per-class one-hot BCE with inverse-class-frequency weights
  and +1-smoothed per-class normalisation (:78-116); SegBiasBCE normalises
  the prediction between the sniffer's bias estimate and the truth — the
  "hunt the bias" loss (:48-64).

Layout note: classifier probabilities here are channels-last (B, T, C);
the reference's `dim=1` transposes (:30,:41) are therefore no-ops — the
class axis is already last. Targets are int label maps (B, T).
"""

from __future__ import annotations

from collections.abc import Mapping

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-08


def recursive_loss(loss_func, x, *args):
    if isinstance(x, Mapping):
        return sum(recursive_loss(loss_func, x[k], *[a[k] for a in args]) for k in x.keys())
    if isinstance(x, (list, tuple)):
        return sum(recursive_loss(loss_func, x[i], *[a[i] for a in args]) for i in range(len(x)))
    return loss_func(x, *args)


# ---------------------------------------------------------------------------
# simple leaves
# ---------------------------------------------------------------------------


def minus_mean_loss(*x):
    return +sum(jnp.mean(_x) for _x in x)


def plus_mean_loss(*x):
    return -sum(jnp.mean(_x) for _x in x)


def l1_loss(x, target):
    return jnp.mean(jnp.abs(x - target))


def l2_loss(x, target):
    return jnp.mean(jnp.square(x - target))


def cosine_loss(x, target):
    """torch CosineEmbeddingLoss with target=1: mean(1 - cos_sim) over the
    batch, flattening all non-batch dims (ref custom_losses.py:92-100)."""
    fx = x.reshape(x.shape[0], -1)
    ft = target.reshape(target.shape[0], -1)
    cos = jnp.sum(fx * ft, axis=1) / (
        jnp.linalg.norm(fx, axis=1) * jnp.linalg.norm(ft, axis=1) + EPSILON
    )
    return jnp.mean(1.0 - cos)


# ---------------------------------------------------------------------------
# segmentation BCE family
# ---------------------------------------------------------------------------


def ratios_to_weights(ratios) -> jnp.ndarray:
    """Inverse-frequency class weights; zero ratios clamped to the smallest
    non-zero ratio (ref custom_losses.py:70-75)."""
    ratios = np.asarray(ratios, dtype=np.float64)
    nonzero = ratios[ratios != 0]
    smallest = nonzero.min() if nonzero.size else EPSILON
    ratios = np.where(ratios == 0, smallest, ratios)
    return jnp.asarray((ratios**-1.0).astype(np.float32))


def _binary_cross_entropy(p, target):
    # NB: 1.0 - 1e-8 rounds to 1.0 in float32, so clamp each log argument
    # separately (torch's BCE clamps log outputs at -100 similarly).
    p = jnp.clip(p, 0.0, 1.0)
    log_p = jnp.log(jnp.maximum(p, 1e-12))
    log_1p = jnp.log(jnp.maximum(1.0 - p, 1e-12))
    return -(target * log_p + (1.0 - target) * log_1p)


def normalize_segmentation_loss(loss, target, true_weights, false_weights):
    """Per-class true/false means (+1-smoothed), inverse-frequency weighted
    (ref custom_losses.py:103-116). loss/target: (B, T, C); weights: (C,)."""
    sum_dims = tuple(i for i in range(loss.ndim) if i not in (0, loss.ndim - 1))
    true_target = target
    false_target = 1.0 - target
    true_per_class = (true_target * loss).sum(axis=sum_dims) / (true_target.sum(axis=sum_dims) + 1)
    false_per_class = (false_target * loss).sum(axis=sum_dims) / (false_target.sum(axis=sum_dims) + 1)
    return (true_per_class * true_weights).mean() + (false_per_class * false_weights).mean()


def seg_bce_loss(x, target, ratios=None):
    """x: (B, T, C) probabilities; target: (B, T) int labels;
    ratios: {'true': (C,), 'false': (C,)} class frequencies."""
    num_classes = x.shape[-1]
    one_hot = jax.nn.one_hot(target, num_classes)
    ce = _binary_cross_entropy(x, one_hot)
    return normalize_segmentation_loss(
        ce, one_hot, ratios_to_weights(ratios["true"]), ratios_to_weights(ratios["false"])
    )


def seg_bias_bce_loss(x, target, truth, ratios=None):
    """Hunt-the-bias loss: x (hunter probs), target (sniffer bias probs),
    truth (B, T) int labels (ref custom_losses.py:36-64)."""
    num_classes = x.shape[-1]
    one_hot_truth = jax.nn.one_hot(truth, num_classes)
    high = jnp.maximum(one_hot_truth, target)
    low = jnp.minimum(one_hot_truth, target)
    scale = high - low + EPSILON
    x_norm = jnp.clip((x - low) / scale, 0.0, 1.0)
    biased_ce = _binary_cross_entropy(x_norm, 1.0 - one_hot_truth) * (scale * scale)
    return normalize_segmentation_loss(
        biased_ce,
        target,
        ratios_to_weights(ratios["true"]),
        ratios_to_weights(ratios["false"]),
    )


loss_types = {
    "-": minus_mean_loss,
    "+": plus_mean_loss,
    "seg_bce": seg_bce_loss,
    "seg_bias_bce": seg_bias_bce_loss,
    "l2": l2_loss,
    "l1": l1_loss,
    "cos": cosine_loss,
}


def get_loss_by_type(loss_type: str):
    return loss_types[loss_type]


def get_losses_by_types(loss_type):
    if isinstance(loss_type, Mapping):
        return {k: get_losses_by_types(t) for k, t in loss_type.items()}
    return get_loss_by_type(loss_type)
