"""Batch mixing ops (reference speech_distillation/tensor_utils.py).

expand: tile the batch axis (with a final partial copy) up to ``size``.
mix:    split the batch axis into segments of the given sizes and roll
        segment i by +i — the batch-mixing permutation.
unmix:  inverse (roll by -i).
cut_and_roll: roll the tail (from ``cut``) of an axis by one batch position
        (lightning_model.py:276-282).

All static-shape jnp ops (sizes come from host-side calculate_cycles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand(tensor: jax.Array, size: int, dim: int = 0) -> jax.Array:
    n = tensor.shape[dim]
    reps = size // n
    rem = size - reps * n
    parts = [tensor] * reps
    if rem:
        parts.append(jax.lax.slice_in_dim(tensor, 0, rem, axis=dim))
    return jnp.concatenate(parts, axis=dim) if len(parts) > 1 else parts[0]


def _split_sizes(tensor: jax.Array, rolls, dim: int):
    idx = []
    acc = 0
    for r in rolls[:-1]:
        acc += r
        idx.append(acc)
    return jnp.split(tensor, idx, axis=dim)


def mix(tensor: jax.Array, rolls, dim: int = 0) -> jax.Array:
    parts = _split_sizes(tensor, rolls, dim)
    rolled = [jnp.roll(p, i, axis=dim) for i, p in enumerate(parts)]
    return jnp.concatenate(rolled, axis=dim)


def unmix(tensor: jax.Array, rolls, dim: int = 0) -> jax.Array:
    parts = _split_sizes(tensor, rolls, dim)
    rolled = [jnp.roll(p, -i, axis=dim) for i, p in enumerate(parts)]
    return jnp.concatenate(rolled, axis=dim)


def cut_and_roll(tensor: jax.Array, cut: int, cut_dim: int, roll_dim: int) -> jax.Array:
    length = tensor.shape[cut_dim]
    head = jax.lax.slice_in_dim(tensor, 0, cut, axis=cut_dim)
    tail = jax.lax.slice_in_dim(tensor, cut, length, axis=cut_dim)
    tail = jnp.roll(tail, 1, axis=roll_dim)
    return jnp.concatenate([head, tail], axis=cut_dim)
