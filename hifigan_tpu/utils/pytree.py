"""Nested-structure utilities.

Capability parity with reference speech_distillation/recursive_utils.py —
the reference's universal "tree-map over parallel nested dict/list/tuple
structures". In JAX these are mostly `jax.tree_util` calls, but the
reference semantics (structure driven by the FIRST argument, extra args
indexed in parallel) are kept for drop-in use by the distill trainer.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Callable

import jax


def get_recursive(func: Callable, *data: Any, args: tuple = (), kwargs: dict | None = None, **kwdata: Any) -> Any:
    """Apply ``func`` over parallel nested structures (ref recursive_utils.py:1)."""
    kwargs = kwargs or {}
    example = data[0] if data else next(iter(kwdata.values()))
    if isinstance(example, Mapping):
        return {
            key: get_recursive(
                func,
                *(d[key] for d in data),
                args=args,
                kwargs=kwargs,
                **{n: v[key] for n, v in kwdata.items()},
            )
            for key in example
        }
    if isinstance(example, (list, tuple)):
        seq = [
            get_recursive(
                func,
                *(d[i] for d in data),
                args=args,
                kwargs=kwargs,
                **{n: v[i] for n, v in kwdata.items()},
            )
            for i in range(len(example))
        ]
        return tuple(seq) if isinstance(example, tuple) else seq
    return func(*data, *args, **kwargs, **kwdata)


def do_recursive(func: Callable, *data: Any, args: tuple = (), kwargs: dict | None = None, **kwdata: Any) -> None:
    """Side-effect walk (ref recursive_utils.py:13)."""
    kwargs = kwargs or {}
    example = data[0] if data else next(iter(kwdata.values()))
    if isinstance(example, Mapping):
        for key in example:
            do_recursive(
                func,
                *(d[key] for d in data),
                args=args,
                kwargs=kwargs,
                **{n: v[key] for n, v in kwdata.items()},
            )
    elif isinstance(example, (list, tuple)):
        for i in range(len(example)):
            do_recursive(
                func,
                *(d[i] for d in data),
                args=args,
                kwargs=kwargs,
                **{n: v[i] for n, v in kwdata.items()},
            )
    else:
        func(*data, *args, **kwargs, **kwdata)


def restack_legacy_ensembles(restored: Any, template: Any) -> Any:
    """Migrate pre-vmap ensemble checkpoints to the stacked layout.

    Checkpoints written when ``ConfigurableModule(ensemble_impl='unroll')``
    was the default store each ensemble member as a flat sibling submodule
    named ``{base}_e{i}{inner}`` (the DSL evaluates member configs with path
    prefix ``{base}_e{i}``; the member's own root path is ``m``, so its node
    names continue as ``{base}_e{i}`` + inner[1:]). The vmapped layout has
    ONE submodule ``{base}_ens`` whose subtree stacks member leaves along
    axis 0.

    Given a restored (msgpack) state dict and the target template state
    dict, restack every legacy group the template expects as ``_ens``.
    Returns a new state dict; untouched keys pass through unchanged.
    """
    import numpy as np

    if not isinstance(restored, Mapping) or not isinstance(template, Mapping):
        return restored
    out = dict(restored)
    for key, tsub in template.items():
        if key in out:
            out[key] = restack_legacy_ensembles(out[key], tsub)
            continue
        if not (key.endswith("_ens") and isinstance(tsub, Mapping)):
            continue
        base = key[: -len("_ens")]
        stacked_leaves = jax.tree_util.tree_leaves(tsub)
        if not stacked_leaves:
            continue
        n = int(stacked_leaves[0].shape[0])
        members, used = [], []
        for i in range(n):
            member = {}
            for inner in tsub:
                legacy = f"{base}_e{i}{inner[1:]}" if inner.startswith("m") else None
                if legacy is None or legacy not in restored:
                    member = None
                    break
                member[inner] = restored[legacy]
                used.append(legacy)
            if member is None:
                break
            members.append(member)
        if len(members) == n:
            out[key] = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0), *members
            )
            for legacy in used:
                out.pop(legacy, None)
    return out


def detach_recursively(tree: Any, cpu: bool = False) -> Any:
    """stop_gradient over a pytree (the reference's _detach_recursively,
    lightning_model.py:484; `cpu=True` additionally device_gets)."""
    out = jax.tree_util.tree_map(jax.lax.stop_gradient, tree)
    if cpu:
        out = jax.device_get(out)
    return out
