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


def detach_recursively(tree: Any, cpu: bool = False) -> Any:
    """stop_gradient over a pytree (the reference's _detach_recursively,
    lightning_model.py:484; `cpu=True` additionally device_gets)."""
    out = jax.tree_util.tree_map(jax.lax.stop_gradient, tree)
    if cpu:
        out = jax.device_get(out)
    return out
