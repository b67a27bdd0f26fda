"""Device-mesh and sharding utilities.

The reference has no working multi-device story (all shipped trainers pin
gpus=1/num_nodes=1, reference speech_distillation/lightning_model.py:947-950;
only a latent DistributedSampler at label_bias_sniffer.py:140). Here
parallelism is first-class: one global `jax.sharding.Mesh` with ('data',
'model') axes; batches are sharded over 'data' (gradient psum inserted by
pjit), channel-sharded tensor parallelism can use 'model'.

Multi-host: call `jax.distributed.initialize()` before `create_mesh`;
per-host input sharding replaces DistributedSampler (each host feeds its
addressable shard via `shard_batch`).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: call before create_mesh on each host
    (jax.distributed.initialize passthrough; coordinator/host ids from env)."""
    import jax

    jax.distributed.initialize(**kwargs)


def create_mesh(
    data: int | None = None,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tensor_parallel_shardings(tree: Any, mesh: Mesh, min_size: int = 64) -> Any:
    """Channel (tensor) parallelism over the 'model' mesh axis.

    For every array leaf whose last axis is divisible by the 'model' axis
    size and at least ``min_size`` wide, shard that axis (column-parallel
    convs: (K, I, O) kernels and (O,) biases shard on O; optimizer moments
    share the shapes so they shard identically). Everything else is
    replicated — GSPMD propagates activation shardings and inserts the
    collectives over ICI.
    """
    model_size = mesh.shape.get("model", 1)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (
            model_size > 1
            and len(shape) >= 1
            and shape[-1] >= min_size
            and shape[-1] % model_size == 0
        ):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with the batch axis sharded over 'data'.

    Works single- and multi-host (uses make_array_from_process_local_data so
    each host contributes its local slice)."""
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
