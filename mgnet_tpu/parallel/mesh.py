"""Device mesh and sharding utilities — the TPU-native distribution layer.

Replaces the reference's NCCL/DDP stack (SURVEY.md §2.9/§2.10):
* process-per-GPU spawn + DDP gradient all-reduce
  (reference tools/train_net.py:241-248) -> one SPMD program over a
  ``jax.sharding.Mesh`` with the batch sharded on the ``data`` axis;
  gradient averaging becomes an XLA-scheduled psum compiled into the step.
* per-layer InPlaceABNSync stat all-reduce -> global-batch BN statistics
  under pjit (see models/abn.py).
* evaluator comm.gather -> process_allgather / host-0 aggregation.

A ``model`` axis is reserved for XLA SPMD spatial partitioning of very
large inputs (SURVEY.md §5 long-context note); it is size 1 by default.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_to_mesh",
]


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[list] = None) -> Mesh:
    """Create a (data, model) mesh. data=-1 uses all available devices."""
    devices = devices if devices is not None else jax.devices()
    if data == -1:
        data = len(devices) // model
    need = data * model
    assert need <= len(devices), (
        f"mesh {data}x{model} needs {need} devices, have {len(devices)}"
    )
    dev_array = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, batch-dim sharded on 'data'.

    Single process: a plain device_put of the full global batch.
    Multi-process (multi-host): ``batch`` is this process's LOCAL slice
    (global_batch / process_count samples, produced by TrainLoader's
    per-process sampling); the global array is assembled with
    ``jax.make_array_from_process_local_data`` so each host only ever
    materializes its own shard — the reference's per-rank DDP batch
    semantics (reference tools/train_net.py:241-248) without duplicate
    mapper work.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_to_mesh(mesh: Mesh, tree: Any) -> Any:
    """Replicate host values onto every device of a (possibly multi-host)
    mesh. Values must be identical on all processes (e.g. the train state
    initialized from the same PRNG key)."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(rep, tree)
