"""Multi-host (multi-process) utilities.

Replaces the reference's NCCL/gloo cross-process machinery (SURVEY.md
§2.9/§5: detectron2 ``launch`` spawn, ``comm.synchronize``/``comm.gather``
barriers and gathers used by every evaluator) with the JAX equivalents:
``jax.distributed.initialize`` for DCN-connected hosts, compiled mesh
collectives inside the step, and ``process_allgather`` / host-0 writes for
evaluation-time aggregation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "initialize_distributed",
    "is_main_process",
    "process_count",
    "synchronize",
    "all_gather_host",
    "all_gather_objects",
]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op for a single process).

    Reference analog: detectron2 launch(num_machines, machine_rank,
    dist_url) at tools/train_net.py:241-248. On CPU platforms the gloo
    collectives backend is selected so cross-process gathers work in
    tests and CI (two localhost processes — see
    tests/test_multiprocess.py).
    """
    if num_processes is None or num_processes <= 1:
        return
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def synchronize() -> None:
    """Cross-process barrier (reference comm.synchronize analog)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mgnet_tpu_barrier")


def all_gather_host(data: Any) -> Any:
    """Gather host-local pytrees of numpy arrays across processes.

    Reference analog: comm.gather in evaluators
    (panoptic_evaluation.py:119-122, depth_evaluation.py:115-118).
    Returns the concatenated result on every process.
    """
    if jax.process_count() == 1:
        return data
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(data)


def all_gather_objects(obj: Any) -> list:
    """Gather arbitrary (picklable) host objects from every process.

    The exact analog of detectron2's ``comm.all_gather`` used by the
    reference evaluators (panoptic_evaluation.py:119-122): variable-size
    per-process state is serialized, length-padded to the global max, and
    exchanged with one fixed-shape allgather. Returns a list with one
    entry per process (ordered by process index) on every process.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), dtype=np.uint8
    )
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(lengths[i])].tobytes())
        for i in range(jax.process_count())
    ]
