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
]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op for a single process).

    Reference analog: detectron2 launch(num_machines, machine_rank,
    dist_url) at tools/train_net.py:241-248.
    """
    if num_processes is None or num_processes <= 1:
        return
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
