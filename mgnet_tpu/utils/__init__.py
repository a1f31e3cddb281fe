from mgnet_tpu.utils.checkpoint import (
    CheckpointManager,
    load_params,
    save_params,
)
from mgnet_tpu.utils.events import MetricLogger
from mgnet_tpu.utils.loader import locate
from mgnet_tpu.utils.profiling import steady_state_timer, trace
from mgnet_tpu.utils.weights import load_pretrained_npz

__all__ = [
    "CheckpointManager",
    "save_params",
    "load_params",
    "MetricLogger",
    "locate",
    "trace",
    "steady_state_timer",
    "load_pretrained_npz",
]
