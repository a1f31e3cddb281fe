"""Evaluation (parity: reference mgnet/evaluation/__init__.py:1-7)."""

from mgnet_tpu.evaluation.depth import DepthEvaluator, depth_metrics
from mgnet_tpu.evaluation.panoptic import PanopticEvaluator
from mgnet_tpu.evaluation.pq import (
    PQStat,
    pq_compute_single_image,
    summarize_pq,
)
from mgnet_tpu.evaluation.semantic import SemSegEvaluator

__all__ = [
    "DepthEvaluator",
    "depth_metrics",
    "PanopticEvaluator",
    "SemSegEvaluator",
    "PQStat",
    "pq_compute_single_image",
    "summarize_pq",
]
