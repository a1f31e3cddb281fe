"""Inference/serving (parity: reference mgnet/inference/__init__.py:1-4)."""

from mgnet_tpu.inference.fused import (
    PostprocessStatics,
    build_fused_inference,
    statics_from_meta,
)
from mgnet_tpu.inference.predictor import Predictor
from mgnet_tpu.inference.tta import multi_scale_flip_inference

__all__ = [
    "PostprocessStatics",
    "build_fused_inference",
    "statics_from_meta",
    "Predictor",
    "multi_scale_flip_inference",
]
