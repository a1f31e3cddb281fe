"""Post-processing (parity: reference mgnet/postprocessing/__init__.py:1-6).

All compute-path functions are jit-compatible and compose into the fused
single-executable inference path (mgnet_tpu/inference/fused.py), replacing
the reference's CUDA/TorchScript postprocessing plugins.
"""

from mgnet_tpu.postprocessing.panoptic import find_instance_centers, panoptic_fusion
from mgnet_tpu.postprocessing.depth import (
    depth_postprocess,
    dgc_scale_factor,
    surface_normals,
)
from mgnet_tpu.postprocessing.instance import extract_instances

__all__ = [
    "panoptic_fusion",
    "find_instance_centers",
    "depth_postprocess",
    "dgc_scale_factor",
    "surface_normals",
    "extract_instances",
]
