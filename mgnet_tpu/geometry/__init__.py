"""Differentiable pinhole-camera geometry for self-supervised depth.

Behavioral parity with the reference geometry library
(reference: mgnet/geometry/__init__.py:1-16, adapted there from packnet-sfm),
re-designed for TPU: pure jax.numpy functions over NHWC tensors, no classes
with device state, everything traceable under jit.
"""

from mgnet_tpu.geometry.camera import Camera
from mgnet_tpu.geometry.image import (
    gradient_x,
    gradient_y,
    grid_sample,
    image_grid,
    interpolate_bilinear,
    interpolate_nearest,
    match_scales,
)
from mgnet_tpu.geometry.pose import (
    Pose,
    euler2mat,
    invert_pose,
    pose_vec2mat,
)
from mgnet_tpu.geometry.depth import calc_smoothness, inv2depth
from mgnet_tpu.geometry.camera_utils import (
    construct_K,
    scale_intrinsics,
    view_synthesis,
    view_synthesis_planar,
)

__all__ = [
    "Camera",
    "Pose",
    "euler2mat",
    "pose_vec2mat",
    "invert_pose",
    "construct_K",
    "scale_intrinsics",
    "view_synthesis",
    "view_synthesis_planar",
    "inv2depth",
    "calc_smoothness",
    "image_grid",
    "grid_sample",
    "gradient_x",
    "gradient_y",
    "interpolate_bilinear",
    "interpolate_nearest",
    "match_scales",
]
