"""Ahead-of-time export of the fused inference executable.

This is the TPU-native replacement for the reference's deployment
serialization chain (ExportableMGNet -> ONNX opset 13 -> onnx2trt fp16
.plan + TorchScript postprocessing .pt, reference: tools/onnx_trt_export.py
:94-145): the fused jit function (model + post-processing, bf16 compute)
is lowered and serialized with ``jax.export`` into a single portable
artifact containing StableHLO; it reloads anywhere (including a C++ PJRT
runtime via the embedded MLIR module) and runs without Python model code.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_fused_inference", "save_exported", "load_exported"]


def export_fused_inference(
    fused_fn: Callable,
    params,
    batch_stats,
    input_shape: Tuple[int, int, int, int] = (1, 1024, 2048, 3),
    with_camera: bool = True,
    platforms=None,
):
    """Lower + serialize the fused pipeline with weights baked in.

    Returns (jax.export.Exported, serialized bytes).
    """
    b = input_shape[0]

    if with_camera:
        def fn(image, camera_matrix, camera_height):
            return fused_fn(params, batch_stats, image,
                            camera_matrix=camera_matrix,
                            camera_height=camera_height)

        args = (
            jax.ShapeDtypeStruct(input_shape, jnp.float32),
            jax.ShapeDtypeStruct((b, 3, 3), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
        )
    else:
        def fn(image):
            return fused_fn(params, batch_stats, image)

        args = (jax.ShapeDtypeStruct(input_shape, jnp.float32),)

    exported = jax_export.export(
        jax.jit(fn), platforms=platforms
    )(*args)
    return exported, exported.serialize()


def save_exported(path: str, blob: bytes) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """Load a serialized artifact; returns a callable jax function."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
