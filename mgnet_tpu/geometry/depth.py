"""Inverse-depth utilities and edge-aware smoothness.

Behavioral parity with reference: mgnet/geometry/depth.py
(inv2depth, calc_smoothness with mean-normalized inverse depth).
NHWC layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from mgnet_tpu.geometry.image import gradient_x, gradient_y

__all__ = ["inv2depth", "calc_smoothness"]


def inv2depth(inv_depth):
    """Invert an inverse-depth map: depth = 1 / max(inv_depth, 1e-6).

    Parity: reference depth.py inv2depth (list-recursive).
    """
    if isinstance(inv_depth, (tuple, list)):
        return [inv2depth(d) for d in inv_depth]
    return 1.0 / jnp.clip(inv_depth, min=1e-6)


def _normalize_inv_depths(inv_depths):
    """Divide each inverse-depth map by its spatial mean (reference:
    depth.py _inv_depths_normalize; regularizes smoothness away from 0)."""
    out = []
    for d in inv_depths:
        mean = jnp.mean(d, axis=(1, 2), keepdims=True)
        out.append(d / jnp.clip(mean, min=1e-6))
    return out


def calc_smoothness(inv_depths, image, num_scales: int):
    """Image-gradient-weighted inverse-depth gradients per scale.

    Parity: reference depth.py calc_smoothness. ``image`` is resized by the
    caller to the first scale; weights are computed once from it (the
    reference computes weights from the full-res image for every scale —
    all scales share the same full-res shape after head upsampling).

    Args:
        inv_depths: list of [B, H, W, 1] inverse depth maps.
        image: [B, H, W, 3] image at the same resolution.

    Returns:
        (smoothness_x list of [B,H,W-1,1], smoothness_y list of [B,H-1,W,1])
    """
    inv_depths_norm = _normalize_inv_depths(inv_depths)
    grads_x = [gradient_x(d) for d in inv_depths_norm]
    grads_y = [gradient_y(d) for d in inv_depths_norm]

    weights_x = jnp.exp(-jnp.mean(jnp.abs(gradient_x(image)), axis=-1, keepdims=True))
    weights_y = jnp.exp(-jnp.mean(jnp.abs(gradient_y(image)), axis=-1, keepdims=True))

    smoothness_x = [grads_x[i] * weights_x for i in range(num_scales)]
    smoothness_y = [grads_y[i] * weights_y for i in range(num_scales)]
    return smoothness_x, smoothness_y
