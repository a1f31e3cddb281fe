"""Depth post-processing: DGC metric rescaling + class filtering, on-device.

Behavioral parity with reference: mgnet/postprocessing/depth_post_proc.py
(unproject depth to camera points; surface normals from 4 cross products of
the 8-neighborhood; ground mask from panoptic road class or the
normal-verticality test; per-ground-pixel camera height; median; scale =
real_height / median; sky/ego filtering to 0/NaN).

TPU-first (SURVEY.md §7 hard part #4): the masked variable-size median
becomes a fixed-shape masked sort + dynamic index; everything is
jit-compatible and composes into the fused inference executable.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mgnet_tpu.geometry import Camera

__all__ = ["depth_postprocess", "surface_normals", "dgc_scale_factor"]


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def _normalize3(x, y, z, eps: float = 1e-12):
    inv = jax.lax.rsqrt(x * x + y * y + z * z + eps)
    return x * inv, y * inv, z * inv


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _surface_normals_planar(px, py, pz, nei: int = 1):
    """surface_normals on coordinate planes [B, H, W] each.

    TPU layout note: arithmetic on packed [B, H, W, 3] tensors puts the
    3-wide coordinate axis on the 128-lane minor dimension, wasting
    125/128 lanes of every VPU op (measured 1.8 ms at 1024x2048 for the
    packed formulation vs ~0.4 ms planar). Same math, struct-of-arrays.
    """
    def shifts(p):
        c = p[:, nei:-nei, nei:-nei]
        return (
            p[:, nei:-nei, : -2 * nei] - c,       # x0
            p[:, : -2 * nei, nei:-nei] - c,       # y0
            p[:, nei:-nei, 2 * nei:] - c,         # x1
            p[:, 2 * nei:, nei:-nei] - c,         # y1
            p[:, : -2 * nei, : -2 * nei] - c,     # x0y0
            p[:, 2 * nei:, : -2 * nei] - c,       # x0y1
            p[:, : -2 * nei, 2 * nei:] - c,       # x1y0
            p[:, 2 * nei:, 2 * nei:] - c,         # x1y1
        )

    sx, sy, sz = shifts(px), shifts(py), shifts(pz)
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7)]
    nx = ny = nz = 0.0
    for a, b in pairs:
        cx, cy_, cz = _cross3(sx[a], sy[a], sz[a], sx[b], sy[b], sz[b])
        cx, cy_, cz = _normalize3(cx, cy_, cz)
        nx, ny, nz = nx + cx, ny + cy_, nz + cz
    nx, ny, nz = _normalize3(nx / 4.0, ny / 4.0, nz / 4.0)
    pad = ((0, 0), (nei, nei), (nei, nei))
    return (jnp.pad(nx, pad, mode="edge"), jnp.pad(ny, pad, mode="edge"),
            jnp.pad(nz, pad, mode="edge"))


def surface_normals(points: jnp.ndarray, nei: int = 1) -> jnp.ndarray:
    """Per-pixel surface normals from camera-frame points [B, H, W, 3].

    Parity: reference depth_post_proc.py:114-152 — four cross products of
    the 8-neighborhood difference vectors, averaged, normalized, and
    replicate-padded back to full size. Evaluated in planar form (see
    _surface_normals_planar).
    """
    nx, ny, nz = _surface_normals_planar(
        points[..., 0], points[..., 1], points[..., 2], nei=nei
    )
    return jnp.stack([nx, ny, nz], axis=-1)


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics over masked elements: lower-middle element.

    Exact k-th order statistic (k = (count-1)//2) via 32-step bisection
    over the IEEE-754 bit space instead of a full sort: floats map
    monotonically to uint32 keys, then each bit of the answer is decided
    by one masked count-below reduction. A 2M-element sort costs ~26 ms
    on one v5e chip; the 32 fused reductions cost ~2 ms and XLA keeps
    everything streaming (no sort, no scatter).
    """
    flat_v = values.reshape(-1).astype(jnp.float32)
    flat_m = mask.reshape(-1)

    bits = jax.lax.bitcast_convert_type(flat_v, jnp.uint32)
    # monotonic total order: negative floats reverse, positives offset
    key = jnp.where(
        bits >> 31,
        ~bits,
        bits | jnp.uint32(0x80000000),
    )
    key = jnp.where(flat_m, key, jnp.uint32(0xFFFFFFFF))

    count = jnp.sum(flat_m.astype(jnp.int32))
    k = jnp.maximum((count - 1) // 2, 0)

    # static unroll: a fori_loop forces per-iteration scheduling barriers
    # and measures 2.0 ms vs 1.4 unrolled at 2M elements on v5e
    res = jnp.uint32(0)
    for b in range(31, -1, -1):
        cand = res | (jnp.uint32(1) << jnp.uint32(b))
        below = jnp.sum((key < cand).astype(jnp.int32))
        # the k-th smallest is >= cand iff fewer than k+1 keys are < cand
        res = jnp.where(below <= k, cand, res)

    back = jnp.where(
        res >> 31,
        res ^ jnp.uint32(0x80000000),
        ~res,
    )
    median = jax.lax.bitcast_convert_type(back, jnp.float32)
    # empty mask -> +inf (matches the sort-with-inf-fill formulation)
    return jnp.where(count > 0, median, jnp.inf)


def dgc_scale_factor(points: jnp.ndarray, real_camera_height: jnp.ndarray,
                     ground_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dynamic-Ground-Constraint scale: real_height / median est. height.

    Parity: reference depth_post_proc.py:76-104 (_get_scale_recovery).

    Args:
        points: [B, H, W, 3] camera-frame points (unscaled).
        real_camera_height: [B] or scalar metric mounting height.
        ground_mask: [B, H, W] bool, or None to derive geometrically.
    """
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    nx, ny, nz = _surface_normals_planar(px, py, pz)
    if ground_mask is None:
        # planar _vertical_ground_mask: cos to the +y axis is just ny
        # (normals are unit), matching reference :154-185
        thr = math.cos(math.radians(5.0))
        norm = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-12)
        cos_sim = ny / jnp.maximum(norm, 1e-6)
        ground_mask = ((cos_sim > thr) | (cos_sim < -thr)) & (py > 0)
    heights = jnp.abs(px * nx + py * ny + pz * nz)  # [B, H, W]
    med = jax.vmap(_masked_median)(heights, ground_mask)  # [B]
    med = jnp.maximum(med, 1e-6)
    return jnp.asarray(real_camera_height, points.dtype).reshape(-1) / med


@partial(jax.jit, static_argnames=("use_dgc_scaling", "filter_class_ids",
                                   "road_class_id"))
def depth_postprocess(
    depth: jnp.ndarray,
    camera_matrix: Optional[jnp.ndarray] = None,
    real_camera_height: Optional[jnp.ndarray] = None,
    panoptic_seg: Optional[jnp.ndarray] = None,
    *,
    use_dgc_scaling: bool = True,
    road_class_id: int = -1,
    filter_class_ids: Sequence[int] = (),
):
    """Metric-rescale a depth prediction and unproject a point cloud.

    Parity: reference depth_post_proc.py:11-73 (get_depth_prediction).

    Args:
        depth: [B, H, W, 1] predicted depth.
        camera_matrix: [B, 3, 3] intrinsics (required for DGC).
        real_camera_height: [B] metric camera height (required for DGC).
        panoptic_seg: [B, H, W] panoptic ids or None.

    Returns:
        (depth [B, H, W], xyz_points [B, H, W, 3] or None)
    """
    depth = depth.astype(jnp.float32)
    points = None
    if use_dgc_scaling:
        assert camera_matrix is not None and real_camera_height is not None
        cam = Camera(K=camera_matrix.astype(jnp.float32))
        points = cam.reconstruct(depth, frame="c")
        ground_mask = None
        if panoptic_seg is not None and road_class_id != -1:
            ground_mask = panoptic_seg == road_class_id
        scale = dgc_scale_factor(points, real_camera_height, ground_mask)
        scale = scale.reshape(-1, 1, 1, 1)
        depth = depth * scale
        points = points * scale

    depth2d = depth[..., 0]
    if panoptic_seg is not None and filter_class_ids:
        for cid in filter_class_ids:
            m = panoptic_seg == cid
            depth2d = jnp.where(m, 0.0, depth2d)
            if points is not None:
                points = jnp.where(m[..., None], jnp.nan, points)
    return depth2d, points
