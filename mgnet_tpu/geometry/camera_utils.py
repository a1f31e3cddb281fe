"""Intrinsics helpers and view synthesis (warping).

Behavioral parity with reference: mgnet/geometry/camera_utils.py
(construct_K, scale_intrinsics with the +0.5 pixel-center convention,
view_synthesis = reconstruct -> project -> bilinear grid sample).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mgnet_tpu.geometry.image import grid_sample

__all__ = ["construct_K", "scale_intrinsics", "view_synthesis",
           "view_synthesis_planar", "synthesis_coords"]


def construct_K(fx: float, fy: float, cx: float, cy: float,
                dtype=np.float32) -> np.ndarray:
    """Build a [3, 3] pinhole intrinsics matrix (host-side helper)."""
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=dtype)


def scale_intrinsics(K: jnp.ndarray, x_scale, y_scale) -> jnp.ndarray:
    """Rescale intrinsics for a resized image (pixel-center convention).

    Parity: reference camera_utils.py:15-21 —
    f *= scale; c = (c + 0.5) * scale - 0.5. Functional (returns new K).
    """
    K = jnp.asarray(K)
    fx = K[..., 0, 0] * x_scale
    fy = K[..., 1, 1] * y_scale
    cx = (K[..., 0, 2] + 0.5) * x_scale - 0.5
    cy = (K[..., 1, 2] + 0.5) * y_scale - 0.5
    out = K
    out = out.at[..., 0, 0].set(fx)
    out = out.at[..., 1, 1].set(fy)
    out = out.at[..., 0, 2].set(cx)
    out = out.at[..., 1, 2].set(cy)
    return out


def view_synthesis(ref_image: jnp.ndarray, depth: jnp.ndarray, ref_cam,
                   cam, padding_mode: str = "zeros",
                   use_pallas: bool = False) -> jnp.ndarray:
    """Warp ``ref_image`` into the frame of ``cam`` given ``depth``.

    Parity: reference camera_utils.py:24-54 — reconstruct world points with
    ``cam``, project onto ``ref_cam``, bilinear-sample with
    align_corners=True.

    Args:
        ref_image: [B, H, W, 3] reference (context) image.
        depth: [B, H, W, 1] depth of the target view.
        ref_cam: Camera of the reference image (carries the relative pose).
        cam: Camera of the target view.
    """
    assert depth.shape[-1] == 1
    ref_coords = synthesis_coords(depth, ref_cam, cam)
    return grid_sample(ref_image, ref_coords, padding_mode, use_pallas)


def synthesis_coords(depth: jnp.ndarray, ref_cam, cam) -> jnp.ndarray:
    """Normalized sampling coords [B, H, W, 2] of view_synthesis.

    Planar evaluation of reconstruct -> transform -> project: identical
    math to cam.reconstruct(frame="w") + ref_cam.project(frame="w") but
    on [B, H, W] coordinate planes with per-batch scalar coefficients —
    the packed [B,H,W,3] einsum chain puts the 3-vector on the 128-lane
    minor dim and wastes 125/128 lanes (see losses/photometric.py).
    """
    b, h, w, _ = depth.shape
    f32 = jnp.float32
    d = depth[..., 0].astype(f32)
    u = jnp.arange(w, dtype=f32)[None, None, :]
    v = jnp.arange(h, dtype=f32)[None, :, None]

    def c(m, i, j):
        return m[:, i, j][:, None, None]

    kinv = cam.Kinv.astype(f32)
    rx = c(kinv, 0, 0) * u + c(kinv, 0, 1) * v + c(kinv, 0, 2)
    ry = c(kinv, 1, 0) * u + c(kinv, 1, 1) * v + c(kinv, 1, 2)
    rz = c(kinv, 2, 0) * u + c(kinv, 2, 1) * v + c(kinv, 2, 2)
    x, y, z = rx * d, ry * d, rz * d

    # Full chain cam-frame -> world (cam.Twc) -> ref-cam frame (ref_cam.Tcw),
    # composed into one 4x4 per batch so the per-pixel planar math stays a
    # single affine application. Matches reference camera_utils.py:24-54
    # (cam.reconstruct(frame="w") then ref_cam.project(frame="w")) for
    # arbitrary target-camera poses, not just identity ones.
    m = (ref_cam.Tcw.transform_pose(cam.Twc)).mat.astype(f32)
    xr = c(m, 0, 0) * x + c(m, 0, 1) * y + c(m, 0, 2) * z + c(m, 0, 3)
    yr = c(m, 1, 0) * x + c(m, 1, 1) * y + c(m, 1, 2) * z + c(m, 1, 3)
    zr = c(m, 2, 0) * x + c(m, 2, 1) * y + c(m, 2, 2) * z + c(m, 2, 3)

    k = ref_cam.K.astype(f32)
    px = c(k, 0, 0) * xr + c(k, 0, 1) * yr + c(k, 0, 2) * zr
    py = c(k, 1, 0) * xr + c(k, 1, 1) * yr + c(k, 1, 2) * zr
    pz = c(k, 2, 0) * xr + c(k, 2, 1) * yr + c(k, 2, 2) * zr
    pz = jnp.clip(pz, min=1e-5)
    xnorm = 2.0 * (px / pz) / (w - 1) - 1.0
    ynorm = 2.0 * (py / pz) / (h - 1) - 1.0
    return jnp.stack([xnorm, ynorm], axis=-1)


def view_synthesis_planar(ref_image_pl: jnp.ndarray, depth: jnp.ndarray,
                          ref_cam, cam, padding_mode: str = "zeros",
                          use_pallas: bool = False) -> jnp.ndarray:
    """view_synthesis for a channel-planar reference image [B, C, H, W];
    returns the warped frame planar. Used by the photometric loss, which
    keeps full-res tensors planar end to end (no NHWC relayouts around
    the Pallas warp/SSIM kernels)."""
    from mgnet_tpu.geometry.image import grid_sample_planar

    assert depth.shape[-1] == 1
    ref_coords = synthesis_coords(depth, ref_cam, cam)
    return grid_sample_planar(ref_image_pl, ref_coords, padding_mode,
                              use_pallas)
