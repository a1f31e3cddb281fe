"""Differentiable pinhole camera over NHWC maps (a jax pytree).

Behavioral parity with reference: mgnet/geometry/camera.py (Camera:
Kinv closed form, scaled, reconstruct, project), adapted there from
packnet-sfm. TPU-first: pure functional methods, einsum-based batched
matmuls that XLA maps to the MXU, no device movement/state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mgnet_tpu.geometry.image import image_grid
from mgnet_tpu.geometry.pose import Pose

__all__ = ["Camera"]


@jax.tree_util.register_pytree_node_class
class Camera:
    """Pinhole camera: intrinsics K [B, 3, 3] + optional camera->world pose."""

    def __init__(self, K: jnp.ndarray, Tcw: Pose | None = None):
        if K.ndim == 2:
            K = K[None]
        self.K = K
        self.Tcw = Pose.identity(K.shape[0], dtype=K.dtype) if Tcw is None else Tcw

    # pytree protocol ---------------------------------------------------------
    def tree_flatten(self):
        return (self.K, self.Tcw), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    def __len__(self) -> int:
        return self.K.shape[0]

    @property
    def fx(self):
        return self.K[:, 0, 0]

    @property
    def fy(self):
        return self.K[:, 1, 1]

    @property
    def cx(self):
        return self.K[:, 0, 2]

    @property
    def cy(self):
        return self.K[:, 1, 2]

    @property
    def Twc(self) -> Pose:
        return self.Tcw.inverse()

    @property
    def Kinv(self) -> jnp.ndarray:
        """Closed-form inverse intrinsics (reference: camera.py:73-81)."""
        b = self.K.shape[0]
        zeros = jnp.zeros((b,), dtype=self.K.dtype)
        ones = jnp.ones((b,), dtype=self.K.dtype)
        row0 = jnp.stack([1.0 / self.fx, zeros, -self.cx / self.fx], axis=1)
        row1 = jnp.stack([zeros, 1.0 / self.fy, -self.cy / self.fy], axis=1)
        row2 = jnp.stack([zeros, zeros, ones], axis=1)
        return jnp.stack([row0, row1, row2], axis=1)

    def scaled(self, x_scale: float, y_scale: float | None = None) -> "Camera":
        """Camera with intrinsics rescaled for a resized image.

        Parity: reference camera.py:84-104 + camera_utils.py scale_intrinsics
        (pixel-center +0.5 convention).
        """
        from mgnet_tpu.geometry.camera_utils import scale_intrinsics

        if y_scale is None:
            y_scale = x_scale
        if x_scale == 1.0 and y_scale == 1.0:
            return self
        return Camera(scale_intrinsics(self.K, x_scale, y_scale), Tcw=self.Tcw)

    def reconstruct(self, depth: jnp.ndarray, frame: str = "w") -> jnp.ndarray:
        """Unproject a depth map [B, H, W, 1] to 3D points [B, H, W, 3].

        Parity: reference camera.py:107-139 (Kinv @ grid * depth, then
        optional world transform).
        """
        b, h, w, c = depth.shape
        assert c == 1, f"depth must be [B,H,W,1], got {depth.shape}"
        grid = image_grid(b, h, w, dtype=depth.dtype)
        rays = jnp.einsum(
            "bij,bhwj->bhwi", self.Kinv.astype(depth.dtype), grid,
            precision=jax.lax.Precision.HIGHEST,
        )  # coordinate math: default MXU precision injects subpixel error
        xc = rays * depth
        if frame == "c":
            return xc
        if frame == "w":
            return self.Twc @ xc
        raise ValueError(f"Unknown reference frame {frame}")

    def project(self, points: jnp.ndarray, frame: str = "w") -> jnp.ndarray:
        """Project 3D points [B, H, W, 3] to normalized coords [B, H, W, 2].

        Output is (x, y) in [-1, 1] (grid_sample convention).
        Parity: reference camera.py:141-182.
        """
        b, h, w, c = points.shape
        assert c == 3, f"points must be [B,H,W,3], got {points.shape}"
        if frame == "w":
            points = self.Tcw @ points
        elif frame != "c":
            raise ValueError(f"Unknown reference frame {frame}")
        proj = jnp.einsum(
            "bij,bhwj->bhwi", self.K.astype(points.dtype), points,
            precision=jax.lax.Precision.HIGHEST,
        )
        x, y = proj[..., 0], proj[..., 1]
        z = jnp.clip(proj[..., 2], min=1e-5)
        xnorm = 2.0 * (x / z) / (w - 1) - 1.0
        ynorm = 2.0 * (y / z) / (h - 1) - 1.0
        return jnp.stack([xnorm, ynorm], axis=-1)
