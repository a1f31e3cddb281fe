"""SE(3) pose math as pure functions over [B, 4, 4] arrays.

Behavioral parity with reference: mgnet/geometry/pose.py and
mgnet/geometry/pose_utils.py (adapted there from packnet-sfm).
Re-designed for TPU: the ``Pose`` wrapper is a jax pytree so poses pass
through jit/vmap/grad transparently; no device state, no in-place ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["euler2mat", "pose_vec2mat", "invert_pose", "Pose"]


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """XYZ Euler angles [B, 3] -> rotation matrices [B, 3, 3].

    Parity: reference mgnet/geometry/pose_utils.py:9-38
    (R = Rx @ Ry @ Rz applied in that order).
    """
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    b = angle.shape[0]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    cz, sz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=1
    ).reshape(b, 3, 3)

    cy, sy = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=1
    ).reshape(b, 3, 3)

    cx, sx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=1
    ).reshape(b, 3, 3)

    return xmat @ ymat @ zmat


def pose_vec2mat(vec: jnp.ndarray, mode: str = "euler") -> jnp.ndarray:
    """6-DoF vector [B, 6] (tx,ty,tz,rx,ry,rz) -> [B, 3, 4] transform.

    Parity: reference mgnet/geometry/pose_utils.py pose_vec2mat.
    """
    if mode != "euler":
        raise ValueError(f"Rotation mode not supported: {mode}")
    trans = vec[:, :3, None]
    rot = euler2mat(vec[:, 3:])
    return jnp.concatenate([rot, trans], axis=2)


def invert_pose(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transforms [B, 4, 4] in closed form (R^T, -R^T t).

    Parity: reference mgnet/geometry/pose_utils.py invert_pose.
    """
    rot_t = jnp.swapaxes(mat[:, :3, :3], -2, -1)
    t = -(rot_t @ mat[:, :3, 3:4])
    top = jnp.concatenate([rot_t, t], axis=2)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mat.dtype)[None, None, :],
        (mat.shape[0], 1, 4),
    )
    return jnp.concatenate([top, bottom], axis=1)


@jax.tree_util.register_pytree_node_class
class Pose:
    """Immutable [B, 4, 4] rigid-transform wrapper (a jax pytree).

    Parity: reference mgnet/geometry/pose.py Pose (identity/from_vec/
    inverse/@-composition/point transform), with NHWC point maps.
    """

    def __init__(self, mat: jnp.ndarray):
        if mat.ndim == 2:
            mat = mat[None]
        self.mat = mat

    # pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # constructors ----------------------------------------------------------
    @classmethod
    def identity(cls, batch: int = 1, dtype=jnp.float32) -> "Pose":
        return cls(jnp.broadcast_to(jnp.eye(4, dtype=dtype), (batch, 4, 4)))

    @classmethod
    def from_vec(cls, vec: jnp.ndarray, mode: str = "euler") -> "Pose":
        mat34 = pose_vec2mat(vec, mode)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=vec.dtype)[None, None, :],
            (vec.shape[0], 1, 4),
        )
        return cls(jnp.concatenate([mat34, bottom], axis=1))

    # ops ---------------------------------------------------------------------
    def __len__(self) -> int:
        return self.mat.shape[0]

    def inverse(self) -> "Pose":
        return Pose(invert_pose(self.mat))

    def transform_pose(self, other: "Pose") -> "Pose":
        return Pose(self.mat @ other.mat)

    def transform_points(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform NHWC point maps [B, H, W, 3]."""
        rot = self.mat[:, :3, :3]
        t = self.mat[:, :3, 3]
        return jnp.einsum(
            "bij,bhwj->bhwi", rot, points,
            precision=jax.lax.Precision.HIGHEST,
        ) + t[:, None, None, :]

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.transform_pose(other)
        if isinstance(other, jnp.ndarray) and other.ndim == 4 and other.shape[-1] == 3:
            return self.transform_points(other)
        raise ValueError(f"Cannot apply Pose to {type(other)}")
