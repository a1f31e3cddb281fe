"""Analytic validation of the self-supervised depth forward model.

For a fronto-parallel plane at depth d observed by a camera translated by
tx, view synthesis with the exact (pose, depth) must reproduce the target
frame to numerical precision — this pins down every sign/convention in
Camera/Pose/view_synthesis jointly (SURVEY.md §7 hard part #3).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mgnet_tpu.geometry import Camera, Pose, view_synthesis
from mgnet_tpu.losses.photometric import multi_view_photometric_loss

H, W, FX = 96, 192, 226.0


def _setup(shift=9, depth_m=10.0):
    rng = np.random.RandomState(7)
    tex = rng.rand(H, W + 64, 3).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.2)

    def frame(s):
        return np.roll(tex, s, axis=1)[:, :W]

    K = np.array([[FX, 0, (W - 1) / 2], [0, FX, (H - 1) / 2],
                  [0, 0, 1]], np.float32)[None]
    tx = shift * depth_m / FX
    return (jnp.asarray(frame(0))[None], jnp.asarray(frame(shift))[None],
            jnp.asarray(K), tx, depth_m)


def test_exact_pose_gives_zero_residual():
    cur, prev, K, tx, d = _setup()
    depth = jnp.full((1, H, W, 1), d, jnp.float32)
    cam = Camera(K=K)
    vec = jnp.asarray([[tx, 0, 0, 0, 0, 0]], jnp.float32)
    ref_cam = Camera(K=K, Tcw=Pose.from_vec(vec))
    warped = view_synthesis(prev, depth, ref_cam, cam)
    r = np.abs(np.asarray(warped - cur))[:, 8:-8, 16:-16]
    assert r.mean() < 1e-4

    # wrong sign must NOT align
    ref_bad = Camera(K=K, Tcw=Pose.from_vec(-vec))
    warped_bad = view_synthesis(prev, depth, ref_bad, cam)
    r_bad = np.abs(np.asarray(warped_bad - cur))[:, 8:-8, 16:-16]
    assert r_bad.mean() > 10 * r.mean()


def test_photometric_loss_minimized_at_true_pose():
    cur, prev, K, tx, d = _setup()
    inv_depth = jnp.full((1, H, W, 1), 1.0 / d, jnp.float32)

    def loss_at(t):
        poses = jnp.asarray([[[t, 0, 0, 0, 0, 0]] * 2], jnp.float32)
        out = multi_view_photometric_loss(
            [inv_depth], poses, K, cur, [prev, prev],
            automask_loss=False, photometric_reduce_op="min",
        )
        return out["loss_photometric"]

    l_true = float(loss_at(tx))
    l_zero = float(loss_at(0.0))
    l_neg = float(loss_at(-tx))
    assert l_true < 0.25 * l_zero
    assert l_true < 0.25 * l_neg

    # gradient at zero translation points toward the true pose
    g = float(jax.grad(loss_at)(0.0))
    assert g * tx < 0  # descending from 0 toward +tx means negative grad


def test_depth_gradient_direction():
    """With the true pose fixed, the loss decreases toward the true depth."""
    cur, prev, K, tx, d = _setup()
    poses = jnp.asarray([[[tx, 0, 0, 0, 0, 0]] * 2], jnp.float32)

    def loss_at_depth(dd):
        inv = jnp.full((1, H, W, 1), 1.0 / dd, jnp.float32)
        return multi_view_photometric_loss(
            [inv], poses, K, cur, [prev, prev],
            automask_loss=False, photometric_reduce_op="min",
        )["loss_photometric"]

    assert float(loss_at_depth(d)) < 0.5 * float(loss_at_depth(2 * d))
    assert float(loss_at_depth(d)) < 0.5 * float(loss_at_depth(0.5 * d))
