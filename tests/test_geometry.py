"""Geometry library unit tests.

Closed-form invariants (SURVEY.md §4): project∘reconstruct = id,
pose inverse, K·Kinv = I; plus parity checks against torch CPU for
grid_sample and bilinear/nearest interpolation semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mgnet_tpu.geometry import (
    Camera,
    Pose,
    euler2mat,
    grid_sample,
    image_grid,
    interpolate_bilinear,
    interpolate_nearest,
    inv2depth,
    invert_pose,
    scale_intrinsics,
    view_synthesis,
)

RNG = np.random.RandomState(0)


def make_K(b=2, fx=200.0, fy=210.0, cx=63.5, cy=47.5):
    K = np.zeros((b, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2] = cx, cy
    K[:, 2, 2] = 1.0
    return jnp.asarray(K)


class TestPose:
    def test_euler2mat_orthonormal(self):
        angles = jnp.asarray(RNG.uniform(-0.5, 0.5, (4, 3)).astype(np.float32))
        R = euler2mat(angles)
        eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        np.testing.assert_allclose(R @ jnp.swapaxes(R, 1, 2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_euler2mat_matches_torch_reference_composition(self):
        # Rx @ Ry @ Rz composition as in the reference pose_utils.py
        a = np.array([[0.1, -0.2, 0.3]], np.float32)
        R = np.asarray(euler2mat(jnp.asarray(a)))[0]
        cx, sx = np.cos(0.1), np.sin(0.1)
        cy, sy = np.cos(-0.2), np.sin(-0.2)
        cz, sz = np.cos(0.3), np.sin(0.3)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        np.testing.assert_allclose(R, Rx @ Ry @ Rz, atol=1e-6)

    def test_pose_inverse(self):
        vec = jnp.asarray(RNG.uniform(-0.3, 0.3, (3, 6)).astype(np.float32))
        p = Pose.from_vec(vec)
        ident = p.transform_pose(p.inverse()).mat
        np.testing.assert_allclose(
            ident, np.broadcast_to(np.eye(4), (3, 4, 4)), atol=1e-5
        )

    def test_invert_pose_closed_form(self):
        vec = jnp.asarray(RNG.uniform(-0.3, 0.3, (2, 6)).astype(np.float32))
        mat = Pose.from_vec(vec).mat
        np.testing.assert_allclose(
            np.asarray(invert_pose(mat)), np.linalg.inv(np.asarray(mat)), atol=1e-5
        )

    def test_transform_points_roundtrip(self):
        vec = jnp.asarray(RNG.uniform(-0.3, 0.3, (2, 6)).astype(np.float32))
        p = Pose.from_vec(vec)
        pts = jnp.asarray(RNG.uniform(-5, 5, (2, 4, 6, 3)).astype(np.float32))
        back = p.inverse() @ (p @ pts)
        np.testing.assert_allclose(back, pts, atol=1e-4)


class TestCamera:
    def test_K_Kinv_identity(self):
        cam = Camera(make_K())
        prod = cam.K @ cam.Kinv
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5
        )

    def test_project_reconstruct_identity(self):
        """Projecting reconstructed points must recover the pixel grid."""
        b, h, w = 2, 24, 32
        cam = Camera(make_K(b, cx=(w - 1) / 2, cy=(h - 1) / 2))
        depth = jnp.asarray(RNG.uniform(2.0, 20.0, (b, h, w, 1)).astype(np.float32))
        points = cam.reconstruct(depth, frame="w")
        coords = cam.project(points, frame="w")  # normalized [-1, 1]
        grid = image_grid(b, h, w)
        exp_x = 2 * grid[..., 0] / (w - 1) - 1
        exp_y = 2 * grid[..., 1] / (h - 1) - 1
        np.testing.assert_allclose(coords[..., 0], exp_x, atol=1e-4)
        np.testing.assert_allclose(coords[..., 1], exp_y, atol=1e-4)

    def test_scale_intrinsics_pixel_center(self):
        K = make_K(1, fx=100.0, fy=100.0, cx=49.5, cy=49.5)
        K2 = scale_intrinsics(K, 0.5, 0.5)
        assert np.isclose(K2[0, 0, 0], 50.0)
        assert np.isclose(K2[0, 0, 2], (49.5 + 0.5) * 0.5 - 0.5)

    def test_identity_warp(self):
        """view_synthesis with identity pose returns the image itself."""
        b, h, w = 1, 16, 20
        cam = Camera(make_K(b, cx=(w - 1) / 2, cy=(h - 1) / 2))
        img = jnp.asarray(RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        depth = jnp.full((b, h, w, 1), 5.0, jnp.float32)
        warped = view_synthesis(img, depth, cam, cam)
        np.testing.assert_allclose(warped, img, atol=1e-4)

    def test_warp_with_nonidentity_target_pose(self):
        """view_synthesis must fold the target camera's pose (cam.Twc) in.

        Matches the reference composition cam.reconstruct(frame='w') ->
        ref_cam.project(frame='w') (camera_utils.py:24-54). If the two
        cameras carry the SAME non-identity world pose, the relative
        transform is identity and the warp must return the image —
        this fails if the target pose is silently dropped.
        """
        b, h, w = 1, 16, 20
        K = make_K(b, cx=(w - 1) / 2, cy=(h - 1) / 2)
        # a non-trivial rigid transform shared by both cameras
        vec = jnp.asarray([[0.2, -0.1, 0.3, 0.05, -0.04, 0.03]], jnp.float32)
        pose = Pose.from_vec(vec)
        cam = Camera(K, Tcw=pose)
        ref_cam = Camera(K, Tcw=pose)
        img = jnp.asarray(RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        depth = jnp.full((b, h, w, 1), 5.0, jnp.float32)
        warped = view_synthesis(img, depth, ref_cam, cam)
        np.testing.assert_allclose(warped, img, atol=1e-4)

    def test_warp_matches_reconstruct_project_composition(self):
        """Planar view_synthesis == reconstruct(w) -> project(w) -> sample."""
        from mgnet_tpu.geometry.image import grid_sample

        b, h, w = 2, 16, 20
        K = make_K(b, cx=(w - 1) / 2, cy=(h - 1) / 2)
        cam_pose = Pose.from_vec(
            jnp.asarray([[0.1, 0.0, -0.2, 0.02, 0.01, -0.03],
                         [0.0, 0.2, 0.1, -0.01, 0.02, 0.00]], jnp.float32))
        ref_pose = Pose.from_vec(
            jnp.asarray([[-0.1, 0.05, 0.3, 0.01, -0.02, 0.02],
                         [0.2, -0.1, 0.0, 0.00, 0.01, 0.01]], jnp.float32))
        cam = Camera(K, Tcw=cam_pose)
        ref_cam = Camera(K, Tcw=ref_pose)
        img = jnp.asarray(RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        depth = jnp.asarray(RNG.uniform(3.0, 10.0, (b, h, w, 1)).astype(np.float32))
        expected = grid_sample(
            img, ref_cam.project(cam.reconstruct(depth, frame="w"), frame="w"))
        got = view_synthesis(img, depth, ref_cam, cam)
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestGridSample:
    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_matches_torch(self, padding_mode):
        b, h, w, c = 2, 12, 17, 3
        img = RNG.uniform(0, 1, (b, h, w, c)).astype(np.float32)
        coords = RNG.uniform(-1.3, 1.3, (b, 9, 11, 2)).astype(np.float32)

        ours = grid_sample(
            jnp.asarray(img), jnp.asarray(coords), padding_mode=padding_mode
        )
        theirs = F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(coords),
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_grad_flows(self):
        img = jnp.asarray(RNG.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32))
        coords = jnp.asarray(RNG.uniform(-0.9, 0.9, (1, 4, 4, 2)).astype(np.float32))
        g = jax.grad(lambda c: jnp.sum(grid_sample(img, c)))(coords)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_custom_vjp_coords_grad_matches_torch(self, padding_mode):
        """The gather-free custom backward (gx/gy fields saved in the
        forward) must reproduce torch autograd's grid cotangent, incl.
        out-of-range corners under zeros padding."""
        b, h, w, c = 2, 10, 13, 3
        img = RNG.uniform(0, 1, (b, h, w, c)).astype(np.float32)
        coords = RNG.uniform(-1.2, 1.2, (b, 6, 7, 2)).astype(np.float32)
        # weighted sum so the upstream cotangent is non-trivial
        wgt = RNG.uniform(0.5, 1.5, (b, 6, 7, c)).astype(np.float32)

        g_ours = jax.grad(
            lambda cc: jnp.sum(grid_sample(
                jnp.asarray(img), cc, padding_mode=padding_mode)
                * jnp.asarray(wgt))
        )(jnp.asarray(coords))

        tg = torch.from_numpy(coords).requires_grad_(True)
        out_t = F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2), tg,
            mode="bilinear", padding_mode=padding_mode,
            align_corners=True,
        ).permute(0, 2, 3, 1)
        (out_t * torch.from_numpy(wgt)).sum().backward()
        np.testing.assert_allclose(
            np.asarray(g_ours), tg.grad.numpy(), atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_custom_vjp_image_grad_matches_torch(self, padding_mode):
        """The scatter-add image cotangent (used only when a caller
        differentiates w.r.t. the sampled image) matches torch."""
        b, h, w, c = 2, 9, 11, 2
        img = RNG.uniform(0, 1, (b, h, w, c)).astype(np.float32)
        coords = RNG.uniform(-1.2, 1.2, (b, 5, 6, 2)).astype(np.float32)
        wgt = RNG.uniform(0.5, 1.5, (b, 5, 6, c)).astype(np.float32)

        g_ours = jax.grad(
            lambda im: jnp.sum(grid_sample(
                im, jnp.asarray(coords), padding_mode=padding_mode)
                * jnp.asarray(wgt))
        )(jnp.asarray(img))

        ti = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
        out_t = F.grid_sample(
            ti, torch.from_numpy(coords), mode="bilinear",
            padding_mode=padding_mode, align_corners=True,
        ).permute(0, 2, 3, 1)
        (out_t * torch.from_numpy(wgt)).sum().backward()
        np.testing.assert_allclose(
            np.asarray(g_ours), ti.grad.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=1e-4)


class TestInterpolate:
    @pytest.mark.parametrize("size", [(16, 24), (7, 9), (24, 20)])
    def test_bilinear_matches_torch(self, size):
        x = RNG.uniform(0, 1, (2, 12, 10, 4)).astype(np.float32)
        ours = interpolate_bilinear(jnp.asarray(x), size)
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=size, mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    @pytest.mark.parametrize("size", [(24, 20), (6, 5), (13, 17)])
    def test_nearest_matches_torch(self, size):
        x = RNG.uniform(0, 1, (2, 12, 10, 4)).astype(np.float32)
        ours = interpolate_nearest(jnp.asarray(x), size)
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=0)


def test_inv2depth():
    d = inv2depth(jnp.asarray([[0.5, 2.0, 0.0]]))
    np.testing.assert_allclose(d, [[2.0, 0.5, 1e6]], rtol=1e-5)
    lst = inv2depth([jnp.asarray([0.5]), jnp.asarray([4.0])])
    assert isinstance(lst, list) and np.isclose(lst[1], 0.25)
