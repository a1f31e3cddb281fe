"""Loss unit tests: OHEM vs exact sort-based reference semantics, SSIM
parity/bounds, automask min-reduction behavior, weighted center/offset."""

import jax.numpy as jnp
import numpy as np
import pytest

from mgnet_tpu.losses import (
    center_loss,
    cross_entropy_loss,
    deeplab_ce_loss,
    multi_view_photometric_loss,
    offset_loss,
    ohem_ce_loss,
    ssim,
)

RNG = np.random.RandomState(1)


def np_softmax_ce(logits, labels, ignore=255):
    """Exact per-pixel CE in numpy (reference torch semantics)."""
    x = logits.astype(np.float64)
    x = x - x.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    valid = labels != ignore
    safe = np.where(valid, labels, 0)
    ce = -np.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return np.where(valid, ce, 0.0), valid


def np_ohem(logits, labels, weights, ignore, threshold, n_min):
    """Exact reference OhemCE (loss.py:45-81) in numpy."""
    ce, _ = np_softmax_ce(logits, labels, ignore)
    if weights is not None:
        ce = ce * weights
    flat = np.sort(ce.reshape(-1))[::-1]
    n_min = min(n_min, flat.size - 1)
    th = -np.log(threshold)
    if flat[n_min] > th:
        kept = flat[flat > th]
    else:
        kept = flat[:n_min]
    return kept.mean()


class TestOhem:
    @pytest.mark.parametrize("n_min", [50, 500, 2000])
    def test_matches_exact_sort(self, n_min):
        b, h, w, c = 2, 24, 32, 7
        logits = RNG.randn(b, h, w, c).astype(np.float32) * 3
        labels = RNG.randint(0, c, (b, h, w))
        labels[labels == 3] = 255  # some ignore pixels
        weights = np.ones((b, h, w), np.float32)
        weights[labels == 1] = 3.0

        exact = np_ohem(logits, labels, weights, 255, 0.7, n_min)
        ours = ohem_ce_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights),
            ignore_label=255, ohem_threshold=0.7, n_min=n_min,
        )
        np.testing.assert_allclose(float(ours), exact, rtol=2e-3)

    def test_deeplab_topk(self):
        b, h, w, c = 1, 16, 16, 5
        logits = RNG.randn(b, h, w, c).astype(np.float32)
        labels = RNG.randint(0, c, (b, h, w))
        ce, _ = np_softmax_ce(logits, labels)
        flat = np.sort(ce.reshape(-1))[::-1]
        k = int(0.2 * flat.size)
        exact = flat[:k].mean()
        ours = deeplab_ce_loss(
            jnp.asarray(logits), jnp.asarray(labels), top_k_percent=0.2
        )
        np.testing.assert_allclose(float(ours), exact, rtol=2e-3)

    def test_plain_ce_ignores(self):
        logits = jnp.asarray(RNG.randn(1, 4, 4, 3).astype(np.float32))
        labels = np.zeros((1, 4, 4), np.int32)
        labels[0, 0, :] = 255
        ce, valid = np_softmax_ce(np.asarray(logits), labels)
        exact = ce[valid].mean()
        ours = cross_entropy_loss(logits, jnp.asarray(labels))
        np.testing.assert_allclose(float(ours), exact, rtol=1e-5)


class TestCenterOffset:
    def test_center_weighted_mse(self):
        pred = jnp.asarray(RNG.rand(2, 8, 8, 1).astype(np.float32))
        tgt = jnp.asarray(RNG.rand(2, 8, 8, 1).astype(np.float32))
        wts = jnp.asarray((RNG.rand(2, 8, 8, 1) > 0.5).astype(np.float32))
        ours = center_loss(pred, tgt, wts)
        exact = (np.asarray((pred - tgt) ** 2) * np.asarray(wts)).sum() / np.asarray(wts).sum()
        np.testing.assert_allclose(float(ours), exact, rtol=1e-5)

    def test_offset_weight_broadcast_not_doubled(self):
        """[B,H,W,1] weights broadcast to 2 channels; denom stays single."""
        pred = jnp.ones((1, 4, 4, 2), jnp.float32) * 2.0
        tgt = jnp.zeros((1, 4, 4, 2), jnp.float32)
        wts = jnp.ones((1, 4, 4, 1), jnp.float32)
        # |2-0| * w summed over 2 ch = 2*2*16 = 64; wsum = 16 -> 4.0
        np.testing.assert_allclose(float(offset_loss(pred, tgt, wts)), 4.0)

    def test_zero_weights(self):
        pred = jnp.ones((1, 4, 4, 1))
        tgt = jnp.zeros((1, 4, 4, 1))
        wts = jnp.zeros((1, 4, 4, 1))
        assert float(center_loss(pred, tgt, wts)) == 0.0


class TestSSIM:
    def test_identical_is_zero(self):
        x = jnp.asarray(RNG.rand(1, 12, 12, 3).astype(np.float32))
        np.testing.assert_allclose(np.asarray(ssim(x, x)), 0.0, atol=1e-5)

    def test_bounds(self):
        x = jnp.asarray(RNG.rand(2, 16, 16, 3).astype(np.float32))
        y = jnp.asarray(RNG.rand(2, 16, 16, 3).astype(np.float32))
        s = np.asarray(ssim(x, y))
        assert (s >= 0).all() and (s <= 1).all()

    def test_matches_torch_formulation(self):
        import torch
        import torch.nn.functional as F

        def torch_ssim(x, y, c1=1e-4, c2=9e-4):
            x = F.pad(x, [1, 1, 1, 1], "reflect")
            y = F.pad(y, [1, 1, 1, 1], "reflect")
            mu_x, mu_y = F.avg_pool2d(x, 3, 1), F.avg_pool2d(y, 3, 1)
            sx = F.avg_pool2d(x ** 2, 3, 1) - mu_x ** 2
            sy = F.avg_pool2d(y ** 2, 3, 1) - mu_y ** 2
            sxy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
            v = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
                (mu_x ** 2 + mu_y ** 2 + c1) * (sx + sy + c2))
            return torch.clamp((1 - v) / 2, 0, 1)

        x = RNG.rand(2, 10, 14, 3).astype(np.float32)
        y = (x + RNG.randn(2, 10, 14, 3) * 0.1).astype(np.float32)
        ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
        theirs = torch_ssim(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestPhotometric:
    def _setup(self, b=1, h=32, w=40):
        K = np.array([[40.0, 0, (w - 1) / 2], [0, 40.0, (h - 1) / 2],
                      [0, 0, 1]], np.float32)
        K = np.broadcast_to(K, (b, 3, 3)).copy()
        img = RNG.rand(b, h, w, 3).astype(np.float32)
        inv_depth = np.full((b, h, w, 1), 0.2, np.float32)
        return jnp.asarray(K), jnp.asarray(img), jnp.asarray(inv_depth)

    def test_static_scene_identity_pose_near_zero(self):
        """Identical frames + identity poses: photometric loss ~ 0."""
        K, img, inv_depth = self._setup()
        poses = jnp.zeros((1, 2, 6), jnp.float32)
        out = multi_view_photometric_loss(
            [inv_depth], poses, K, img, [img, img],
            smoothing_loss_weight=0.001,
        )
        assert float(out["loss_photometric"]) < 1e-4

    def test_automask_bounds_loss_by_unwarped(self):
        """With automask, the min-reduced loss cannot exceed the unwarped
        residual (reference loss.py:139-144 semantics)."""
        K, img, inv_depth = self._setup()
        ctx = jnp.asarray(RNG.rand(1, 32, 40, 3).astype(np.float32))
        # Large wrong pose -> warped loss big; automask should cap it.
        poses = jnp.asarray(np.array([[[5, 5, 5, 1, 1, 1]] * 2], np.float32))
        with_am = multi_view_photometric_loss(
            [inv_depth], poses, K, img, [ctx, ctx], automask_loss=True)
        without = multi_view_photometric_loss(
            [inv_depth], poses, K, img, [ctx, ctx], automask_loss=False)
        assert float(with_am["loss_photometric"]) <= float(
            without["loss_photometric"]) + 1e-6

    def test_constant_inv_depth_zero_smoothness(self):
        K, img, inv_depth = self._setup()
        poses = jnp.zeros((1, 2, 6), jnp.float32)
        out = multi_view_photometric_loss(
            [inv_depth], poses, K, img, [img, img])
        np.testing.assert_allclose(float(out["loss_smoothness"]), 0.0, atol=1e-7)

    def test_mask_excludes_regions(self):
        K, img, inv_depth = self._setup()
        ctx = jnp.asarray(RNG.rand(1, 32, 40, 3).astype(np.float32))
        poses = jnp.zeros((1, 2, 6), jnp.float32)
        full = np.ones((1, 32, 40, 1), np.float32)
        half = full.copy()
        half[:, :16] = 0
        a = multi_view_photometric_loss(
            [inv_depth], poses, K, img, [ctx, ctx],
            reprojection_mask=jnp.asarray(full))
        b = multi_view_photometric_loss(
            [inv_depth], poses, K, img, [ctx, ctx],
            reprojection_mask=jnp.asarray(half))
        assert not np.isclose(float(a["loss_photometric"]),
                              float(b["loss_photometric"]))

    def test_multi_scale(self):
        K, img, inv_depth = self._setup()
        poses = jnp.zeros((1, 2, 6), jnp.float32)
        scales = [inv_depth, inv_depth * 1.1, inv_depth * 0.9]
        out = multi_view_photometric_loss(scales, poses, K, img, [img, img])
        assert np.isfinite(float(out["loss_photometric"]))
        assert np.isfinite(float(out["loss_smoothness"]))
