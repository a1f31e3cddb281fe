"""Golden loss + gradient parity ladder vs the torch transcription of the
reference losses (tests/torch_losses.py).

Every jax loss in mgnet_tpu.losses (and the uncertainty block in
mgnet_tpu.train.step) is compared END TO END against the reference math —
values to <=1e-4 relative and input gradients to <=1e-3 cosine distance —
on random fixtures. This is the accuracy-parity surface that module-level
activation parity (test_torch_parity.py) cannot see: reduction order,
masking, automask candidate stacking, per-scale weights, and log_vars
indexing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import tests.torch_losses as tl
from mgnet_tpu.losses import (
    center_loss,
    deeplab_ce_loss,
    multi_view_photometric_loss,
    offset_loss,
    ohem_ce_loss,
)
from mgnet_tpu.train.step import apply_uncertainty

RNG = np.random.RandomState(7)


def cosine_dist(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64).ravel()
    b = b.astype(np.float64).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 0.0 if np.allclose(a, b) else 1.0
    return float(1.0 - np.dot(a, b) / denom)


def rel_err(a: float, b: float) -> float:
    return abs(a - b) / max(abs(b), 1e-12)


# ---------------------------------------------------------------------------
# Segmentation losses
# ---------------------------------------------------------------------------


class TestSegGolden:
    def _fixture(self, b=2, h=48, w=64, c=20):
        logits = (RNG.randn(b, c, h, w) * 2.5).astype(np.float32)
        labels = RNG.randint(0, c, (b, h, w)).astype(np.int64)
        labels[labels == 5] = 255
        weights = np.ones((b, h, w), np.float32)
        weights[labels == 2] = 3.0  # small-instance x3 weighting analog
        return logits, labels, weights

    @pytest.mark.parametrize("n_min", [100, 1500])
    def test_ohem_value_and_grad(self, n_min):
        logits, labels, weights = self._fixture()

        t_logits = torch.from_numpy(logits).requires_grad_(True)
        t_loss = tl.ohem_ce(t_logits, torch.from_numpy(labels),
                            torch.from_numpy(weights), 255, 0.7, n_min)
        t_loss.backward()

        j_logits = jnp.asarray(logits.transpose(0, 2, 3, 1))

        def f(lg):
            return ohem_ce_loss(lg, jnp.asarray(labels),
                                jnp.asarray(weights), ignore_label=255,
                                ohem_threshold=0.7, n_min=n_min)

        j_loss, j_grad = jax.value_and_grad(f)(j_logits)
        assert rel_err(float(j_loss), float(t_loss)) <= 1e-4
        g_t = t_logits.grad.numpy().transpose(0, 2, 3, 1)
        assert cosine_dist(np.asarray(j_grad), g_t) <= 1e-3

    @pytest.mark.slow
    def test_ohem_production_n_min_full_res(self):
        """Production shape: one 1024x1024 crop, n_min = 262143
        (reference configs/MGNet-Cityscapes-Fine.yaml:21)."""
        b, h, w, c = 1, 1024, 1024, 20
        rng = np.random.RandomState(3)
        logits = (rng.randn(b, c, h, w) * 2.0).astype(np.float32)
        labels = rng.randint(0, c, (b, h, w)).astype(np.int64)
        labels[labels == 7] = 255
        weights = np.ones((b, h, w), np.float32)
        weights[labels == 1] = 3.0

        t_loss = tl.ohem_ce(torch.from_numpy(logits),
                            torch.from_numpy(labels),
                            torch.from_numpy(weights), 255, 0.7, 262143)
        j_loss = ohem_ce_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels),
            jnp.asarray(weights), ignore_label=255, ohem_threshold=0.7,
            n_min=262143)
        assert rel_err(float(j_loss), float(t_loss)) <= 1e-4

    def test_deeplab_value_and_grad(self):
        logits, labels, weights = self._fixture()
        t_logits = torch.from_numpy(logits).requires_grad_(True)
        t_loss = tl.deeplab_ce(t_logits, torch.from_numpy(labels),
                               torch.from_numpy(weights), 255, 0.2)
        t_loss.backward()

        def f(lg):
            return deeplab_ce_loss(lg, jnp.asarray(labels),
                                   jnp.asarray(weights), ignore_label=255,
                                   top_k_percent=0.2)

        j_loss, j_grad = jax.value_and_grad(f)(
            jnp.asarray(logits.transpose(0, 2, 3, 1)))
        assert rel_err(float(j_loss), float(t_loss)) <= 1e-4
        g_t = t_logits.grad.numpy().transpose(0, 2, 3, 1)
        assert cosine_dist(np.asarray(j_grad), g_t) <= 1e-3


class TestCenterOffsetGolden:
    def test_value_and_grad(self):
        b, h, w = 2, 32, 40
        cp = RNG.rand(b, 1, h, w).astype(np.float32)
        ct = RNG.rand(b, 1, h, w).astype(np.float32)
        cw = (RNG.rand(b, 1, h, w) > 0.6).astype(np.float32)
        op = (RNG.randn(b, 2, h, w) * 4).astype(np.float32)
        ot = (RNG.randn(b, 2, h, w) * 4).astype(np.float32)
        ow = (RNG.rand(b, 1, h, w) > 0.5).astype(np.float32)

        t_cp = torch.from_numpy(cp).requires_grad_(True)
        t_op = torch.from_numpy(op).requires_grad_(True)
        t_losses = tl.center_offset_losses(
            t_cp, torch.from_numpy(ct), torch.from_numpy(cw),
            t_op, torch.from_numpy(ot), torch.from_numpy(ow),
            center_loss_weight=200.0, offset_loss_weight=0.01)
        (t_losses["loss_center"] + t_losses["loss_offset"]).backward()

        def f(c_pred, o_pred):
            lc = center_loss(c_pred, jnp.asarray(ct.transpose(0, 2, 3, 1)),
                             jnp.asarray(cw.transpose(0, 2, 3, 1))) * 200.0
            lo = offset_loss(o_pred, jnp.asarray(ot.transpose(0, 2, 3, 1)),
                             jnp.asarray(ow.transpose(0, 2, 3, 1))) * 0.01
            return lc + lo, (lc, lo)

        (total, (lc, lo)), grads = jax.value_and_grad(f, argnums=(0, 1),
                                                      has_aux=True)(
            jnp.asarray(cp.transpose(0, 2, 3, 1)),
            jnp.asarray(op.transpose(0, 2, 3, 1)))
        assert rel_err(float(lc), float(t_losses["loss_center"])) <= 1e-4
        assert rel_err(float(lo), float(t_losses["loss_offset"])) <= 1e-4
        np.testing.assert_allclose(
            np.asarray(grads[0]), t_cp.grad.numpy().transpose(0, 2, 3, 1),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(grads[1]), t_op.grad.numpy().transpose(0, 2, 3, 1),
            atol=1e-8)


# ---------------------------------------------------------------------------
# Multi-view photometric loss, end to end
# ---------------------------------------------------------------------------


def _photo_fixture(b=1, h=40, w=56, scales=1, seed=11):
    """Random but well-conditioned fixture: smooth-ish images, inverse depth
    away from 0/2, PoseCNN-magnitude (0.01x) pose vectors so warps stay
    mostly in-bounds and no coordinate lands exactly on a pixel center
    (where the bilinear subgradient convention is ambiguous)."""
    rng = np.random.RandomState(seed)

    def smooth_img():
        base = rng.rand(b, h // 4, w // 4, 3).astype(np.float32)
        t = torch.from_numpy(base).permute(0, 3, 1, 2)
        t = torch.nn.functional.interpolate(
            t, size=(h, w), mode="bilinear", align_corners=False)
        return np.ascontiguousarray(t.permute(0, 2, 3, 1).numpy())

    image = smooth_img()
    contexts = [smooth_img(), smooth_img()]
    K = np.array([[0.9 * w, 0, (w - 1) / 2],
                  [0, 0.9 * w, (h - 1) / 2],
                  [0, 0, 1]], np.float32)
    K = np.broadcast_to(K, (b, 3, 3)).copy()
    inv_depths = [
        (0.3 + 0.4 * rng.rand(b, h, w, 1)).astype(np.float32)
        for _ in range(scales)
    ]
    poses = (0.01 * rng.randn(b, 2, 6)).astype(np.float32)
    mask = np.ones((b, h, w, 1), np.float32)
    mask[:, : h // 5] = 0.0  # padded-region analog
    return image, contexts, K, inv_depths, poses, mask


@pytest.mark.parametrize("scales", [1, 3])
@pytest.mark.parametrize("automask", [True, False])
@pytest.mark.parametrize("masked", [True, False])
def test_photometric_golden(scales, automask, masked):
    image, contexts, K, inv_depths, poses, mask = _photo_fixture(
        scales=scales, seed=13 + scales)
    kwargs = dict(
        ssim_loss_weight=0.85, photometric_loss_weight=1.0,
        smoothing_loss_weight=0.001, automask_loss=automask,
        photometric_reduce_op="min", padding_mode="zeros",
    )

    # torch side (NCHW), with input gradients
    t_invs = [torch.from_numpy(d.transpose(0, 3, 1, 2)).requires_grad_(True)
              for d in inv_depths]
    t_poses = torch.from_numpy(poses).requires_grad_(True)
    t_out = tl.multi_view_photometric_loss(
        t_invs, t_poses, torch.from_numpy(K),
        torch.from_numpy(image.transpose(0, 3, 1, 2)),
        [torch.from_numpy(c.transpose(0, 3, 1, 2)) for c in contexts],
        torch.from_numpy(mask.transpose(0, 3, 1, 2)) if masked else None,
        **kwargs)
    (t_out["loss_photometric"] + t_out["loss_smoothness"]).backward()

    # jax side (NHWC)
    def f(invs, pv):
        out = multi_view_photometric_loss(
            list(invs), pv, jnp.asarray(K), jnp.asarray(image),
            [jnp.asarray(c) for c in contexts],
            jnp.asarray(mask) if masked else None, **kwargs)
        return out["loss_photometric"] + out["loss_smoothness"], out

    (total, j_out), (g_invs, g_poses) = jax.value_and_grad(
        f, argnums=(0, 1), has_aux=True)(
        tuple(jnp.asarray(d) for d in inv_depths), jnp.asarray(poses))

    assert rel_err(float(j_out["loss_photometric"]),
                   float(t_out["loss_photometric"])) <= 1e-4
    assert rel_err(float(j_out["loss_smoothness"]),
                   float(t_out["loss_smoothness"])) <= 1e-4

    for i in range(scales):
        g_t = t_invs[i].grad.numpy().transpose(0, 2, 3, 1)
        assert cosine_dist(np.asarray(g_invs[i]), g_t) <= 1e-3, f"scale {i}"
        assert rel_err(float(np.linalg.norm(np.asarray(g_invs[i]))),
                       float(np.linalg.norm(g_t))) <= 1e-3, f"scale {i}"
    g_pt = t_poses.grad.numpy()
    assert cosine_dist(np.asarray(g_poses), g_pt) <= 1e-3
    assert rel_err(float(np.linalg.norm(np.asarray(g_poses))),
                   float(np.linalg.norm(g_pt))) <= 1e-3


def test_photometric_reduce_mean_golden():
    """The 'mean' reduction path (automask off)."""
    image, contexts, K, inv_depths, poses, mask = _photo_fixture(seed=29)
    kwargs = dict(ssim_loss_weight=0.85, photometric_loss_weight=1.0,
                  smoothing_loss_weight=0.001, automask_loss=False,
                  photometric_reduce_op="mean", padding_mode="zeros")
    t_out = tl.multi_view_photometric_loss(
        [torch.from_numpy(d.transpose(0, 3, 1, 2)) for d in inv_depths],
        torch.from_numpy(poses), torch.from_numpy(K),
        torch.from_numpy(image.transpose(0, 3, 1, 2)),
        [torch.from_numpy(c.transpose(0, 3, 1, 2)) for c in contexts],
        torch.from_numpy(mask.transpose(0, 3, 1, 2)), **kwargs)
    j_out = multi_view_photometric_loss(
        [jnp.asarray(d) for d in inv_depths], jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(image),
        [jnp.asarray(c) for c in contexts], jnp.asarray(mask), **kwargs)
    assert rel_err(float(j_out["loss_photometric"]),
                   float(t_out["loss_photometric"])) <= 1e-4


# ---------------------------------------------------------------------------
# Uncertainty weighting: values, gradients, and log_vars index order
# ---------------------------------------------------------------------------


class TestUncertaintyGolden:
    KEYS = ["loss_sem_seg", "loss_center", "loss_offset",
            "loss_photometric", "loss_smoothness"]

    def test_value_and_index_order(self):
        vals = (0.5 + RNG.rand(5)).astype(np.float32)
        log_vars = (0.3 * RNG.randn(5)).astype(np.float32)

        t_losses = {k: torch.tensor(v) for k, v in zip(self.KEYS, vals)}
        t_out = tl.apply_uncertainty(t_losses, torch.from_numpy(log_vars))

        j_losses = {k: jnp.asarray(v) for k, v in zip(self.KEYS, vals)}
        j_out, _ = apply_uncertainty(j_losses, jnp.asarray(log_vars))

        assert list(j_out.keys()) == self.KEYS
        for k in self.KEYS:
            assert rel_err(float(j_out[k]), float(t_out[k])) <= 1e-6, k

    def test_index_order_is_load_bearing(self):
        """Shuffled log_vars must change the result — guards against the
        weighting silently ignoring the index pairing."""
        vals = (0.5 + RNG.rand(5)).astype(np.float32)
        log_vars = np.arange(5, dtype=np.float32) * 0.2
        j_losses = {k: jnp.asarray(v) for k, v in zip(self.KEYS, vals)}
        a, _ = apply_uncertainty(j_losses, jnp.asarray(log_vars))
        b, _ = apply_uncertainty(j_losses, jnp.asarray(log_vars[::-1].copy()))
        assert float(a["loss_sem_seg"]) != float(b["loss_sem_seg"])

    def test_log_vars_gradient(self):
        vals = (0.5 + RNG.rand(5)).astype(np.float32)
        log_vars = (0.3 * RNG.randn(5)).astype(np.float32)

        t_lv = torch.from_numpy(log_vars).requires_grad_(True)
        t_losses = {k: torch.tensor(v) for k, v in zip(self.KEYS, vals)}
        sum(tl.apply_uncertainty(t_losses, t_lv).values()).backward()

        def f(lv):
            j_losses = {k: jnp.asarray(v) for k, v in zip(self.KEYS, vals)}
            out, _ = apply_uncertainty(j_losses, lv)
            return sum(out.values())

        g = jax.grad(f)(jnp.asarray(log_vars))
        np.testing.assert_allclose(np.asarray(g), t_lv.grad.numpy(),
                                   atol=1e-6)
