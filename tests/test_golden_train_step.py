"""Full train-step golden GRADIENT parity: flax model + jax losses vs the
torch mirror (tests/torch_mirror.py) + torch loss transcription
(tests/torch_losses.py), with identical grafted weights, batch-stat BN on
both sides, and the production loss assembly (OHEM + center/offset +
multi-scale photometric + homoscedastic uncertainty).

This is the one check that exercises the ENTIRE differentiable surface at
once — forward graph, loss reduction order, log_vars indexing, and the
backward pass — so a silent deviation anywhere shows up as a gradient
cosine mismatch instead of a 6-hour training-run regression."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_losses as tl
import torch_mirror as tm
from mgnet_tpu.config import get_default_config
from mgnet_tpu.models.mgnet import build_model
from mgnet_tpu.train.step import (
    apply_uncertainty,
    compute_losses,
    normalize_images,
)
from mgnet_tpu.utils.weights import flatten_params
from test_torch_parity import graft


def cosine_dist(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64).ravel()
    b = b.astype(np.float64).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 0.0 if np.allclose(a, b) else 1.0
    return float(1.0 - np.dot(a, b) / denom)


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def test_full_train_step_gradient_cosine():
    rng = np.random.RandomState(23)
    # batch 8: the pooled [B,1,1,C] BN sites normalize by an N=batch
    # variance; at batch 2 its f32 conditioning (var ~ 1e-6 vs eps 1e-5)
    # adds 1-9% per-loss gradient-norm scatter that masks real defects.
    # At batch 8 (production is 8-12) every group aligns to <=2e-3.
    b, h, w, c = 8, 64, 64, 20

    cfg = get_default_config()
    cfg.defrost()
    cfg.MODEL.COMPUTE_DTYPE = "float32"
    cfg.MODEL.DEPTH_HEAD.USE_PALLAS_WARP = False  # exact XLA path for parity
    cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = 3000
    cfg.freeze()

    # --- shared fixture -----------------------------------------------------
    # uint8-range float frames; contexts are near-copies of the current frame
    # (small shift + noise) so the automask min-reduction mixes warped and
    # unwarped candidates and gradients flow through BOTH routes.
    image = (rng.rand(b, h, w, 3) * 255).astype(np.float32)
    image_prev = np.roll(image, 2, axis=2) + rng.randn(b, h, w, 3).astype(
        np.float32) * 2.0
    image_next = np.roll(image, -2, axis=2) + rng.randn(b, h, w, 3).astype(
        np.float32) * 2.0

    labels = rng.randint(0, c, (b, h, w)).astype(np.int32)
    labels[labels == 4] = 255
    sem_weights = np.ones((b, h, w), np.float32)
    sem_weights[labels == 2] = 3.0
    center_t = rng.rand(b, h, w, 1).astype(np.float32)
    center_w = (rng.rand(b, h, w, 1) > 0.3).astype(np.float32)
    offset_t = (rng.randn(b, h, w, 2) * 5).astype(np.float32)
    offset_w = (rng.rand(b, h, w, 1) > 0.3).astype(np.float32)
    K = np.array([[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
                  [0, 0, 1]], np.float32)
    K = np.broadcast_to(K, (b, 3, 3)).copy()
    mask = np.ones((b, h, w, 1), np.float32)
    mask[:, : h // 6] = 0.0
    log_vars = (0.2 * rng.randn(5)).astype(np.float32)

    batch = {
        "image": jnp.asarray(image),
        "image_prev": jnp.asarray(image_prev),
        "image_next": jnp.asarray(image_next),
        "image_orig": jnp.asarray(image / 255.0),
        "image_prev_orig": jnp.asarray(image_prev / 255.0),
        "image_next_orig": jnp.asarray(image_next / 255.0),
        "sem_seg": jnp.asarray(labels),
        "sem_seg_weights": jnp.asarray(sem_weights),
        "center": jnp.asarray(center_t),
        "center_weights": jnp.asarray(center_w),
        "offset": jnp.asarray(offset_t),
        "offset_weights": jnp.asarray(offset_w),
        "camera_matrix": jnp.asarray(K),
        "reprojection_mask": jnp.asarray(mask),
    }

    # --- models with identical weights ---------------------------------------
    mirror = tm.MGNetMirror(msc_depth=True)
    tm.randomize_(mirror, 17)
    mirror.train()  # batch-stat BN, matching flax train=True

    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(image), jnp.asarray(image),
        jnp.asarray(image), method="forward_train")
    variables = graft(mirror.flax_weights(), variables)

    mean, std = tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD)

    # --- jax side: loss + grads (exactly train.step.loss_fn's assembly) -----
    def loss_fn(params):
        vs = {"params": params["model"],
              "batch_stats": variables["batch_stats"]}
        x = normalize_images(batch["image"], mean, std)
        outputs, _ = model.apply(
            vs, x, method=type(model).forward_train, mutable=["batch_stats"],
            image_prev=normalize_images(batch["image_prev"], mean, std),
            image_next=normalize_images(batch["image_next"], mean, std),
        )
        losses = compute_losses(cfg, outputs, batch)
        weighted, _ = apply_uncertainty(losses, params["log_vars"])
        return sum(weighted.values()), losses

    params = {"params": {"model": variables["params"],
                         "log_vars": jnp.asarray(log_vars)}}
    (j_total, j_raw), j_grads = jax.value_and_grad(
        lambda p: loss_fn(p), has_aux=True)(params["params"])

    # --- torch side ----------------------------------------------------------
    def t_norm(x):
        t = _nchw(x) / 255.0
        m = torch.tensor(mean).view(1, 3, 1, 1) / 255.0
        s = torch.tensor(std).view(1, 3, 1, 1) / 255.0
        return (t - m) / s

    t_log_vars = torch.from_numpy(log_vars.copy()).requires_grad_(True)
    outputs = mirror.forward_train(
        t_norm(image), t_norm(image_prev), t_norm(image_next))

    t_losses = {}
    t_losses["loss_sem_seg"] = tl.ohem_ce(
        outputs["sem_seg"], torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(sem_weights), 255,
        cfg.MODEL.SEM_SEG_HEAD.OHEM_THRESHOLD,
        cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN,
    ) * cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT
    t_losses.update(tl.center_offset_losses(
        outputs["center"], _nchw(center_t),
        _nchw(np.broadcast_to(center_w, center_w.shape).copy()),
        outputs["offset"], _nchw(offset_t),
        _nchw(np.broadcast_to(offset_w, offset_w.shape).copy()),
        center_loss_weight=cfg.MODEL.INS_EMBED_HEAD.CENTER_LOSS_WEIGHT,
        offset_loss_weight=cfg.MODEL.INS_EMBED_HEAD.OFFSET_LOSS_WEIGHT))
    t_losses.update(tl.multi_view_photometric_loss(
        outputs["inv_depths"], outputs["poses"], torch.from_numpy(K),
        _nchw(image / 255.0),
        [_nchw(image_prev / 255.0), _nchw(image_next / 255.0)],
        _nchw(mask),
        ssim_loss_weight=cfg.MODEL.DEPTH_HEAD.SSIM_LOSS_WEIGHT,
        photometric_loss_weight=cfg.MODEL.DEPTH_HEAD.PHOTOMETRIC_LOSS_WEIGHT,
        smoothing_loss_weight=cfg.MODEL.DEPTH_HEAD.SMOOTHING_LOSS_WEIGHT,
        automask_loss=cfg.MODEL.DEPTH_HEAD.AUTOMASK_LOSS,
        photometric_reduce_op=cfg.MODEL.DEPTH_HEAD.PHOTOMETRIC_REDUCE_OP,
        padding_mode=cfg.MODEL.DEPTH_HEAD.PADDING_MODE))
    t_weighted = tl.apply_uncertainty(t_losses, t_log_vars)
    t_total = sum(t_weighted.values())
    t_total.backward()

    # --- compare -------------------------------------------------------------
    # Insertion order of compute_losses = the uncertainty log_vars index
    # order (reference mg_net.py:351-372). j_raw's own order is useless for
    # this check — jax tree-flattens aux dicts alphabetically — so assert it
    # on an EAGER call, which is what apply_uncertainty iterates in-trace.
    eager = compute_losses(cfg, {
        "sem_seg": jnp.zeros((1, 8, 8, c)),
        "center": jnp.zeros((1, 8, 8, 1)),
        "offset": jnp.zeros((1, 8, 8, 2)),
        "inv_depths": [jnp.full((1, 8, 8, 1), 0.5)],
        "poses": jnp.zeros((1, 2, 6)),
    }, {
        "sem_seg": jnp.zeros((1, 8, 8), jnp.int32),
        "sem_seg_weights": jnp.ones((1, 8, 8)),
        "center": jnp.zeros((1, 8, 8, 1)),
        "center_weights": jnp.ones((1, 8, 8, 1)),
        "offset": jnp.zeros((1, 8, 8, 2)),
        "offset_weights": jnp.ones((1, 8, 8, 1)),
        "camera_matrix": jnp.asarray(K[:1]),
        "image_orig": jnp.zeros((1, 8, 8, 3)),
        "image_prev_orig": jnp.zeros((1, 8, 8, 3)),
        "image_next_orig": jnp.zeros((1, 8, 8, 3)),
        "reprojection_mask": jnp.ones((1, 8, 8, 1)),
    })
    assert list(eager.keys()) == list(t_losses.keys())
    assert set(j_raw.keys()) == set(t_losses.keys())
    for k in j_raw:
        jr, tr = float(j_raw[k]), float(t_losses[k])
        assert abs(jr - tr) / max(abs(tr), 1e-8) <= 1e-4, (
            f"{k}: jax {jr} vs torch {tr}")
    assert abs(float(j_total) - float(t_total)) / abs(float(t_total)) <= 1e-4

    # gradients: every parameter leaf, cosine distance <= 1e-3
    j_flat = flatten_params(j_grads["model"])
    t_flat = mirror.flax_weights(grad=True)
    assert set(j_flat) == set(t_flat), (
        sorted(set(j_flat) ^ set(t_flat))[:8])

    j_all, t_all = [], []
    for k in sorted(j_flat):
        jg, tg = np.asarray(j_flat[k]), t_flat[k]
        j_all.append(jg.ravel())
        t_all.append(tg.ravel())
        tn = np.linalg.norm(tg)
        if tn < 1e-10:  # no signal through this leaf in this fixture
            continue
        d = cosine_dist(jg, tg)
        assert d <= 1e-3, f"grad cosine drift at {k}: {d}"
        # This test CAUGHT a real one: flax's default one-pass
        # E[x^2]-E[x]^2 variance cancels catastrophically on the pooled
        # [B,1,1,C] BN sites (GCM + ARM attention) — a systematic 2.5-3.4%
        # error on every backbone gradient leaf. Fixed in models/abn.py
        # BatchNormTorch (two-pass variance at those sites + torch's
        # unbiased running-var update).
        rel = abs(np.linalg.norm(jg) - tn) / tn
        assert rel <= 5e-3, f"grad norm drift at {k}: {rel}"

    # global gradient vector: the headline numbers
    jv, tv = np.concatenate(j_all), np.concatenate(t_all)
    g_cos = cosine_dist(jv, tv)
    assert g_cos <= 1e-4, f"global gradient cosine distance {g_cos}"
    g_ratio = np.linalg.norm(jv) / np.linalg.norm(tv)
    assert abs(g_ratio - 1.0) <= 2e-3, f"global grad norm ratio {g_ratio}"

    # log_vars gradient (uncertainty block backward)
    np.testing.assert_allclose(
        np.asarray(j_grads["log_vars"]), t_log_vars.grad.numpy(), atol=1e-5)
