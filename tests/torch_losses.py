"""Torch transcription of the reference LOSS stack, for golden value- and
gradient-parity testing of mgnet_tpu.losses + train.step.apply_uncertainty.

TEST FIXTURE, not product code (companion to torch_mirror.py, which covers
the module graph): a faithful re-statement of the reference's loss math in
torch so the jax implementations can be compared end-to-end — values AND
input gradients — on random fixtures. Semantics follow (cited per item):

* reference mgnet/modeling/loss.py:9-42    (DeepLabCE)
* reference mgnet/modeling/loss.py:45-81   (OhemCE)
* reference mgnet/modeling/loss.py:84-294  (MultiViewPhotometricLoss:
  per-context warping, SSIM(3x3 avg-pool)+L1 blend, automask candidate
  stacking, min-reduce then masked mean, per-scale 1/2^i edge-aware
  smoothness on mean-normalized inverse depth)
* reference mgnet/modeling/mg_net.py:697-715 (weighted center MSE /
  offset L1 normalized by the weight sums)
* reference mgnet/modeling/mg_net.py:360-372 (homoscedastic uncertainty:
  loss_i <- tau*exp(-s_i)*loss_i + 0.5*s_i in dict-insertion order,
  tau=1.0 for loss_sem_seg else 0.5)
* reference mgnet/geometry/* (Camera.reconstruct/project, Pose.from_vec
  euler chain, view_synthesis grid_sample warp) — only the minimal slice
  the loss needs, torch-native.

Everything runs on CPU in float32 (the reference forces its loss blocks to
fp32 via @custom_fwd(cast_inputs=float32), mg_net.py:827-829).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import torch
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# Geometry slice (reference mgnet/geometry/pose_utils.py, camera.py,
# camera_utils.py, image.py — exactly the ops view_synthesis touches).
# ---------------------------------------------------------------------------


def euler2mat(angle: torch.Tensor) -> torch.Tensor:
    """XYZ euler angles [B,3] -> rotation matrices [B,3,3]
    (reference pose_utils.py:9-38: R = Rx @ Ry @ Rz)."""
    b = angle.shape[0]
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = torch.zeros_like(x)
    ones = torch.ones_like(x)

    cz, sz = torch.cos(z), torch.sin(z)
    zmat = torch.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], 1).view(b, 3, 3)
    cy, sy = torch.cos(y), torch.sin(y)
    ymat = torch.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], 1).view(b, 3, 3)
    cx, sx = torch.cos(x), torch.sin(x)
    xmat = torch.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], 1).view(b, 3, 3)
    return xmat.bmm(ymat).bmm(zmat)


def pose_vec_to_mat(vec: torch.Tensor) -> torch.Tensor:
    """[B,6] (tx,ty,tz, rx,ry,rz) -> [B,4,4] transform
    (reference pose_utils.py:41-52 + Pose.from_vec, pose.py:40-47)."""
    b = vec.shape[0]
    rot = euler2mat(vec[:, 3:])
    mat = torch.eye(4, dtype=vec.dtype).repeat(b, 1, 1)
    mat[:, :3, :3] = rot
    mat[:, :3, 3] = vec[:, :3]
    return mat


def kinv(K: torch.Tensor) -> torch.Tensor:
    """Closed-form inverse of [B,3,3] pinhole intrinsics
    (reference camera.py:73-81)."""
    out = K.clone()
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    out[:, 0, 0] = 1.0 / fx
    out[:, 1, 1] = 1.0 / fy
    out[:, 0, 2] = -K[:, 0, 2] / fx
    out[:, 1, 2] = -K[:, 1, 2] / fy
    return out


def view_synthesis(ref_image: torch.Tensor, depth: torch.Tensor,
                   K: torch.Tensor, pose_mat: torch.Tensor,
                   padding_mode: str = "zeros") -> torch.Tensor:
    """Warp ref_image [B,3,H,W] into the current frame given depth [B,1,H,W].

    Reference chain (camera_utils.py:24-54 with cam = Camera(K) [identity
    Tcw] and ref_cam = Camera(K, Tcw=pose)): world points = Kinv@grid*depth
    (camera.py:107-141 with Twc = identity), projected coords =
    normalize(K @ (pose @ X)) with z clamped at 1e-5 and [-1,1] scaling by
    (W-1, H-1) (camera.py:143-182), then bilinear grid_sample with
    align_corners=True.
    """
    b, _, h, w = depth.shape
    xs = torch.arange(w, dtype=depth.dtype)
    ys = torch.arange(h, dtype=depth.dtype)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    grid = torch.stack([gx, gy, torch.ones_like(gx)], 0)  # [3,H,W]
    flat = grid.view(3, -1).unsqueeze(0).expand(b, 3, h * w)

    rays = kinv(K).bmm(flat)                       # [B,3,HW]
    points = rays * depth.view(b, 1, h * w)        # camera==world frame

    rot, t = pose_mat[:, :3, :3], pose_mat[:, :3, 3]
    pc = rot.bmm(points) + t.unsqueeze(-1)         # ref-camera frame
    proj = K.bmm(pc)
    z = proj[:, 2].clamp(min=1e-5)
    xnorm = 2.0 * (proj[:, 0] / z) / (w - 1) - 1.0
    ynorm = 2.0 * (proj[:, 1] / z) / (h - 1) - 1.0
    coords = torch.stack([xnorm, ynorm], -1).view(b, h, w, 2)
    return F.grid_sample(ref_image, coords, mode="bilinear",
                         padding_mode=padding_mode, align_corners=True)


# ---------------------------------------------------------------------------
# Segmentation losses (reference loss.py:9-81)
# ---------------------------------------------------------------------------


def deeplab_ce(logits: torch.Tensor, labels: torch.Tensor,
               weights: Optional[torch.Tensor] = None,
               ignore_label: int = 255,
               top_k_percent: float = 1.0) -> torch.Tensor:
    """DeepLabCE (reference loss.py:30-42): per-pixel CE (optionally
    weighted), mean over the top-k% pixels. logits [B,C,H,W]."""
    pixel = F.cross_entropy(logits, labels, ignore_index=ignore_label,
                            reduction="none")
    if weights is not None:
        pixel = pixel * weights
    pixel = pixel.reshape(-1)
    if top_k_percent == 1.0:
        return pixel.mean()
    k = int(top_k_percent * pixel.numel())
    return torch.topk(pixel, k)[0].mean()


def ohem_ce(logits: torch.Tensor, labels: torch.Tensor,
            weights: Optional[torch.Tensor] = None,
            ignore_label: int = 255, ohem_threshold: float = 0.7,
            n_min: int = 100000) -> torch.Tensor:
    """OhemCE (reference loss.py:67-81): sort pixel losses descending; if
    the (n_min)-th exceeds -log(threshold) keep everything above the
    threshold, else keep the top n_min; mean."""
    pixel = F.cross_entropy(logits, labels, ignore_index=ignore_label,
                            reduction="none")
    if weights is not None:
        pixel = pixel * weights
    pixel = pixel.reshape(-1)
    srt, _ = torch.sort(pixel, descending=True)
    thresh = -torch.log(torch.tensor(ohem_threshold, dtype=torch.float32))
    if srt[n_min] > thresh:
        kept = srt[srt > thresh]
    else:
        kept = srt[:n_min]
    return kept.mean()


# ---------------------------------------------------------------------------
# Center / offset losses (reference mg_net.py:697-715)
# ---------------------------------------------------------------------------


def center_offset_losses(center_pred, center_tgt, center_weights,
                         offset_pred, offset_tgt, offset_weights,
                         center_loss_weight: float = 200.0,
                         offset_loss_weight: float = 0.01) -> Dict[str, torch.Tensor]:
    """Weighted MSE (center) + weighted L1 (offset), each normalized by its
    weight sum, scaled by the config loss weights. All NCHW."""
    lc = F.mse_loss(center_pred, center_tgt, reduction="none") * center_weights
    if center_weights.sum() > 0:
        lc = lc.sum() / center_weights.sum()
    else:
        lc = lc.sum() * 0
    lo = F.l1_loss(offset_pred, offset_tgt, reduction="none") * offset_weights
    if offset_weights.sum() > 0:
        lo = lo.sum() / offset_weights.sum()
    else:
        lo = lo.sum() * 0
    return {"loss_center": lc * center_loss_weight,
            "loss_offset": lo * offset_loss_weight}


# ---------------------------------------------------------------------------
# Multi-view photometric loss (reference loss.py:84-294)
# ---------------------------------------------------------------------------


def ssim_loss_map(x: torch.Tensor, y: torch.Tensor, c1: float = 1e-4,
                  c2: float = 9e-4) -> torch.Tensor:
    """clamp((1 - SSIM)/2, 0, 1) in the 3x3 avg-pool formulation with
    reflect padding (reference loss.py:200-220). NCHW."""
    xp = F.pad(x, [1, 1, 1, 1], "reflect")
    yp = F.pad(y, [1, 1, 1, 1], "reflect")
    mu_x = F.avg_pool2d(xp, 3, stride=1)
    mu_y = F.avg_pool2d(yp, 3, stride=1)
    sigma_x = F.avg_pool2d(xp * xp, 3, stride=1) - mu_x ** 2
    sigma_y = F.avg_pool2d(yp * yp, 3, stride=1) - mu_y ** 2
    sigma_xy = F.avg_pool2d(xp * yp, 3, stride=1) - mu_x * mu_y
    val = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2))
    return torch.clamp((1.0 - val) / 2.0, 0.0, 1.0)


def multi_view_photometric_loss(
    inv_depths: List[torch.Tensor],          # list of [B,1,H,W], full res
    poses: torch.Tensor,                     # [B, n_ctx, 6]
    K: torch.Tensor,                         # [B,3,3]
    image: torch.Tensor,                     # [B,3,H,W] current (un-jittered)
    context_images: List[torch.Tensor],      # n_ctx x [B,3,H,W]
    reprojection_mask: Optional[torch.Tensor] = None,  # [B,1,H,W] bool
    *,
    ssim_loss_weight: float = 0.85,
    photometric_loss_weight: float = 1.0,
    smoothing_loss_weight: float = 0.001,
    automask_loss: bool = True,
    photometric_reduce_op: str = "min",
    padding_mode: str = "zeros",
) -> Dict[str, torch.Tensor]:
    """Faithful transcription of MultiViewPhotometricLoss.forward
    (reference loss.py:111-154) plus its helpers, with the Camera/Pose
    plumbing inlined (all scales are full resolution — the reference heads
    upsample, mg_net.py:796-811, so match_scales is the identity here)."""
    n = len(inv_depths)
    depths = [1.0 / d.clamp(min=1e-6) for d in inv_depths]  # inv2depth
    pose_mats = [pose_vec_to_mat(poses[:, j]) for j in range(poses.shape[1])]

    def photometric(est: torch.Tensor, ref: torch.Tensor) -> torch.Tensor:
        # calc_photometric_loss (loss.py:169-198): channel-mean of the
        # 0.85*SSIM + 0.15*L1 blend, [B,1,H,W]
        l1 = torch.abs(est - ref)
        if ssim_loss_weight > 0.0:
            s = ssim_loss_map(est, ref)
            return (ssim_loss_weight * s.mean(1, True)
                    + (1 - ssim_loss_weight) * l1.mean(1, True))
        return l1

    # Candidate stacking (loss.py:129-144): per context frame, the warped
    # residual for every scale plus (if automasking) the unwarped residual.
    photometric_losses: List[List[torch.Tensor]] = [[] for _ in range(n)]
    for j, ref_image in enumerate(context_images):
        for i in range(n):
            warped = view_synthesis(ref_image, depths[i], K, pose_mats[j],
                                    padding_mode)
            photometric_losses[i].append(photometric(warped, image))
        if automask_loss:
            unwarped = photometric(ref_image, image)
            for i in range(n):
                photometric_losses[i].append(unwarped)

    # Reduction (loss.py:222-255): min/mean over candidates, then the mean
    # over the boolean reprojection mask.
    if reprojection_mask is None:
        mask = torch.ones_like(photometric_losses[0][0], dtype=torch.bool)
    else:
        mask = reprojection_mask.bool()

    def reduce(cands: List[torch.Tensor]) -> torch.Tensor:
        if photometric_reduce_op == "min":
            return torch.cat(cands, 1).min(1, True)[0][mask].mean()
        if photometric_reduce_op == "mean":
            return sum(c[mask].mean() for c in cands) / len(cands)
        raise ValueError(photometric_reduce_op)

    photometric_loss = sum(reduce(photometric_losses[i])
                           for i in range(n)) / n

    # Smoothness (loss.py:257-294 + depth.py calc_smoothness): edge-aware
    # gradients of mean-normalized inverse depth, per-scale weight 1/2^i.
    weights_x = torch.exp(-torch.mean(
        torch.abs(image[:, :, :, :-1] - image[:, :, :, 1:]), 1, keepdim=True))
    weights_y = torch.exp(-torch.mean(
        torch.abs(image[:, :, :-1, :] - image[:, :, 1:, :]), 1, keepdim=True))
    smoothness_loss = image.new_zeros(())
    for i in range(n):
        d = inv_depths[i]
        dn = d / d.mean(2, True).mean(3, True).clamp(min=1e-6)
        sx = (dn[:, :, :, :-1] - dn[:, :, :, 1:]) * weights_x
        sy = (dn[:, :, :-1, :] - dn[:, :, 1:, :]) * weights_y
        smoothness_loss = smoothness_loss + (
            sx[mask[:, :, :, :-1]].abs().mean()
            + sy[mask[:, :, :-1, :]].abs().mean()
        ) / 2 ** i
    smoothness_loss = smoothness_loss / n

    return {
        "loss_photometric": photometric_loss * photometric_loss_weight,
        "loss_smoothness": smoothness_loss * smoothing_loss_weight,
    }


# ---------------------------------------------------------------------------
# Uncertainty weighting (reference mg_net.py:360-372)
# ---------------------------------------------------------------------------


def apply_uncertainty(losses: Dict[str, torch.Tensor],
                      log_vars: torch.Tensor) -> Dict[str, torch.Tensor]:
    """loss_i <- tau * exp(-log_vars[i]) * loss_i + 0.5 * log_vars[i],
    indexed by dict insertion order; tau = 1.0 for loss_sem_seg else 0.5."""
    out: Dict[str, torch.Tensor] = {}
    for idx, (key, value) in enumerate(losses.items()):
        tau = 1.0 if key == "loss_sem_seg" else 0.5
        out[key] = tau * torch.exp(-log_vars[idx]) * value + 0.5 * log_vars[idx]
    return out
