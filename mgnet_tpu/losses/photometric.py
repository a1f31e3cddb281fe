"""Self-supervised multi-view photometric loss (SfM-style).

Behavioral parity with reference: mgnet/modeling/loss.py:84-294
(MultiViewPhotometricLoss, adapted there from packnet-sfm):
per context frame, warp via view synthesis; photometric =
0.85*SSIM + 0.15*L1 (channel-mean); automask appends the unwarped-frame
loss to the min-reduction stack; min-reduce over candidates then mean over
the reprojection mask; edge-aware smoothness on mean-normalized inverse
depth with weight 1/2^i per scale; SSIM in its 3x3 avg-pool formulation.

TPU-first: a single pure function over NHWC tensors; all candidates are
stacked and min-reduced in one fused elementwise pass; computations are
forced to fp32 (the reference wraps losses in
@custom_fwd(cast_inputs=float32), mg_net.py:827-829). This whole function
is the designated Pallas-fusion target (SURVEY.md §7 step 4).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from mgnet_tpu.geometry import (
    Camera,
    Pose,
    calc_smoothness,
    inv2depth,
    view_synthesis,
)

__all__ = ["ssim", "multi_view_photometric_loss"]


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 average pool, 'valid' — input is pre-padded."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray, c1: float = 1e-4,
         c2: float = 9e-4) -> jnp.ndarray:
    """SSIM *loss* map: clamp((1 - SSIM) / 2, 0, 1), NHWC.

    Parity: reference loss.py:200-220 (3x3 avg-pool statistics with reflect
    padding).
    """
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3(xp)
    mu_y = _avg_pool3(yp)
    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y

    sigma_x = _avg_pool3(xp * xp) - mu_xx
    sigma_y = _avg_pool3(yp * yp) - mu_yy
    sigma_xy = _avg_pool3(xp * yp) - mu_xy

    ssim_val = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    )
    return jnp.clip((1.0 - ssim_val) / 2.0, 0.0, 1.0)


def _photometric(warped: jnp.ndarray, image: jnp.ndarray,
                 ssim_weight: float, use_pallas: bool = False) -> jnp.ndarray:
    """Channel-mean photometric residual [B,H,W,1].

    Parity: reference loss.py:169-198 (calc_photometric_loss).
    With ``use_pallas`` the fused VMEM-resident kernel computes the
    SSIM+L1 blend in one pass (ops/pallas/ssim.py).
    """
    if use_pallas and ssim_weight > 0.0:
        from mgnet_tpu.ops.pallas.ssim import fused_photometric_residual

        return fused_photometric_residual(warped, image, ssim_weight)
    l1 = jnp.mean(jnp.abs(warped - image), axis=-1, keepdims=True)
    if ssim_weight > 0.0:
        s = jnp.mean(ssim(warped, image), axis=-1, keepdims=True)
        return ssim_weight * s + (1.0 - ssim_weight) * l1
    return l1


def multi_view_photometric_loss(
    inv_depths: List[jnp.ndarray],
    poses: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    image: jnp.ndarray,
    context_images: List[jnp.ndarray],
    reprojection_mask: jnp.ndarray | None = None,
    *,
    ssim_loss_weight: float = 0.85,
    photometric_loss_weight: float = 1.0,
    smoothing_loss_weight: float = 0.001,
    automask_loss: bool = True,
    photometric_reduce_op: str = "min",
    padding_mode: str = "zeros",
    use_pallas_ssim: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Compute photometric + smoothness losses.

    Args:
        inv_depths: list of [B,H,W,1] inverse-depth predictions (all at full
            resolution — the heads upsample, reference mg_net.py:796-811).
        poses: [B, num_context, 6] pose vectors (t, euler) from PoseCNN.
        camera_matrix: [B, 3, 3] intrinsics.
        image: [B,H,W,3] un-jittered current frame.
        context_images: list of [B,H,W,3] un-jittered context frames
            (prev, next) matching poses[:, j].
        reprojection_mask: [B,H,W,1] bool/float validity mask.
    """
    n = len(inv_depths)
    f32 = jnp.float32
    inv_depths = [d.astype(f32) for d in inv_depths]
    image = image.astype(f32)
    context_images = [c.astype(f32) for c in context_images]
    camera_matrix = camera_matrix.astype(f32)
    poses = poses.astype(f32)

    if reprojection_mask is None:
        mask = jnp.ones(image.shape[:3] + (1,), f32)
    else:
        mask = reprojection_mask.astype(f32)
        if mask.ndim == 3:
            mask = mask[..., None]

    depths = [inv2depth(d) for d in inv_depths]
    cam = Camera(K=camera_matrix)

    if automask_loss:
        assert photometric_reduce_op == "min", (
            "automasking requires the min photometric reduction"
        )

    # Per scale, collect candidate residual maps [B,H,W,1]:
    # warped + (optional) unwarped automask residual, per context frame.
    candidates: List[List[jnp.ndarray]] = [[] for _ in range(n)]
    for j, ref_image in enumerate(context_images):
        ref_cam = Camera(K=camera_matrix, Tcw=Pose.from_vec(poses[:, j]))
        unwarped = (
            _photometric(ref_image, image, ssim_loss_weight,
                         use_pallas_ssim)
            if automask_loss else None
        )
        for i in range(n):
            warped = view_synthesis(
                ref_image, depths[i], ref_cam, cam, padding_mode=padding_mode
            )
            candidates[i].append(
                _photometric(warped, image, ssim_loss_weight,
                             use_pallas_ssim))
            if automask_loss:
                candidates[i].append(unwarped)

    # Reduce: min over candidates, then mean over the reprojection mask.
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)

    def reduce_scale(cands: List[jnp.ndarray]) -> jnp.ndarray:
        stacked = jnp.concatenate(cands, axis=-1)  # [B,H,W,n_cand]
        if photometric_reduce_op == "min":
            m = jnp.min(stacked, axis=-1, keepdims=True)
        elif photometric_reduce_op == "mean":
            m = jnp.mean(stacked, axis=-1, keepdims=True)
        else:
            raise ValueError(
                f"Unknown photometric_reduce_op: {photometric_reduce_op}"
            )
        return jnp.sum(m * mask) / mask_sum

    photometric_loss = sum(reduce_scale(candidates[i]) for i in range(n)) / n

    # Edge-aware smoothness on mean-normalized inverse depth.
    smooth_x, smooth_y = calc_smoothness(inv_depths, image, n)
    mask_x = mask[:, :, :-1, :]
    mask_y = mask[:, :-1, :, :]
    msum_x = jnp.maximum(jnp.sum(mask_x), 1.0)
    msum_y = jnp.maximum(jnp.sum(mask_y), 1.0)
    smoothness_loss = sum(
        (jnp.sum(jnp.abs(smooth_x[i]) * mask_x) / msum_x
         + jnp.sum(jnp.abs(smooth_y[i]) * mask_y) / msum_y) / 2**i / 2.0
        for i in range(n)
    ) / n

    return {
        "loss_photometric": photometric_loss * photometric_loss_weight,
        "loss_smoothness": smoothness_loss * smoothing_loss_weight,
    }
