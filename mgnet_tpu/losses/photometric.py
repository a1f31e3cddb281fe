"""Self-supervised multi-view photometric loss (SfM-style).

Behavioral parity with reference: mgnet/modeling/loss.py:84-294
(MultiViewPhotometricLoss, adapted there from packnet-sfm):
per context frame, warp via view synthesis; photometric =
0.85*SSIM + 0.15*L1 (channel-mean); automask appends the unwarped-frame
loss to the min-reduction stack; min-reduce over candidates then mean over
the reprojection mask; edge-aware smoothness on mean-normalized inverse
depth with weight 1/2^i per scale; SSIM in its 3x3 avg-pool formulation.

TPU-first: a single pure function; computations are forced to fp32 (the
reference wraps losses in @custom_fwd(cast_inputs=float32),
mg_net.py:827-829). All per-pixel math runs CHANNEL-PLANAR — [B*3, H, W]
planes with the image width on the 128-lane minor dimension — because
NHWC arithmetic at C=3 puts the 3-wide channel axis on the lanes and
wastes 125/128 of every VPU op (measured: one packed-NHWC SSIM residual
at 2x1024x1024 costs ~2.5 s on v5e; the identical planar formulation
48 ms). Candidates are min-reduced over a leading stack axis.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from mgnet_tpu.geometry import (
    Camera,
    Pose,
    inv2depth,
    view_synthesis,
)

__all__ = ["ssim", "multi_view_photometric_loss"]


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 average pool, 'valid' — input is pre-padded.

    Shifted-add separable form: lax.reduce_window lowers ~200x off
    memory-bound speed on v5e (measured ~10 ms per pool at [6,1024,1024]);
    the six shifted adds fuse into one streaming pass.
    """
    r = x[:, :-2, :, :] + x[:, 1:-1, :, :] + x[:, 2:, :, :]
    s = r[:, :, :-2, :] + r[:, :, 1:-1, :] + r[:, :, 2:, :]
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


def _to_planes(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B*C, H, W] channel planes."""
    b, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b * c, h, w)


def _avg_pool3_planar(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 'valid' average pool on [N, H, W] planes
    (shifted-add separable form; see _avg_pool3)."""
    r = x[:, :-2, :] + x[:, 1:-1, :] + x[:, 2:, :]
    s = r[:, :, :-2] + r[:, :, 1:-1] + r[:, :, 2:]
    return s / 9.0


def _ssim_planar(x: jnp.ndarray, y: jnp.ndarray, c1: float = 1e-4,
                 c2: float = 9e-4) -> jnp.ndarray:
    """ssim() on [N, H, W] planes (same math, lane-efficient layout)."""
    pad = ((0, 0), (1, 1), (1, 1))
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3_planar(xp)
    mu_y = _avg_pool3_planar(yp)
    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y

    sigma_x = _avg_pool3_planar(xp * xp) - mu_xx
    sigma_y = _avg_pool3_planar(yp * yp) - mu_yy
    sigma_xy = _avg_pool3_planar(xp * yp) - mu_xy

    ssim_val = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    )
    return jnp.clip((1.0 - ssim_val) / 2.0, 0.0, 1.0)


def _photometric_planar(warped_p: jnp.ndarray, image_p: jnp.ndarray,
                        ssim_weight: float, batch: int) -> jnp.ndarray:
    """Channel-mean photometric residual [B, H, W] from [B*C, H, W] planes.

    Parity: reference loss.py:169-198 (calc_photometric_loss); the blend
    of channel means equals the channel mean of blends (linear).
    """
    res = jnp.abs(warped_p - image_p)
    if ssim_weight > 0.0:
        s = _ssim_planar(warped_p, image_p)
        res = ssim_weight * s + (1.0 - ssim_weight) * res
    n, h, w = res.shape
    return jnp.mean(res.reshape(batch, n // batch, h, w), axis=1)


def _photometric(warped: jnp.ndarray, image: jnp.ndarray,
                 ssim_weight: float, use_pallas: bool = False) -> jnp.ndarray:
    """Channel-mean photometric residual [B,H,W,1] (NHWC wrapper).

    Parity: reference loss.py:169-198 (calc_photometric_loss).
    With ``use_pallas`` the fused VMEM-resident kernel computes the
    SSIM+L1 blend in one pass (ops/pallas/ssim.py).
    """
    if use_pallas and ssim_weight > 0.0:
        from mgnet_tpu.ops.pallas.ssim import fused_photometric_residual

        return fused_photometric_residual(warped, image, ssim_weight)
    return _photometric_planar(
        _to_planes(warped), _to_planes(image), ssim_weight, warped.shape[0]
    )[..., None]


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
    use_pallas_warp: bool = False,
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

    mask = mask[..., 0]  # planar [B,H,W]
    batch = image.shape[0]
    # NHWC dataflow on purpose — a full channel-planar rewrite was built
    # and measured SLOWER (round 5, recorded negative): planar in/out
    # wins the warp kernel forward (24.0 vs 27.2 ms standalone) but the
    # warp->SSIM gradient composition loses more (44.0 vs 39.2 ms/pair;
    # step 0.361 vs 0.336 s) — XLA treats packed-NHWC elementwise ops as
    # flat vectors and cancels adjacent relayouts, so the presumed
    # "relayout glue" was already fused away, while the planar fields'
    # HW-minor layouts make the dcoords glue worse. The planar kernel
    # paths stay available (grid_sample_planar/planar=True) and
    # layout-parity-tested for forward-only consumers.
    image_planes = _to_planes(image)

    depths = [inv2depth(d) for d in inv_depths]
    cam = Camera(K=camera_matrix)

    if automask_loss:
        assert photometric_reduce_op == "min", (
            "automasking requires the min photometric reduction"
        )

    def photo(a: jnp.ndarray) -> jnp.ndarray:
        """Residual of NHWC frame ``a`` against the current image, [B,H,W]."""
        if use_pallas_ssim and ssim_loss_weight > 0.0:
            from mgnet_tpu.ops.pallas.ssim import fused_photometric_residual

            return fused_photometric_residual(
                a, image, ssim_loss_weight)[..., 0]
        return _photometric_planar(
            _to_planes(a), image_planes, ssim_loss_weight, batch)

    # Per scale, collect candidate residual maps [B,H,W]:
    # warped + (optional) unwarped automask residual, per context frame.
    candidates: List[List[jnp.ndarray]] = [[] for _ in range(n)]
    for j, ref_image in enumerate(context_images):
        ref_cam = Camera(K=camera_matrix, Tcw=Pose.from_vec(poses[:, j]))
        unwarped = photo(ref_image) if automask_loss else None
        for i in range(n):
            warped = view_synthesis(
                ref_image, depths[i], ref_cam, cam,
                padding_mode=padding_mode, use_pallas=use_pallas_warp,
            )
            candidates[i].append(photo(warped))
            if automask_loss:
                candidates[i].append(unwarped)

    # Reduce: min over candidates, then mean over the reprojection mask.
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)

    def reduce_scale(cands: List[jnp.ndarray]) -> jnp.ndarray:
        stacked = jnp.stack(cands, axis=0)  # [n_cand,B,H,W]
        if photometric_reduce_op == "min":
            m = jnp.min(stacked, axis=0)
        elif photometric_reduce_op == "mean":
            m = jnp.mean(stacked, axis=0)
        else:
            raise ValueError(
                f"Unknown photometric_reduce_op: {photometric_reduce_op}"
            )
        return jnp.sum(m * mask) / mask_sum

    photometric_loss = sum(reduce_scale(candidates[i]) for i in range(n)) / n

    # Edge-aware smoothness on mean-normalized inverse depth (planar;
    # same math as geometry.depth.calc_smoothness).
    inv_norm = [
        p[..., 0] / jnp.clip(
            jnp.mean(p[..., 0], axis=(1, 2), keepdims=True), min=1e-6)
        for p in inv_depths
    ]
    img_gx = jnp.abs(image_planes[:, :, :-1] - image_planes[:, :, 1:])
    img_gy = jnp.abs(image_planes[:, :-1, :] - image_planes[:, 1:, :])
    weights_x = jnp.exp(
        -jnp.mean(img_gx.reshape(batch, -1, *img_gx.shape[1:]), axis=1))
    weights_y = jnp.exp(
        -jnp.mean(img_gy.reshape(batch, -1, *img_gy.shape[1:]), axis=1))

    mask_x = mask[:, :, :-1]
    mask_y = mask[:, :-1, :]
    msum_x = jnp.maximum(jnp.sum(mask_x), 1.0)
    msum_y = jnp.maximum(jnp.sum(mask_y), 1.0)
    # Per-scale weight is 1/2^i with NO extra /2: the reference sums the
    # x and y masked means directly (loss.py:281-293). A former /2.0 here
    # silently halved the smoothness term — caught by the golden ladder
    # (tests/test_golden_losses.py::test_photometric_golden).
    smoothness_loss = sum(
        (jnp.sum(jnp.abs(
            (inv_norm[i][:, :, :-1] - inv_norm[i][:, :, 1:]) * weights_x
        ) * mask_x) / msum_x
         + jnp.sum(jnp.abs(
            (inv_norm[i][:, :-1, :] - inv_norm[i][:, 1:, :]) * weights_y
         ) * mask_y) / msum_y) / 2**i
        for i in range(n)
    ) / n

    return {
        "loss_photometric": photometric_loss * photometric_loss_weight,
        "loss_smoothness": smoothness_loss * smoothing_loss_weight,
    }
