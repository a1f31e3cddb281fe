"""The compiled training / evaluation step.

Replaces the reference's AMPTrainer.run_step + MGNet.forward training
branch (reference: mg_net.py:220-373, tools/train_net.py hot loop,
SURVEY.md §3.1): one jitted SPMD function computes the forward pass (heads
+ pose net), assembles all losses, applies homoscedastic uncertainty
weighting, differentiates, clips, and applies the optimizer — gradient
averaging and sync-BN statistics ride XLA collectives over the mesh's
``data`` axis instead of NCCL.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from mgnet_tpu.losses import (
    center_loss,
    cross_entropy_loss,
    deeplab_ce_loss,
    multi_view_photometric_loss,
    offset_loss,
    ohem_ce_loss,
)
from mgnet_tpu.train.state import TrainState

__all__ = [
    "normalize_images",
    "compute_losses",
    "apply_uncertainty",
    "make_train_step",
    "make_eval_step",
]


def normalize_images(images: jnp.ndarray, pixel_mean, pixel_std) -> jnp.ndarray:
    """uint8/float [B,H,W,3] -> normalized float32.

    Parity: reference mg_net.py:250-252 — /255, then (x - mean/255)/(std/255).
    """
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(pixel_mean, jnp.float32) / 255.0
    std = jnp.asarray(pixel_std, jnp.float32) / 255.0
    return (x - mean) / std


def unit_image(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1]-range f32 view of an image batch.

    The train mapper ships uint8 (host does decode+augment only; the
    cast and /255 run on device — 4x less H2D and ~6 fewer full-res
    host passes per sample); synthetic fixtures and older tools ship
    unit-range floats directly. dtype is static under jit, so this is
    free dispatch, not a runtime branch."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def compute_losses(cfg, outputs: Dict[str, Any],
                   batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Assemble the (unweighted) per-task losses.

    Parity: reference mg_net.py:351-357 + head .losses() methods.
    Loss key order matters for the uncertainty log_vars indexing
    (reference mg_net.py:360-372 iterates the dict in insertion order).
    """
    losses: Dict[str, jnp.ndarray] = {}
    if cfg.WITH_PANOPTIC:
        h = cfg.MODEL.SEM_SEG_HEAD
        lt = h.LOSS_TYPE
        if lt == "ohem":
            sem = ohem_ce_loss(
                outputs["sem_seg"], batch["sem_seg"], batch["sem_seg_weights"],
                ignore_label=h.IGNORE_VALUE, ohem_threshold=h.OHEM_THRESHOLD,
                n_min=h.OHEM_N_MIN,
            )
        elif lt == "hard_pixel_mining":
            sem = deeplab_ce_loss(
                outputs["sem_seg"], batch["sem_seg"], batch["sem_seg_weights"],
                ignore_label=h.IGNORE_VALUE, top_k_percent=h.LOSS_TOP_K,
            )
        elif lt == "cross_entropy":
            sem = cross_entropy_loss(
                outputs["sem_seg"], batch["sem_seg"], batch["sem_seg_weights"],
                ignore_label=h.IGNORE_VALUE,
            )
        else:
            raise ValueError(f"Unexpected loss type: {lt}")
        losses["loss_sem_seg"] = sem * h.LOSS_WEIGHT

        ih = cfg.MODEL.INS_EMBED_HEAD
        losses["loss_center"] = center_loss(
            outputs["center"], batch["center"], batch["center_weights"]
        ) * ih.CENTER_LOSS_WEIGHT
        losses["loss_offset"] = offset_loss(
            outputs["offset"], batch["offset"], batch["offset_weights"]
        ) * ih.OFFSET_LOSS_WEIGHT

    if cfg.WITH_DEPTH:
        dh = cfg.MODEL.DEPTH_HEAD

        def photo_fn(inv_depths, poses, K, image, prev, nxt, mask):
            return multi_view_photometric_loss(
                inv_depths, poses, K, image, [prev, nxt], mask,
                ssim_loss_weight=dh.SSIM_LOSS_WEIGHT,
                photometric_loss_weight=dh.PHOTOMETRIC_LOSS_WEIGHT,
                smoothing_loss_weight=dh.SMOOTHING_LOSS_WEIGHT,
                automask_loss=dh.AUTOMASK_LOSS,
                photometric_reduce_op=dh.PHOTOMETRIC_REDUCE_OP,
                padding_mode=dh.PADDING_MODE,
                use_pallas_ssim=dh.USE_PALLAS_SSIM,
                use_pallas_warp=(
                    "fast" if (dh.USE_PALLAS_WARP and dh.PALLAS_WARP_FAST)
                    else dh.USE_PALLAS_WARP),
            )

        if cfg.MODEL.REMAT:
            # don't keep warped frames / SSIM windows for backward —
            # recompute them from the (much smaller) loss inputs
            photo_fn = jax.checkpoint(photo_fn)
        photo = photo_fn(
            outputs["inv_depths"],
            outputs["poses"],
            batch["camera_matrix"],
            unit_image(batch["image_orig"]),
            unit_image(batch["image_prev_orig"]),
            unit_image(batch["image_next_orig"]),
            batch.get("reprojection_mask"),
        )
        losses.update(photo)
    return losses


def apply_uncertainty(losses: Dict[str, jnp.ndarray],
                      log_vars: jnp.ndarray) -> Tuple[Dict, Dict]:
    """Homoscedastic task-uncertainty weighting.

    Parity: reference mg_net.py:360-372 — loss_i <- tau * exp(-s_i) *
    loss_i + 0.5 * s_i with tau=1.0 for sem_seg else 0.5; also report the
    raw losses and exp(s_i).
    """
    weighted: Dict[str, jnp.ndarray] = {}
    metrics: Dict[str, jnp.ndarray] = {}
    for idx, (key, value) in enumerate(losses.items()):
        metrics[key + "_raw"] = value
        tau = 1.0 if key == "loss_sem_seg" else 0.5
        s = log_vars[idx]
        weighted[key] = tau * jnp.exp(-s) * value + 0.5 * s
        metrics[key + "_uncertainty"] = jnp.exp(s)
    return weighted, metrics


def make_train_step(cfg, model) -> Callable:
    """Build the jittable train step: (state, batch) -> (state, metrics).

    The returned function is pure; wrap it in jax.jit with mesh shardings
    (batch sharded on 'data', state replicated) for multi-chip training.

    SOLVER.GRAD_ACCUM_STEPS > 1 runs the reference's exact optimizer
    schedule (e.g. the flagship batch-12/60k recipe,
    configs/MGNet-Cityscapes-Fine.yaml:29-42) on fewer chips: the global
    batch is split into k sequential micro-batches inside ONE jitted step
    (lax.scan keeps only one micro-batch's activations live), gradients
    are averaged across micro-batches — numerically the reference's
    DDP mean-of-rank-gradients with per-rank loss normalization — and
    the optimizer/LR/clip apply once per iteration. Honest delta: BN
    statistics are computed per micro-batch (batch 12/k, momentum applied
    k times per iteration) because sequential micro-batches cannot share
    one batch statistic, whereas the reference's InPlaceABNSync pools all
    12; running stats converge to the same place, per-iteration
    normalization noise is slightly higher. Measured (round 5): the
    multi-scene overfit gate at batch 12 accum-2 matches or beats the
    single-pass arm (PQ 97.3 vs 95.6, same mIoU, lower train loss —
    BENCH_NOTES §Round 5 Grad-accum BN A/B), so the delta is accepted
    as-is.
    """
    pixel_mean = tuple(cfg.MODEL.PIXEL_MEAN)
    pixel_std = tuple(cfg.MODEL.PIXEL_STD)
    with_depth = cfg.WITH_DEPTH
    with_uncertainty = cfg.WITH_UNCERTAINTY
    accum = max(1, int(cfg.SOLVER.GRAD_ACCUM_STEPS))

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        image = normalize_images(batch["image"], pixel_mean, pixel_std)
        kwargs = {}
        if with_depth:
            kwargs = dict(
                image_prev=normalize_images(
                    batch["image_prev"], pixel_mean, pixel_std),
                image_next=normalize_images(
                    batch["image_next"], pixel_mean, pixel_std),
            )
        outputs, mutated = model.apply(
            variables, image, method=type(model).forward_train,
            mutable=["batch_stats"], **kwargs,
        )
        losses = compute_losses(cfg, outputs, batch)
        metrics = {}
        if with_uncertainty:
            losses, metrics = apply_uncertainty(losses, params["log_vars"])
        total = sum(losses.values())
        metrics.update(losses)
        metrics["loss_total"] = total
        return total, (mutated["batch_stats"], metrics)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum == 1:
            (_, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch
            )
        else:
            def split(x):
                b = x.shape[0]
                assert b % accum == 0, (
                    f"batch {b} must divide into {accum} micro-batches"
                )
                return x.reshape((accum, b // accum) + x.shape[1:])

            micro = jax.tree_util.tree_map(split, batch)
            first = jax.tree_util.tree_map(lambda x: x[0], micro)
            _, (_, metrics_shape) = jax.eval_shape(
                loss_fn, state.params, state.batch_stats, first)

            def body(carry, mb):
                stats, grads_acc, metrics_acc = carry
                (_, (stats, metrics)), grads = grad_fn(
                    state.params, stats, mb)
                grads_acc = jax.tree_util.tree_map(
                    jnp.add, grads_acc, grads)
                metrics_acc = jax.tree_util.tree_map(
                    jnp.add, metrics_acc, metrics)
                return (stats, grads_acc, metrics_acc), None

            init = (
                state.batch_stats,
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape),
            )
            (new_stats, grads, metrics), _ = jax.lax.scan(
                body, init, micro)
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=new_stats
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg, model) -> Callable:
    """Raw inference step: normalized forward returning head outputs."""
    pixel_mean = tuple(cfg.MODEL.PIXEL_MEAN)
    pixel_std = tuple(cfg.MODEL.PIXEL_STD)

    def eval_step(params, batch_stats, images):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        x = normalize_images(images, pixel_mean, pixel_std)
        return model.apply(variables, x, train=False)

    return eval_step
