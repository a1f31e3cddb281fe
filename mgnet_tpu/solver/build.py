"""Optimizer construction: param groups, LR schedule, clipping.

Behavioral parity with reference: mgnet/solver/build.py (per-module param
groups with head_lr_factor, separate weight decay for conv/linear weights
vs biases vs norm params, log_vars with wd=0), tools/train_net.py:99-154
(WarmupPolyLR, SGD/ADAM/ADAMW, full-model grad clipping to norm 0.01) and
detectron2's WarmupPolyLR semantics.

TPU-first: implemented as composable optax transforms over the parameter
pytree. Per-group learning rates become a per-leaf multiplier tree applied
after the second-moment rescaling (equivalent to per-group LR); clipping
and weight decay are chained transforms compiled into the train step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "warmup_poly_schedule",
    "lr_multiplier_tree",
    "weight_decay_mask_trees",
    "build_optimizer",
]

HEAD_MODULES = ("sem_seg_head", "ins_embed_head", "depth_head")


def warmup_poly_schedule(base_lr: float, max_iter: int, power: float = 0.9,
                         warmup_factor: float = 0.1, warmup_iters: int = 1000,
                         constant_ending: float = 0.0) -> Callable:
    """WarmupPolyLR: linear warmup from ``warmup_factor`` x poly decay.

    Parity: detectron2 WarmupPolyLR used at reference tools/train_net.py:99-105.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warmup = warmup_factor * (1.0 - alpha) + alpha
        poly = jnp.power(
            jnp.clip(1.0 - step / max_iter, min=0.0), power
        )
        if constant_ending > 0:
            # Constant tail to avoid vanishing LR (detectron2 semantics).
            poly = jnp.where(
                warmup == 1.0,
                jnp.maximum(poly, constant_ending),
                poly,
            )
        return base_lr * warmup * poly

    return schedule


def _path_str(path: Tuple) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def lr_multiplier_tree(params: Any, head_lr_factor: float) -> Any:
    """Per-leaf LR multiplier: head modules get head_lr_factor.

    Parity: reference solver/build.py:42-49 — modules whose name contains
    'head' use base_lr * head_lr_factor; log_vars uses base_lr.
    """

    def mult(path, leaf):
        p = _path_str(path)
        if any(h in p for h in HEAD_MODULES):
            return head_lr_factor
        return 1.0

    return jax.tree_util.tree_map_with_path(mult, params)


def weight_decay_mask_trees(params: Any) -> Dict[str, Any]:
    """Classify leaves into weight / bias / norm groups for weight decay.

    Parity: reference solver/build.py:87-116 — conv/linear kernels get
    SOLVER.WEIGHT_DECAY, their biases WEIGHT_DECAY_BIAS, norm scales/biases
    WEIGHT_DECAY_NORM; log_vars always wd=0 (build.py:60-62).
    """

    def classify(path, leaf):
        p = _path_str(path)
        if "log_vars" in p:
            return "none"
        if "abn" in p or "BatchNorm" in p or "/bn" in p:
            return "norm"
        if p.endswith("bias"):
            return "bias"
        if p.endswith("kernel") or p.endswith("weight"):
            return "weight"
        return "none"

    labels = jax.tree_util.tree_map_with_path(classify, params)
    return {
        group: jax.tree_util.tree_map(lambda l: l == group, labels)
        for group in ("weight", "bias", "norm")
    }


def warmup_cosine_schedule(base_lr: float, max_iter: int,
                           warmup_factor: float = 0.1,
                           warmup_iters: int = 1000) -> Callable:
    """WarmupCosineLR (detectron2's other builtin scheduler)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warmup = warmup_factor * (1.0 - alpha) + alpha
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_iter))
        return base_lr * warmup * cos

    return schedule


def freeze_mask_tree(params: Any, freeze_at: int) -> Any:
    """Per-leaf 0/1 multipliers freezing backbone stages.

    Parity: reference MODEL.BACKBONE.FREEZE_AT (res_net.py freeze_at —
    stage k and everything before it stops training when freeze_at >= k;
    freeze_at=1 freezes the stem, 2 also res2, etc.).
    """

    def keep(path, leaf):
        p = _path_str(path)
        if "backbone" not in p:
            return 1.0
        if "stem" in p and freeze_at >= 1:
            return 0.0
        for stage in range(2, 6):
            if f"res{stage}_" in p and freeze_at >= stage:
                return 0.0
        return 1.0

    return jax.tree_util.tree_map_with_path(keep, params)


def _scale_by_tree(mult_tree: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by its multiplier (per-group LR)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        new = jax.tree_util.tree_map(
            lambda u, m: u * m, updates, mult_tree
        )
        return new, state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg, params) -> Tuple[optax.GradientTransformation, Callable]:
    """Build the optax chain for MGNet training.

    Order (matching torch semantics, reference train_net.py:118-154):
    global-norm clip on the RAW gradients (FullModelGradientClippingOptimizer
    clips inside step() BEFORE the base optimizer runs) -> weight decay
    (Adam/SGD fold L2 into the clipped gradient; AdamW decouples it, adding
    wd*param to the rescaled update so it is NOT clipped and NOT seen by the
    moments) -> moment rescaling -> per-group LR multipliers -> negative
    schedule scale.
    """
    s = cfg.SOLVER
    name = s.LR_SCHEDULER_NAME
    if name == "WarmupPolyLR":
        schedule = warmup_poly_schedule(
            s.BASE_LR, s.MAX_ITER, s.POLY_LR_POWER, s.WARMUP_FACTOR,
            s.WARMUP_ITERS, s.POLY_LR_CONSTANT_ENDING,
        )
    elif name == "WarmupCosineLR":
        schedule = warmup_cosine_schedule(
            s.BASE_LR, s.MAX_ITER, s.WARMUP_FACTOR, s.WARMUP_ITERS,
        )
    else:
        raise ValueError(f"Unknown LR scheduler: {name}")

    chain = []
    masks = weight_decay_mask_trees(params)

    def append_decay():
        for group, wd in (("weight", s.WEIGHT_DECAY),
                          ("bias", s.WEIGHT_DECAY_BIAS),
                          ("norm", s.WEIGHT_DECAY_NORM)):
            if wd and wd > 0:
                chain.append(optax.masked(
                    optax.add_decayed_weights(wd), masks[group]
                ))

    if s.CLIP_GRADIENTS.ENABLED:
        assert s.CLIP_GRADIENTS.CLIP_TYPE == "full_model", (
            "only full_model clipping is supported"
        )
        chain.append(optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE))

    opt = s.OPTIMIZER.upper()
    if opt == "ADAM":
        # torch Adam folds L2 into the (already clipped) gradient before the
        # moment estimates; defaults betas/eps (reference train_net.py:136-145).
        append_decay()
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif opt == "ADAMW":
        # torch AdamW decouples decay: p -= lr*wd*p happens outside the
        # moments (and is never clipped) — add wd*param AFTER rescaling.
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        append_decay()
    elif opt == "SGD":
        # torch SGD folds L2 into the gradient before the momentum buffer.
        append_decay()
        chain.append(optax.trace(decay=s.MOMENTUM, nesterov=False))
    else:
        raise ValueError(f"Unknown optimizer: {opt}")

    chain.append(_scale_by_tree(lr_multiplier_tree(params, s.HEAD_LR_FACTOR)))
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    if freeze_at and freeze_at > 0:
        chain.append(_scale_by_tree(freeze_mask_tree(params, freeze_at)))
    chain.append(optax.scale_by_schedule(lambda t: -schedule(t)))

    return optax.chain(*chain), schedule
