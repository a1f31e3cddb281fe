"""Segmentation / instance-embedding losses.

Behavioral parity with reference: mgnet/modeling/loss.py (DeepLabCE,
OhemCE) and mgnet/modeling/mg_net.py:697-715 (weighted center MSE /
offset L1 normalized by weight sums).

TPU-first: the reference's OHEM sorts every pixel loss in the batch
(reference: loss.py:75) — a 12M-element descending sort per step on GPU.
Here hard-example selection uses a fixed-iteration binary search for the
k-th largest value (pure reductions, no sort), which XLA vectorizes and
fuses; semantics match the sort-based formulation to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cross_entropy_loss",
    "deeplab_ce_loss",
    "ohem_ce_loss",
    "center_loss",
    "offset_loss",
    "topk_sum",
]


def _per_pixel_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_label: int) -> jnp.ndarray:
    """Per-pixel CE with ignore handling. logits [B,H,W,C], labels [B,H,W].

    Ignored pixels get loss 0 (torch CrossEntropyLoss(ignore_index)
    semantics with reduction='none').
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    # one-hot select instead of take_along_axis: the per-pixel gather
    # serializes on TPU and its backward is a scatter; the compare+reduce
    # fuses into the logsumexp pass and its backward is a broadcast
    onehot = safe_labels[..., None].astype(jnp.int32) == jnp.arange(
        logits.shape[-1])
    picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
    ce = logz - picked
    return jnp.where(valid, ce, 0.0), valid


def cross_entropy_loss(logits, labels, weights=None, ignore_label: int = 255):
    """Mean CE over non-ignored pixels, with optional per-pixel weights."""
    ce, valid = _per_pixel_ce(logits, labels, ignore_label)
    if weights is not None:
        ce = ce * weights
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(ce) / denom


def _kth_largest(x: jnp.ndarray, k: int, iters: int = 24) -> jnp.ndarray:
    """Approximate k-th largest value of flat non-negative ``x`` via binary
    search on the value axis (vs. the reference's full 12M-element
    descending sort, loss.py:75). Pure fused reductions — no sorts, no
    scatters (both serialize badly on TPU).

    The result is piecewise-constant in ``x`` (zero gradient a.e.), so the
    search runs on a stop_gradient copy. Without this, the ``jnp.max``
    seed makes the whole 24-iteration loop reverse-differentiable and XLA
    rematerializes the upstream CE/upsample chain per iteration — measured
    3.5 s (!) per train step at 2x1024x1024 vs 36 ms with the gradient
    stopped."""
    x = jax.lax.stop_gradient(x)
    lo = jnp.zeros((), jnp.float32)
    hi = jnp.max(x) + 1e-6

    # static unroll: fori_loop's per-iteration barriers block XLA from
    # overlapping the count reductions with surrounding work (the same
    # unroll took the DGC median from 2.0 to 1.4 ms, BENCH_NOTES.md)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        count = jnp.sum(x > mid)
        # If at least k elements exceed mid, the k-th largest is above mid.
        lo = jnp.where(count >= k, mid, lo)
        hi = jnp.where(count >= k, hi, mid)
    return lo


def topk_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sum of the k largest values of flat non-negative ``x`` without sorting.

    Counts elements above the histogram-quantile threshold t, then corrects
    the boundary: sum = sum(x > t) + (k - count) * t.
    """
    t = _kth_largest(x, k)
    above = x > t
    count = jnp.sum(above)
    s = jnp.sum(jnp.where(above, x, 0.0))
    return s + (k - count).astype(jnp.float32) * t


def deeplab_ce_loss(logits, labels, weights=None, ignore_label: int = 255,
                    top_k_percent: float = 1.0):
    """Hard-pixel-mining CE: mean over the top-k% pixel losses.

    Parity: reference loss.py:9-42 (DeepLabCE).
    """
    ce, valid = _per_pixel_ce(logits, labels, ignore_label)
    if weights is not None:
        ce = ce * weights
    flat = ce.reshape(-1)
    if top_k_percent >= 1.0:
        return jnp.mean(flat)
    k = int(top_k_percent * flat.shape[0])
    return topk_sum(flat, k) / k


def ohem_ce_loss(logits, labels, weights=None, ignore_label: int = 255,
                 ohem_threshold: float = 0.7, n_min: int = 100000):
    """Online hard example mining CE.

    Parity: reference loss.py:45-81 (OhemCE): with pixel losses sorted
    descending, if the (n_min+1)-th loss exceeds -log(threshold) keep all
    losses above the threshold, else keep the top n_min; return the mean.
    """
    ce, valid = _per_pixel_ce(logits, labels, ignore_label)
    if weights is not None:
        ce = ce * weights
    flat = ce.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    n_min = min(n_min, n - 1)
    thresh = -jnp.log(jnp.asarray(ohem_threshold, jnp.float32))

    above = flat > thresh
    count_above = jnp.sum(above)
    sum_above = jnp.sum(jnp.where(above, flat, 0.0))
    mean_above = sum_above / jnp.maximum(count_above, 1).astype(jnp.float32)

    mean_topk = topk_sum(flat, n_min) / n_min

    # reference keeps losses > thresh when sorted[n_min] > thresh,
    # i.e. when strictly more than n_min losses exceed the threshold.
    return jnp.where(count_above > n_min, mean_above, mean_topk)


def center_loss(pred, target, weights):
    """Weighted MSE for the center heatmap, normalized by the weight sum.

    Parity: reference mg_net.py:697-704. pred/target [B,H,W,1],
    weights [B,H,W] or [B,H,W,1].
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if weights.ndim == pred.ndim - 1:
        weights = weights[..., None]
    weights = weights.astype(jnp.float32)
    loss = jnp.sum((pred - target) ** 2 * weights)
    wsum = jnp.sum(weights)
    return jnp.where(wsum > 0, loss / jnp.maximum(wsum, 1e-12), 0.0)


def offset_loss(pred, target, weights):
    """Weighted L1 for offsets, normalized by the weight sum.

    Parity: reference mg_net.py:705-711. pred/target [B,H,W,2],
    weights [B,H,W] or [B,H,W,1] (broadcasts over the 2 channels, matching
    the reference where the [B,1,H,W] weight broadcasts — its sum is NOT
    doubled).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if weights.ndim == pred.ndim - 1:
        weights = weights[..., None]
    weights = weights.astype(jnp.float32)
    loss = jnp.sum(jnp.abs(pred - target) * weights)
    wsum = jnp.sum(weights)
    return jnp.where(wsum > 0, loss / jnp.maximum(wsum, 1e-12), 0.0)
