"""Panoptic fusion post-processing, fully on-device under XLA.

Behavioral parity with reference: mgnet/postprocessing/panoptic_post_proc.py
(center NMS via thresholded max-pool; offset-based pixel-to-center
clustering; per-cluster majority class vote; stuff-area filtering;
panoptic id = class_id * label_divisor + instance).

TPU-first redesign (SURVEY.md §7 hard part #1): the reference's dynamic
``torch.nonzero`` center extraction and boolean masked scatters become a
fixed-K formulation — top-K NMS'd peaks with validity masks, a chunked
[pixels, K] squared-distance argmin (MXU-friendly, bounded memory), and
one-hot scatter-add class voting. Everything is jit-compatible with static
shapes, so fusion compiles into the single-executable inference path
(replacing the reference's CPU/TorchScript plugin).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["panoptic_fusion", "find_instance_centers"]


def _tiny_table_lookup(indices: jnp.ndarray, table: jnp.ndarray,
                       chunk: int = 256 * 1024) -> jnp.ndarray:
    """table[indices] for a small table without a gather.

    A 2M-element gather from even a 129-entry table costs ~20 ms on one
    v5e chip (gathers serialize); the one-hot @ table matvec streams at
    HBM bandwidth instead (~1.5 ms). Constraints: index values must be
    < len(table), and table values must be exactly representable in
    bf16 (integers with |v| <= 256) — callers here look up class ids
    (< num_classes) and boolean flags, both exact.
    """
    n = table.shape[0]
    flat = indices.reshape(-1)
    size = flat.shape[0]
    pad = (-size) % chunk
    n_chunks = (size + pad) // chunk
    table_bf = table.astype(jnp.bfloat16)[:, None]

    def chunk_lookup(ix):
        onehot = (ix[:, None] == jnp.arange(n)[None, :]).astype(
            jnp.bfloat16)
        return jax.lax.dot(
            onehot, table_bf,
            preferred_element_type=jnp.float32,
        )[:, 0]

    out = jax.lax.map(
        chunk_lookup, jnp.pad(flat, (0, pad)).reshape(n_chunks, chunk)
    ).reshape(-1)[:size]
    return out.astype(table.dtype).reshape(indices.shape)


def _topk_2stage(x: jnp.ndarray, k: int, rows: int = 256):
    """Exact top-k of a flat array via per-row top-k then a merge top-k.

    A single lax.top_k over 2M elements costs ~5 ms on v5e; splitting
    into 256 row-wise top-k's and merging the 256*k candidates measures
    ~3 ms with identical results (ties broken by lower index, matching
    lax.top_k, as long as no row holds more than k cutoff-value ties).
    Caveat: post-NMS heatmaps are mostly the -1.0 sentinel, which DOES
    tie massively — so index agreement with lax.top_k is only guaranteed
    for entries whose value is above the tie plateau (scores > threshold);
    filler/invalid slots may carry different indices. Callers must mask on
    ``scores > 0`` (as find_instance_centers does) and never rely on the
    indices of invalid slots. Falls back to a single top_k for small
    inputs.
    """
    n = x.shape[0]
    if n < rows * k * 2:
        return jax.lax.top_k(x, k)
    pad = (-n) % rows
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=-jnp.inf)
    xr = x.reshape(rows, -1)
    v, i = jax.lax.top_k(xr, k)                       # [rows, k]
    gi = (i + (jnp.arange(rows) * xr.shape[1])[:, None]).reshape(-1)
    v2, i2 = jax.lax.top_k(v.reshape(-1), k)
    return v2, jnp.take(gi, i2)


def _max_pool_2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k stride-1 same-size max pool on [H, W]."""
    pad = (k - 1) // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), ((pad, pad), (pad, pad))
    )


def find_instance_centers(center_heatmap: jnp.ndarray, threshold: float,
                          nms_kernel: int, max_instances: int):
    """NMS'd top-K instance centers from a [H, W] heatmap.

    Returns (centers_yx [K, 2] float32, valid [K] bool, scores [K]).
    Parity: reference panoptic_post_proc.py:52-63, with the dynamic
    ``nonzero`` replaced by fixed-K ``top_k``.
    """
    h, w = center_heatmap.shape
    c = center_heatmap.astype(jnp.float32)
    c = jnp.where(c > threshold, c, -1.0)
    pooled = _max_pool_2d(c, nms_kernel)
    keep = jnp.where(c == pooled, c, -1.0)
    scores, flat_idx = _topk_2stage(keep.reshape(-1), max_instances)
    ys = (flat_idx // w).astype(jnp.float32)
    xs = (flat_idx % w).astype(jnp.float32)
    valid = scores > 0
    return jnp.stack([ys, xs], axis=-1), valid, scores


def _cluster_pixels(centers_yx: jnp.ndarray, valid: jnp.ndarray,
                    offsets: jnp.ndarray, thing_mask: jnp.ndarray,
                    chunk_rows: int = 128,
                    use_pallas: bool = False) -> jnp.ndarray:
    """Assign each thing pixel to its nearest center; 0 = stuff/unassigned.

    offsets: [H, W, 2] (dy, dx). Returns [H, W] int32 cluster ids in
    [0, K], where id k corresponds to centers_yx[k-1].

    Default path: the [pixels, K] distance matrix is evaluated in
    row-chunks via ``lax.map`` to bound live memory at full 1024x2048
    resolution. ``use_pallas`` switches to the VMEM-resident kernel
    (ops/pallas/center_argmin.py).
    """
    h, w, _ = offsets.shape
    k = centers_yx.shape[0]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = ys + offsets[..., 0]
    px = xs + offsets[..., 1]
    pts = jnp.stack([py, px], axis=-1)  # [H, W, 2]

    if use_pallas and jax.default_backend() == "tpu":
        from mgnet_tpu.ops.pallas.center_argmin import center_argmin

        assign = center_argmin(pts, centers_yx, valid)
    else:
        big = jnp.float32(1e12)
        cy = jnp.where(valid[:, None], centers_yx, big)

        # pad rows to a multiple of chunk_rows
        pad_rows = (-h) % chunk_rows
        pts_p = jnp.pad(pts, ((0, pad_rows), (0, 0), (0, 0)))
        n_chunks = (h + pad_rows) // chunk_rows
        pts_c = pts_p.reshape(n_chunks, chunk_rows * w, 2)

        def chunk_argmin(p):
            # [chunk, 2] vs [K, 2] -> [chunk, K] squared distances
            d = jnp.sum((p[:, None, :] - cy[None, :, :]) ** 2, axis=-1)
            return jnp.argmin(d, axis=-1).astype(jnp.int32)

        assign = jax.lax.map(chunk_argmin, pts_c).reshape(-1)[
            : h * w].reshape(h, w)
    any_valid = jnp.any(valid)
    cluster = jnp.where(thing_mask & any_valid, assign + 1, 0)
    return cluster


@partial(
    jax.jit,
    static_argnames=(
        "num_classes", "last_stuff_id", "label_divisor", "stuff_area",
        "void_label", "threshold", "nms_kernel", "max_instances",
        "use_pallas",
    ),
)
def panoptic_fusion(
    sem_seg: jnp.ndarray,
    center_heatmap: jnp.ndarray,
    offsets: jnp.ndarray,
    *,
    num_classes: int,
    last_stuff_id: int,
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    void_label: int = -1,
    threshold: float = 0.3,
    nms_kernel: int = 7,
    max_instances: int = 128,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Fuse semantic prediction + instance embeddings into a panoptic map.

    Args:
        sem_seg: [H, W] int predicted semantic train ids (argmax).
        center_heatmap: [H, W] float center scores in [0, 1].
        offsets: [H, W, 2] float (dy, dx) offsets in pixels.

    Returns:
        [H, W] int32 panoptic map: class_id * label_divisor + instance
        (instance 0 for stuff), void_label where filtered.
    """
    h, w = sem_seg.shape
    sem = sem_seg.astype(jnp.int32)
    thing_mask = sem > last_stuff_id

    centers, valid, _ = find_instance_centers(
        center_heatmap, threshold, nms_kernel, max_instances
    )

    # ---- cluster + vote counts ----
    # counts[k, c] = |{pixels : cluster == k and sem == c}| over ALL
    # pixels: rows k>=1 are the thing-class majority vote (cluster>=1
    # pixels are exactly the assigned thing pixels), and row 0 doubles as
    # the per-class stuff-area histogram (cluster-0 pixels keep sem).
    n_k = max_instances + 1
    cluster = _cluster_pixels(centers, valid, offsets, thing_mask,
                              use_pallas=use_pallas)
    # A scatter-add here serializes on TPU (~16 ms at 1024x2048); instead
    # evaluate counts as a one-hot(cluster)^T @ one-hot(sem) matmul in
    # row-chunks — MXU work + streaming one-hot materialization. (A fused
    # Pallas cluster+count kernel was tried and LOST: the K+1=129 lane
    # padding to 256 and per-block batched matmuls cost ~7 ms vs ~5.7 ms
    # for pallas-argmin + this chunked XLA matmul; see BENCH_NOTES.md.)
    flat_cluster = cluster.reshape(-1)
    flat_sem = sem.reshape(-1)
    chunk = 128 * w
    pad = (-flat_cluster.shape[0]) % chunk
    n_chunks = (flat_cluster.shape[0] + pad) // chunk

    def chunk_counts(args):
        cl, se = args
        a = cl[:, None] == jnp.arange(n_k)[None, :]
        b = se[:, None] == jnp.arange(num_classes)[None, :]
        return jax.lax.dot(
            a.astype(jnp.bfloat16).T, b.astype(jnp.bfloat16),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    counts = jnp.sum(
        jax.lax.map(
            chunk_counts,
            (
                jnp.pad(flat_cluster, (0, pad)).reshape(n_chunks, chunk),
                # pad with out-of-range ids: no count column
                jnp.pad(flat_sem, (0, pad),
                        constant_values=num_classes
                        ).reshape(n_chunks, chunk),
            ),
        ),
        axis=0,
    )

    # restrict the vote to thing classes
    class_range = jnp.arange(num_classes)
    thing_class = class_range > last_stuff_id
    voted_class = jnp.argmax(
        jnp.where(thing_class[None, :], counts, -1.0), axis=-1
    ).astype(jnp.int32)  # [K+1]

    # ---- stuff area filter (reference :64-66) ----
    stuff_counts = counts[0, : last_stuff_id + 1]
    small_stuff = stuff_counts < stuff_area

    # panoptic id for cluster k>=1: voted_class[k]*divisor + k. The
    # per-pixel voted-class lookup goes through the matvec helper — a
    # plain table[cluster] gather costs ~20 ms at 2M pixels.
    vc_pixel = _tiny_table_lookup(cluster, voted_class)
    # gather-free boolean lookup: pixel is small-stuff iff its semantic
    # label matches any below-area stuff class
    stuff_ids = jnp.arange(last_stuff_id + 1)
    small_pixel = jnp.any(
        (sem.reshape(-1, 1) == stuff_ids[None, :]) & small_stuff[None, :],
        axis=-1,
    ).reshape(sem.shape)
    pan = jnp.where(
        cluster > 0,
        vc_pixel * label_divisor + cluster,
        jnp.where(
            (sem <= last_stuff_id) & small_pixel,
            void_label,
            sem * label_divisor,
        ),
    )
    return pan.astype(jnp.int32)
