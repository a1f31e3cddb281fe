#!/usr/bin/env python
"""Per-stage profiling of the post-processing pipeline on the current
backend, with the chained-dependency protocol (see bench.py): each
iteration's input depends on the previous output, so stages cannot
overlap and async completion cannot be acknowledged optimistically.

Usage: python tools/profile_postproc.py [--h 1024] [--w 2048] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/mgnet_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def chained(step_fn, iters=30, warmup=5):
    carry = jnp.float32(0.0)
    for _ in range(warmup):
        carry = step_fn(carry)
    float(carry)
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(carry)
    final = float(carry)
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return dt / iters


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=1024)
    p.add_argument("--w", type=int, default=2048)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--k", type=int, default=128)
    args = p.parse_args()
    h, w, k = args.h, args.w, args.k

    from mgnet_tpu.postprocessing.panoptic import (
        _cluster_pixels,
        _max_pool_2d,
        find_instance_centers,
        panoptic_fusion,
    )
    from mgnet_tpu.postprocessing.depth import (
        _masked_median,
        dgc_scale_factor,
        surface_normals,
    )

    rng = np.random.RandomState(0)
    sem = jnp.asarray(rng.randint(0, 20, (h, w)), jnp.int32)
    center = jnp.asarray(rng.rand(h, w), jnp.float32)
    offsets = jnp.asarray(rng.randn(h, w, 2) * 10, jnp.float32)
    points = jnp.asarray(rng.rand(1, h, w, 3) * 50 + 0.5, jnp.float32)
    mask = jnp.asarray(rng.rand(1, h, w) > 0.5)
    heights = jnp.abs(points[..., 1])
    cam_h = jnp.asarray([1.22], jnp.float32)

    results = {}

    @jax.jit
    def s_nms(c):
        x = center + c * 1e-24
        pooled = _max_pool_2d(jnp.where(x > 0.3, x, -1.0), 7)
        return pooled[0, 0]

    results["nms_maxpool7"] = chained(s_nms, args.iters)

    @jax.jit
    def s_topk(c):
        x = center + c * 1e-24
        centers, valid, scores = find_instance_centers(x, 0.3, 7, k)
        return centers[0, 0] + scores[0]

    results["nms+topk"] = chained(s_topk, args.iters)

    centers0, valid0, _ = jax.jit(
        lambda: find_instance_centers(center, 0.3, 7, k))()
    thing = sem > 11

    def cluster_step(use_pallas):
        @jax.jit
        def s(c):
            off = offsets + c * 1e-24
            a = _cluster_pixels(centers0, valid0, off, thing,
                                use_pallas=use_pallas)
            return a[0, 0].astype(jnp.float32)

        return s

    results["cluster_xla"] = chained(cluster_step(False), args.iters)
    if jax.default_backend() == "tpu":
        results["cluster_pallas"] = chained(cluster_step(True), args.iters)

    cluster0 = jax.jit(lambda: _cluster_pixels(
        centers0, valid0, offsets, thing, use_pallas=False))()

    @jax.jit
    def s_vote_scatter(c):
        cl = cluster0 + (c * 1e-24).astype(jnp.int32)
        num_classes = 20
        num_bins = (k + 1) * num_classes
        flat_bin = (cl * num_classes + sem).reshape(-1)
        votes = jnp.where(thing, 1, 0).reshape(-1)
        counts = jnp.zeros((num_bins,), jnp.int32).at[flat_bin].add(votes)
        return counts[0].astype(jnp.float32)

    results["vote_scatter(old)"] = chained(s_vote_scatter, args.iters)

    @jax.jit
    def s_vote_matmul(c):
        cl = cluster0 + (c * 1e-24).astype(jnp.int32)
        num_classes = 20
        n_k = k + 1
        flat_cluster = cl.reshape(-1)
        flat_sem = jnp.where(thing, sem, 0).reshape(-1)
        votes = thing.reshape(-1)
        chunk = 128 * w
        n_chunks = flat_cluster.shape[0] // chunk

        def chunk_counts(xs):
            clc, sec, voc = xs
            a = (clc[:, None] == jnp.arange(n_k)[None, :]) & voc[:, None]
            b = sec[:, None] == jnp.arange(num_classes)[None, :]
            return jax.lax.dot(
                a.astype(jnp.bfloat16).T, b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

        counts = jnp.sum(jax.lax.map(chunk_counts, (
            flat_cluster.reshape(n_chunks, chunk),
            flat_sem.reshape(n_chunks, chunk),
            votes.reshape(n_chunks, chunk))), axis=0)
        return counts[0, 0]

    results["vote_matmul(new)"] = chained(s_vote_matmul, args.iters)

    @jax.jit
    def s_stuff_reduce(c):
        pan = sem + (c * 1e-24).astype(jnp.int32)
        is_stuff = (pan >= 0) & (pan <= 11)
        counts = jnp.sum(
            (pan.reshape(-1, 1) == jnp.arange(12)[None, :])
            & is_stuff.reshape(-1, 1), axis=0)
        return counts[0].astype(jnp.float32)

    results["stuff_reduce(new)"] = chained(s_stuff_reduce, args.iters)

    @jax.jit
    def s_argmax(c):
        logits = jnp.zeros((h, w, 20), jnp.float32) + c * 1e-24
        return jnp.argmax(logits, axis=-1).astype(jnp.float32)[0, 0]

    results["sem_argmax20"] = chained(s_argmax, args.iters)

    def fusion_step(use_pallas):
        @jax.jit
        def s(c):
            x = center + c * 1e-24
            pan = panoptic_fusion(
                sem, x, offsets, num_classes=20, last_stuff_id=11,
                use_pallas=use_pallas)
            return pan[0, 0].astype(jnp.float32)

        return s

    results["fusion_full_xla"] = chained(fusion_step(False), args.iters)
    if jax.default_backend() == "tpu":
        results["fusion_full_pallas"] = chained(
            fusion_step(True), args.iters)

    @jax.jit
    def s_normals(c):
        pts = points + c * 1e-24
        n = surface_normals(pts)
        return n[0, 0, 0, 0]

    results["surface_normals"] = chained(s_normals, args.iters)

    @jax.jit
    def s_median(c):
        hts = heights + c * 1e-24
        return jax.vmap(_masked_median)(hts, mask)[0]

    results["masked_median"] = chained(s_median, args.iters)

    @jax.jit
    def s_dgc(c):
        pts = points + c * 1e-24
        return dgc_scale_factor(pts, cam_h, mask)[0]

    results["dgc_full"] = chained(s_dgc, args.iters)

    print(f"backend={jax.default_backend()}  {h}x{w}  K={k}")
    for name, sec in results.items():
        print(f"{name:>22s}: {sec * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
