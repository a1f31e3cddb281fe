#!/usr/bin/env python
"""A/B the planar vs NHWC dataflow of the photometric-loss kernels.

Round-5 context: the loss moved to channel-planar [B,C,H,W] end to end
on the theory that the NHWC<->planar relayouts around the Pallas
warp/SSIM kernels were the residual train-step glue (BENCH_NOTES round-5
ledger). This tool measures each kernel standalone in both layouts plus
the warp->SSIM residual pair (the composition the loss actually runs),
chained protocol, so the theory is settled by numbers per the
delete-if-it-loses discipline.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def chained(fn, x0, iters, warmup=3):
    """Chained-dependency timing: fold a scalar probe into the input."""
    probe = jnp.float32(0.0)
    for _ in range(warmup):
        probe = fn(x0, probe)
    float(probe)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        probe = fn(x0, probe)
    float(probe)
    return (time.perf_counter() - t0) / iters


def sfm_coords(b, h, w, scale=1.05, jitter=0.5, seed=0):
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = (xs - w / 2) * scale + w / 2 + rng.randn(h, w) * jitter
    y = (ys - h / 2) * scale + h / 2 + rng.randn(h, w) * jitter
    cx = 2 * x / (w - 1) - 1
    cy = 2 * y / (h - 1) - 1
    c = np.stack([cx, cy], -1)[None].repeat(b, 0).astype(np.float32)
    return jnp.asarray(c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from mgnet_tpu.ops.pallas.ssim import fused_photometric_residual
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    b, s = args.batch, args.size
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    img_pl = img.transpose(0, 3, 1, 2)
    tgt = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    tgt_pl = tgt.transpose(0, 3, 1, 2)
    coords = sfm_coords(b, s, s)

    # ---- warp kernel fwd + fields --------------------------------------
    @jax.jit
    def warp_nhwc(im, p):
        o, gx, gy = warp_bilinear_banded(
            im + p * 1e-24, coords, "zeros", with_grads=True, band_terms=2)
        return jnp.sum(o) + jnp.sum(gx) + jnp.sum(gy)

    @jax.jit
    def warp_planar(im, p):
        o, gx, gy = warp_bilinear_banded(
            im + p * 1e-24, coords, "zeros", with_grads=True, band_terms=2,
            planar=True)
        return jnp.sum(o) + jnp.sum(gx) + jnp.sum(gy)

    t = chained(warp_nhwc, img, args.iters)
    print(f"warp  NHWC   in/out: {t * 1e3:7.2f} ms")
    t = chained(warp_planar, img_pl, args.iters)
    print(f"warp  planar in/out: {t * 1e3:7.2f} ms")

    # ---- SSIM residual fwd+bwd -----------------------------------------
    @jax.jit
    def ssim_nhwc(x, p):
        def loss(a):
            return jnp.sum(fused_photometric_residual(a, tgt) ** 2)
        v, g = jax.value_and_grad(loss)(x + p * 1e-24)
        return v + jnp.sum(g)

    @jax.jit
    def ssim_planar(x, p):
        def loss(a):
            return jnp.sum(
                fused_photometric_residual(a, tgt_pl, planar=True) ** 2)
        v, g = jax.value_and_grad(loss)(x + p * 1e-24)
        return v + jnp.sum(g)

    t = chained(ssim_nhwc, img, args.iters)
    print(f"ssim  NHWC   fwd+bwd: {t * 1e3:7.2f} ms")
    t = chained(ssim_planar, img_pl, args.iters)
    print(f"ssim  planar fwd+bwd: {t * 1e3:7.2f} ms")

    # ---- composed warp -> residual, grad wrt coords via custom VJP -----
    from mgnet_tpu.geometry.image import grid_sample, grid_sample_planar

    @jax.jit
    def pair_nhwc(c, p):
        def loss(cc):
            w_ = grid_sample(img, cc, "zeros", use_pallas="fast")
            return jnp.sum(fused_photometric_residual(w_, tgt))
        v, g = jax.value_and_grad(loss)(c + p * 1e-24)
        return v + jnp.sum(g)

    @jax.jit
    def pair_planar(c, p):
        def loss(cc):
            w_ = grid_sample_planar(img_pl, cc, "zeros", use_pallas="fast")
            return jnp.sum(
                fused_photometric_residual(w_, tgt_pl, planar=True))
        v, g = jax.value_and_grad(loss)(c + p * 1e-24)
        return v + jnp.sum(g)

    t = chained(pair_nhwc, coords, args.iters)
    print(f"pair  NHWC   (warp->ssim, dcoords): {t * 1e3:7.2f} ms")
    t = chained(pair_planar, coords, args.iters)
    print(f"pair  planar (warp->ssim, dcoords): {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
