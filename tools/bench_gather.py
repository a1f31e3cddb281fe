#!/usr/bin/env python
"""Microbenchmark: bilinear-warp gather formulations on TPU.

The train-step ledger (tools/profile_train.py) attributes ~95% of the
batch-8 @1024^2 step to the six view-synthesis gathers. This tool
times candidate formulations of ONE warp ([8,1024,1024,3] image,
full-res coords) with the chained protocol to find the floor and pick
the production formulation. Coordinates come from a realistic SfM-style
flow (radial expansion + parallax), not uniform random, so locality-
sensitive variants see representative access patterns.
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


def chained(step_fn, iters=10, warmup=3):
    carry = jnp.float32(0.0)
    for _ in range(warmup):
        carry = step_fn(carry)
    float(carry)
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(carry)
    final = float(carry)
    assert np.isfinite(final)
    return (time.perf_counter() - t0) / iters


def make_inputs(b=8, h=1024, w=1024, c=3, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(b, h, w, c).astype(np.float32)
    # SfM-like flow: radial expansion (forward motion) + smooth parallax
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    t_over_z = 0.05 + 0.15 * (yy / h) ** 2          # nearer at the bottom
    x_src = xx + (xx - cx) * t_over_z
    y_src = yy + (yy - cy) * t_over_z
    x_src += rng.randn(h, w).astype(np.float32) * 0.5
    y_src += rng.randn(h, w).astype(np.float32) * 0.5
    coords = np.stack([2 * x_src / (w - 1) - 1, 2 * y_src / (h - 1) - 1],
                      axis=-1)
    coords = np.broadcast_to(coords, (b, h, w, 2)).copy()
    return jnp.asarray(img), jnp.asarray(coords.astype(np.float32))


def corners(coords, h, w):
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    return (x0c, x1c, y0c, y1c), (wx0, wx1, wy0, wy1)


def variant_take_along(img, coords):
    """Current production: 4 per-corner take_along_axis over [B,HW,C]."""
    b, h, w, c = img.shape
    (x0c, x1c, y0c, y1c), (wx0, wx1, wy0, wy1) = corners(coords, h, w)
    flat = img.reshape(b, h * w, c)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1
                                   ).reshape(b, h, w, c)

    out = (g(y0c, x0c) * (wy0 * wx0)[..., None]
           + g(y0c, x1c) * (wy0 * wx1)[..., None]
           + g(y1c, x0c) * (wy1 * wx0)[..., None]
           + g(y1c, x1c) * (wy1 * wx1)[..., None])
    return out


def variant_planar(img, coords):
    """Channel-planar: 12 flat f32 gathers of [B*C, HW]."""
    b, h, w, c = img.shape
    (x0c, x1c, y0c, y1c), (wx0, wx1, wy0, wy1) = corners(coords, h, w)
    planes = img.transpose(0, 3, 1, 2).reshape(b * c, h * w)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b, 1, -1)
        idx = jnp.broadcast_to(idx, (b, c, idx.shape[-1])).reshape(b * c, -1)
        return jnp.take_along_axis(planes, idx, axis=1).reshape(b, c, h, w)

    out = (g(y0c, x0c) * (wy0 * wx0)[:, None]
           + g(y0c, x1c) * (wy0 * wx1)[:, None]
           + g(y1c, x0c) * (wy1 * wx0)[:, None]
           + g(y1c, x1c) * (wy1 * wx1)[:, None])
    return out.transpose(0, 2, 3, 1)


def variant_patch22(img, coords):
    """One lax.gather of [2,2,C] patches from a (+1,+1) zero-padded image."""
    b, h, w, c = img.shape
    (x0c, _, y0c, _), (wx0, wx1, wy0, wy1) = corners(coords, h, w)
    pad = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))

    def one(imgp, yi, xi):
        idx = jnp.stack([yi.reshape(-1), xi.reshape(-1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        patch = jax.lax.gather(
            imgp, idx, dn, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP)
        return patch  # [HW, 2, 2, C]

    patch = jax.vmap(one)(pad, y0c, x0c).reshape(b, h, w, 2, 2, c)
    out = (patch[..., 0, 0, :] * (wy0 * wx0)[..., None]
           + patch[..., 0, 1, :] * (wy0 * wx1)[..., None]
           + patch[..., 1, 0, :] * (wy1 * wx0)[..., None]
           + patch[..., 1, 1, :] * (wy1 * wx1)[..., None])
    return out


def variant_row2(img, coords):
    """Two gathers of [1,2,C] x-pairs (zero right pad), y corners separate."""
    b, h, w, c = img.shape
    (x0c, _, y0c, y1c), (wx0, wx1, wy0, wy1) = corners(coords, h, w)
    pad = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0)))

    def one(imgp, yi, xi):
        idx = jnp.stack([yi.reshape(-1), xi.reshape(-1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        return jax.lax.gather(
            imgp, idx, dn, slice_sizes=(1, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP)  # [HW, 2, C]

    p0 = jax.vmap(one)(pad, y0c, x0c).reshape(b, h, w, 2, c)
    p1 = jax.vmap(one)(pad, y1c, x0c).reshape(b, h, w, 2, c)
    out = (p0[..., 0, :] * (wy0 * wx0)[..., None]
           + p0[..., 1, :] * (wy0 * wx1)[..., None]
           + p1[..., 0, :] * (wy1 * wx0)[..., None]
           + p1[..., 1, :] * (wy1 * wx1)[..., None])
    return out


def variant_bf16(img, coords):
    """Production formulation with a bf16 image (halved gather bytes)."""
    out = variant_take_along(img.astype(jnp.bfloat16), coords)
    return out.astype(jnp.float32)


def variant_diag_const(img, coords):
    """DIAGNOSTIC (wrong values): all 4 corner indices forced to 0.
    If this is as slow as the real gather, cost is a fixed per-index
    scalar loop; if much faster, cost is memory-randomness-bound and
    locality-aware formulations (banded VMEM) can win."""
    b, h, w, c = img.shape
    (_, _, _, _), (wx0, wx1, wy0, wy1) = corners(coords, h, w)
    flat = img.reshape(b, h * w, c)
    zero = jnp.zeros((b, h, w), jnp.int32)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1
                                   ).reshape(b, h, w, c)

    out = (g(zero, zero) * (wy0 * wx0)[..., None]
           + g(zero, zero) * (wy0 * wx1)[..., None]
           + g(zero, zero) * (wy1 * wx0)[..., None]
           + g(zero, zero) * (wy1 * wx1)[..., None])
    return out


def variant_diag_iota(img, coords):
    """DIAGNOSTIC (wrong values): identity indices (perfect locality)."""
    b, h, w, c = img.shape
    (_, _, _, _), (wx0, wx1, wy0, wy1) = corners(coords, h, w)
    flat = img.reshape(b, h * w, c)
    ident = jnp.broadcast_to(
        jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w), (b, h, w))

    def g(idx2d):
        idx = idx2d.reshape(b, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1
                                   ).reshape(b, h, w, c)

    out = (g(ident) * (wy0 * wx0)[..., None]
           + g(ident) * (wy0 * wx1)[..., None]
           + g(ident) * (wy1 * wx0)[..., None]
           + g(ident) * (wy1 * wx1)[..., None])
    return out


def variant_pallas_banded(img, coords):
    """Banded-matmul Pallas kernel (ops/pallas/warp.py), value only."""
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    return warp_bilinear_banded(img, coords, "zeros", with_grads=False)


def variant_pallas_banded_grads(img, coords):
    """Banded-matmul Pallas kernel incl. the gx/gy derivative fields
    (what the train step actually runs: forward + VJP residuals)."""
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    out, gx, gy = warp_bilinear_banded(img, coords, "zeros",
                                       with_grads=True)
    return out + 0.0 * (gx + gy)


VARIANTS = {
    "take_along_4x": variant_take_along,
    "planar_12x": variant_planar,
    "patch_2x2": variant_patch22,
    "row_pairs_2x": variant_row2,
    "bf16_4x": variant_bf16,
    "pallas_banded": variant_pallas_banded,
    "pallas_banded_grads": variant_pallas_banded_grads,
    "diag_const_idx": variant_diag_const,
    "diag_iota_idx": variant_diag_iota,
}


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", default="")
    args = p.parse_args()

    img, coords = make_inputs(args.batch, args.size, args.size)
    ref = None
    for name, fn in VARIANTS.items():
        if args.only and name not in args.only.split(","):
            continue

        @jax.jit
        def step(carry, fn=fn):
            c2 = coords + carry * jnp.float32(1e-24)
            return fn(img, c2).astype(jnp.float32).sum()

        try:
            out = np.asarray(jax.jit(fn)(img, coords))
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            dt = chained(step, args.iters)
            print(f"{name:16s} {dt * 1e3:9.2f} ms   max|err|={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
