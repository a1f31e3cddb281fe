#!/usr/bin/env python
"""Per-stage profiling of the model forward at inference resolution,
chained-dependency protocol (see bench.py).

Stages: backbone, backbone+GCM, each head without upsample, the
full-resolution upsample tail, full forward. Isolates where the
8 ms forward at 1024x2048 goes.

Usage: python tools/profile_model.py [--h 1024] [--w 2048] [--iters 30]
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
    args = p.parse_args()
    h, w = args.h, args.w

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.train.step import normalize_images
    from mgnet_tpu.geometry.image import interpolate_bilinear

    cfg = get_default_config()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 128, 256, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    vs = {"params": params, "batch_stats": batch_stats}
    pm = tuple(cfg.MODEL.PIXEL_MEAN)
    ps = tuple(cfg.MODEL.PIXEL_STD)

    image = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, h, w, 3)), jnp.float32)

    results = {}

    @jax.jit
    def s_backbone(c):
        x = normalize_images(image + c * 1e-24, pm, ps)
        feats = model.apply(vs, x, train=False, method=model.features)
        return feats["res5"][0, 0, 0, 0].astype(jnp.float32)

    results["backbone+gcm"] = chained(s_backbone, args.iters)

    @jax.jit
    def s_heads_s8(c):
        x = normalize_images(image + c * 1e-24, pm, ps)
        out = model.apply(vs, x, train=False, upsample=False)
        return (out["sem_seg"][0, 0, 0, 0].astype(jnp.float32)
                + out["depth"][0, 0, 0, 0].astype(jnp.float32))

    results["forward_stride8 (no upsample)"] = chained(s_heads_s8, args.iters)

    @jax.jit
    def s_full(c):
        x = normalize_images(image + c * 1e-24, pm, ps)
        out = model.apply(vs, x, train=False)
        return (out["sem_seg"][0, -1, -1, 0].astype(jnp.float32)
                + out["depth"][0, 0, 0, 0].astype(jnp.float32))

    results["forward_full (upsampled)"] = chained(s_full, args.iters)

    # upsample tail in isolation, same dtypes as the model produces
    out_s8 = jax.jit(lambda: model.apply(
        vs, normalize_images(image, pm, ps), train=False, upsample=False))()
    sem8 = out_s8["sem_seg"]
    cen8 = out_s8["center"]
    off8 = out_s8["offset"]
    dep8 = out_s8["depth"]

    @jax.jit
    def s_upsample(c):
        s8 = sem8 + (c * 1e-24).astype(sem8.dtype)
        a = interpolate_bilinear(s8, (h, w))
        b = interpolate_bilinear(cen8, (h, w))
        d = interpolate_bilinear(off8, (h, w)) * 8.0
        e = interpolate_bilinear(dep8, (h, w))
        return (a[0, -1, -1, 0].astype(jnp.float32)
                + b[0, 0, 0, 0].astype(jnp.float32)
                + d[0, 0, 0, 0].astype(jnp.float32)
                + e[0, 0, 0, 0].astype(jnp.float32))

    results["upsample_tail (24ch)"] = chained(s_upsample, args.iters)

    @jax.jit
    def s_upsample_sem(c):
        s8 = sem8 + (c * 1e-24).astype(sem8.dtype)
        a = interpolate_bilinear(s8, (h, w))
        return a[0, -1, -1, 0].astype(jnp.float32)

    results["upsample_sem20 only"] = chained(s_upsample_sem, args.iters)

    @jax.jit
    def s_argmax_full(c):
        s8 = sem8 + (c * 1e-24).astype(sem8.dtype)
        a = interpolate_bilinear(s8, (h, w)).astype(jnp.float32)
        sem = jnp.argmax(a.transpose(0, 3, 1, 2), axis=1)
        return sem[0, -1, -1].astype(jnp.float32)

    results["upsample_sem20+argmax"] = chained(s_argmax_full, args.iters)

    print(f"backend={jax.default_backend()}  {h}x{w}  dtype={model.dtype}")
    for name, sec in results.items():
        print(f"{name:>32s}: {sec * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
