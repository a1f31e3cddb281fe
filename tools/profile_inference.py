#!/usr/bin/env python
"""Stage-by-stage latency breakdown of the fused inference pipeline.

SURVEY.md §5 tracing replacement: identifies the hot op for Pallas
optimization. Run on the real TPU chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=30, name=""):
    out = None
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for i in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1000:8.2f} ms  ({1 / dt:7.1f} fps)")
    return dt


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import argparse

    parser = argparse.ArgumentParser(
        description="Stage-by-stage fused-inference latency breakdown "
                    "(run on a TPU host)")
    parser.add_argument("--tta", action="store_true",
                        help="probe the MSC+flip TTA path device-only "
                             "(chained protocol, true D2H sync)")
    parser.add_argument("--tta-batch", type=int, default=2)
    args = parser.parse_args()

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.catalog import Metadata
    from mgnet_tpu.data.categories import (
        CITYSCAPES_SCENE_SEG_CATEGORIES,
        build_meta,
    )
    from mgnet_tpu.inference.fused import (
        build_fused_inference,
        statics_from_meta,
    )
    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.postprocessing.panoptic import panoptic_fusion
    from mgnet_tpu.postprocessing.depth import dgc_scale_factor
    from mgnet_tpu.train.step import make_eval_step

    H, W = 1024, 2048
    cfg = get_default_config()
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False
    )
    params = {"model": variables["params"]}
    stats = variables.get("batch_stats", {})
    meta = Metadata(name="p").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )
    statics = statics_from_meta(cfg, meta)

    img = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, H, W, 3)), jnp.float32
    )
    K = jnp.asarray(np.array(
        [[[2262.0, 0, 1023.5], [0, 2262.0, 511.5], [0, 0, 1]]], np.float32
    ))
    ch = jnp.asarray([1.22], jnp.float32)

    if args.tta:
        # Device-only cost of the MSC+flip TTA executable (the relay
        # D2H that dominates tools/generate_pseudo_labels.py steady
        # state is excluded by construction: only a scalar leaves the
        # chip per step). Chained protocol per BENCH_NOTES §protocol.
        from functools import partial

        from mgnet_tpu.inference.tta import multi_scale_flip_inference
        from mgnet_tpu.train.step import normalize_images

        B = args.tta_batch
        imgs = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (B, H, W, 3)),
            jnp.float32)

        @jax.jit
        def tta_step(carry, x):
            v = {"params": params["model"], "batch_stats": stats}
            xn = normalize_images(
                x + carry * 0, tuple(cfg.MODEL.PIXEL_MEAN),
                tuple(cfg.MODEL.PIXEL_STD))
            out = multi_scale_flip_inference(
                model, v, xn, with_panoptic=True, with_depth=False)
            sem = jnp.argmax(out["sem_seg"], axis=-1).astype(jnp.int32)
            fuse = partial(
                panoptic_fusion, num_classes=statics.num_classes,
                last_stuff_id=statics.last_stuff_id,
                label_divisor=statics.label_divisor,
                stuff_area=statics.stuff_area, void_label=-1,
                threshold=statics.center_threshold,
                nms_kernel=statics.nms_kernel,
                max_instances=statics.max_instances)
            pan = jax.vmap(fuse)(sem, out["center"][..., 0],
                                 out["offset"])
            return carry + jnp.sum(pan).astype(jnp.float32)

        carry = jnp.float32(0.0)
        for _ in range(3):
            carry = tta_step(carry, imgs)
        float(carry)
        carry = jnp.float32(0.0)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = tta_step(carry, imgs)
        assert np.isfinite(float(carry))
        dt = (time.perf_counter() - t0) / iters
        print(f"TTA MSC+flip batch {B} @ {H}x{W}: {dt * 1e3:.1f} ms/step"
              f" = {dt / B * 1e3:.1f} ms/img ({B / dt:.2f} img/s)")
        return

    # 0. dispatch overhead through the tunnel
    noop = jax.jit(lambda x: x + 1.0)
    bench(noop, (jnp.zeros((8, 128)),), name="dispatch overhead (noop)")

    # 1. raw model forward (all heads, upsampled)
    raw = jax.jit(make_eval_step(cfg, model))
    bench(raw, (params, stats, img), name="model forward (heads upsampled)")

    # 1b. model forward without upsample
    def fwd_nops(p, s, x):
        v = {"params": p["model"], "batch_stats": s}
        xn = (x / 255.0 - 0.45) / 0.225
        return model.apply(v, xn, train=False, upsample=False)

    bench(jax.jit(fwd_nops), (params, stats, img),
          name="model forward (no upsample)")

    # 2. panoptic fusion alone
    sem = jnp.zeros((H, W), jnp.int32)
    center = jnp.zeros((H, W), jnp.float32)
    offset = jnp.zeros((H, W, 2), jnp.float32)

    def fuse(s, c, o):
        return panoptic_fusion(
            s, c, o, num_classes=20, last_stuff_id=11,
            label_divisor=1000, stuff_area=2048, void_label=-1,
            threshold=0.3, nms_kernel=7, max_instances=128,
        )

    bench(jax.jit(fuse), (sem, center, offset), name="panoptic fusion")

    # 3. DGC scale factor alone (includes masked-median sort)
    pts = jnp.asarray(
        np.random.RandomState(1).randn(1, H, W, 3), jnp.float32
    )
    mask = jnp.asarray(
        np.random.RandomState(2).rand(1, H, W) > 0.7
    )
    bench(jax.jit(dgc_scale_factor), (pts, jnp.asarray([1.22]), mask),
          name="DGC scale (normals+median)")

    # 4. full fused
    fused = jax.jit(build_fused_inference(
        model, statics, tuple(cfg.MODEL.PIXEL_MEAN),
        tuple(cfg.MODEL.PIXEL_STD),
    ))

    def fused_call(p, s, x, k, c):
        return fused(p, s, x, camera_matrix=k, camera_height=c)

    bench(fused_call, (params, stats, img, K, ch), name="full fused pipeline")


if __name__ == "__main__":
    main()
