#!/usr/bin/env python
"""Benchmark: fused joint panoptic+depth inference at 1024x2048.

Mirrors the reference's TensorRT latency benchmark
(reference: trt_inference/main.cpp:207-235 — 10-iteration warmup, then
steady-state per-frame wall clock on the full model + post-processing
pipeline). Here the whole pipeline is ONE XLA executable on a single TPU
chip. Baseline target: >= 30 fps (BASELINE.md north star).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat runs skip the multi-minute compile
try:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/mgnet_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.categories import (
        CITYSCAPES_SCENE_SEG_CATEGORIES,
        build_meta,
    )
    from mgnet_tpu.data.catalog import Metadata
    from mgnet_tpu.inference.fused import (
        build_fused_inference,
        statics_from_meta,
    )
    from mgnet_tpu.models.mgnet import build_model

    height, width = 1024, 2048
    cfg = get_default_config()
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    # init at small size (params are shape-independent), run at full res
    dummy = jnp.zeros((1, 128, 256, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    params = {"model": variables["params"]}
    batch_stats = variables.get("batch_stats", {})

    meta = Metadata(name="bench").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )
    statics = statics_from_meta(cfg, meta)
    fused_raw = build_fused_inference(
        model, statics,
        tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD),
    )

    # Return the full outputs plus a scalar probe computed inside the
    # executable: reading the probe forces completion of the whole frame
    # with a single tiny D2H transfer and no per-frame retracing.
    def fused_probe(params, batch_stats, image, camera_matrix,
                    camera_height):
        out = fused_raw(params, batch_stats, image,
                        camera_matrix=camera_matrix,
                        camera_height=camera_height)
        probe = (out["depth"][0, 0, 0]
                 + out["panoptic"][0, 0, 0].astype(jnp.float32))
        return out, probe

    fused = jax.jit(fused_probe)

    image = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, height, width, 3)),
        jnp.float32,
    )
    K = jnp.asarray(
        np.array([[[2262.52, 0, 1096.98],
                   [0, 2265.30, 513.137],
                   [0, 0, 1]]], np.float32)
    )
    cam_h = jnp.asarray([1.22], jnp.float32)

    # warmup (compile + cache)
    for _ in range(10):
        out, probe = fused(params, batch_stats, image, K, cam_h)
    jax.block_until_ready(out)

    # steady state: distinct pre-materialized frame per iteration (prevents
    # duplicate-computation caching), blocking on each result — matching
    # the reference's per-frame enqueue + streamSync wall-clock measurement
    # (trt_inference/main.cpp:214-235).
    iters = 50
    frames = [
        jax.block_until_ready(image + float(i)) for i in range(iters)
    ]
    # block on device completion of ALL outputs every frame (the
    # stream-sync analog; standard JAX benchmarking protocol).
    # NOTE: through the axon host tunnel an actual per-frame host
    # readback measures tunnel round-trips (~seconds), not the TPU, so
    # completion blocking is the honest viable protocol here
    # (see BENCH_NOTES.md).
    t0 = time.perf_counter()
    for f in frames:
        out, probe = fused(params, batch_stats, f, K, cam_h)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = iters / dt
    print(json.dumps({
        "metric": "joint_panoptic_depth_inference_fps_1024x2048",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
