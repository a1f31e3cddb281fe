#!/usr/bin/env python
"""Evaluation-loop throughput benchmark on a synthetic val split.

Measures `evaluate_dataset` end-to-end (device batches + on-device
postproc + D2H + host evaluators) on an 8-image synthetic Cityscapes
val at 512x1024 — the harness behind BENCH_NOTES §Evaluation. Two
passes: the first pays jit tracing (persistent-cache-backed compiles),
the second is the steady-state number. The D2H payload per image is
also reported, making the r2->r3 output-compaction delta visible
(sem uint8 / panoptic int16 / f16 floats vs all-f32: VERDICT r2 #8).
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/mgnet_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    import jax.numpy as jnp

    from mgnet_tpu.config import load_config
    from mgnet_tpu.data import register_all_cityscapes_scene_seg
    from mgnet_tpu.data.synthetic import make_synthetic_cityscapes_raw
    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.train.trainer import evaluate_dataset

    root = tempfile.mkdtemp(prefix="mgnet_evalbench_")
    make_synthetic_cityscapes_raw(root, "val", n_images=args.images,
                                  height=args.height, width=args.width)
    in_dir = os.path.join(root, "cityscapes", "gtFine", "val")
    out_dir = os.path.join(root, "cityscapes", "gtFine",
                           "cityscapes_panoptic_val")
    subprocess.run(
        [sys.executable, "datasets/prepare_cityscapes.py",
         "--input-dir", in_dir, "--output-dir", out_dir,
         "--json", out_dir + ".json", "--workers", "4"],
        check=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    register_all_cityscapes_scene_seg(root)

    cfg = load_config("configs/MGNet-Cityscapes-Fine.yaml", [
        "MODEL.WEIGHTS", "",
        "INPUT.MIN_SIZE_TEST", str(args.height),
        "INPUT.MAX_SIZE_TEST", str(args.width),
        "TEST.IMS_PER_BATCH", str(args.batch),
        "DATALOADER.NUM_WORKERS", "4",
    ])
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3), jnp.float32),
        train=False)
    params = {"model": variables["params"]}
    stats = variables.get("batch_stats", {})

    for label in ("cold", "steady"):
        t0 = time.time()
        results = evaluate_dataset(cfg, model, params, stats)
        wall = time.time() - t0
        speed = results.get("eval_speed", {})
        print(f"# {label}: wall {wall:.1f} s, "
              f"{speed.get('images_per_s', 0):.2f} img/s "
              f"({int(speed.get('num_images', 0))} images)",
              file=sys.stderr, flush=True)
    import json

    print(json.dumps({
        "metric": "eval_loop_images_per_s",
        "value": round(speed.get("images_per_s", 0.0), 3),
        "images": args.images,
        "hw": [args.height, args.width],
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
