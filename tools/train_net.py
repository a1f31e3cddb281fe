#!/usr/bin/env python
"""Training / evaluation entry point.

Parity with reference: tools/train_net.py — config setup with timestamped
output subdir + git commit capture, dataset registration, train with
resume, or --eval-only writing metrics.json. The reference's
``launch(num_gpus)`` process spawn is unnecessary: one controller drives
the whole TPU mesh (SPMD), multi-host via jax.distributed.initialize.
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def setup(args):
    from mgnet_tpu.config import load_config

    cfg = load_config(args.config_file, args.opts)
    if cfg.WRITE_OUTPUT_TO_SUBDIR and not args.eval_only:
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        name = os.path.splitext(os.path.basename(args.config_file or "run"))[0]
        cfg.OUTPUT_DIR = os.path.join(cfg.OUTPUT_DIR, f"{stamp}_{name}")
    try:
        cfg.COMMIT_ID = subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL,
        ).decode().strip()
    except Exception:
        pass
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    cfg.freeze()
    cfg.defrost()  # keep mutable for tools, but dump the frozen snapshot
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    return cfg


def register_datasets(args):
    from mgnet_tpu.data import (
        register_all_cityscapes_scene_seg,
        register_all_kitti_eigen_scene_seg,
    )

    root = args.data_root or os.environ.get("MGNET_DATASETS", "./datasets")
    try:
        register_all_cityscapes_scene_seg(root)
    except KeyError:
        pass
    try:
        register_all_kitti_eigen_scene_seg(root)
    except KeyError:
        pass


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--data-root", default="")
    parser.add_argument("--num-devices", type=int, default=-1,
                        help="data-parallel mesh size (-1 = all)")
    # multi-process launch (reference launch(num_machines, machine_rank,
    # dist_url), tools/train_net.py:241-248): run one process per host
    # with the same coordinator address and distinct --process-id.
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--coordinator", default="127.0.0.1:12355",
                        help="coordinator address for multi-process runs")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.num_processes > 1:
        from mgnet_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    cfg = setup(args)
    if args.num_devices != -1:
        cfg.MESH.DATA = args.num_devices
    register_datasets(args)

    from mgnet_tpu.train.trainer import Trainer, evaluate_dataset

    if args.eval_only:
        import jax

        from mgnet_tpu.models.mgnet import build_model
        from mgnet_tpu.utils.checkpoint import load_params

        from mgnet_tpu.utils.events import MetricLogger

        model = build_model(cfg)
        params, batch_stats = load_params(cfg.MODEL.WEIGHTS)
        logger = MetricLogger(cfg.OUTPUT_DIR)
        results = evaluate_dataset(
            cfg, model, params, batch_stats,
            image_logger=logger,
            visualize_dir=(os.path.join(cfg.OUTPUT_DIR, "eval_vis")
                           if cfg.VISUALIZE_EVALUATION else None),
        )
        print(json.dumps(results, indent=2, default=float))
        with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"), "a") as f:
            f.write(json.dumps(results, default=float) + "\n")
        return

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    trainer.train()


if __name__ == "__main__":
    main()
