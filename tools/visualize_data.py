#!/usr/bin/env python
"""Inspect augmented training batches (parity: reference
tools/visualize_data.py) — saves semantic/center/offset visualizations of
mapper outputs to a directory instead of opening windows."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--data-root", default="./datasets")
    p.add_argument("--output", required=True)
    p.add_argument("--num-samples", type=int, default=8)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    from PIL import Image

    from mgnet_tpu.config import load_config
    from mgnet_tpu.data import (
        DatasetCatalog,
        MetadataCatalog,
        TrainDatasetMapper,
        register_all_cityscapes_scene_seg,
        register_all_kitti_eigen_scene_seg,
    )
    from mgnet_tpu.inference.visualizer import Visualizer

    cfg = load_config(args.config_file, args.opts)
    try:
        register_all_cityscapes_scene_seg(args.data_root)
    except KeyError:
        pass
    try:
        register_all_kitti_eigen_scene_seg(args.data_root)
    except KeyError:
        pass

    name = cfg.DATASETS.TRAIN[0]
    dataset = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    mapper = TrainDatasetMapper(cfg, dataset_name=name)
    vis = Visualizer(meta)
    os.makedirs(args.output, exist_ok=True)

    rng = np.random.default_rng(0)
    for i, d in enumerate(dataset[: args.num_samples]):
        s = mapper(d, rng=rng)
        stem = f"sample{i:03d}"
        Image.fromarray(s["image"].astype(np.uint8)).save(
            f"{args.output}/{stem}_image.png")
        # color semantic map
        sem = s["sem_seg"]
        rgb = np.zeros(sem.shape + (3,), np.uint8)
        for c in meta.categories:
            rgb[sem == c["trainId"]] = c["color"]
        Image.fromarray(rgb).save(f"{args.output}/{stem}_sem.png")
        Image.fromarray(
            vis.instance_heatmap_rgb(s["center"][..., 0], s["offset"])
        ).save(f"{args.output}/{stem}_instances.png")
        print(stem, "written")


if __name__ == "__main__":
    main()
