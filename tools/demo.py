#!/usr/bin/env python
"""Image / video demo CLI.

Parity with reference: tools/demo.py — run the predictor on images or a
video, visualize panoptic + instance-heatmap + depth (+ optional point
cloud export), save outputs. Windowed display and open3d viewing are
replaced by saved artifacts (headless TPU hosts).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", nargs="+", default=[],
                   help="image files")
    p.add_argument("--video-input", default="",
                   help="video file (frame-by-frame inference, parity: "
                        "reference demo.py video path)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--weights", default="")
    p.add_argument("--calib", default="",
                   help="camera calibration json (cityscapes format)")
    p.add_argument("--save-pcl", action="store_true",
                   help="save xyz point cloud as .npy")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    from mgnet_tpu.config import load_config
    from mgnet_tpu.data import (
        read_image,
        register_all_cityscapes_scene_seg,
    )
    from mgnet_tpu.inference import Predictor
    from mgnet_tpu.inference.visualizer import Visualizer
    from mgnet_tpu.data.catalog import MetadataCatalog
    from mgnet_tpu.data.categories import (
        CITYSCAPES_SCENE_SEG_CATEGORIES,
        build_meta,
    )

    cfg = load_config(args.config_file, args.opts)
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights

    calib = None
    if args.calib:
        with open(args.calib) as f:
            calib = json.load(f)

    # metadata for postproc statics + colors (registry-independent demo)
    meta = MetadataCatalog.get("demo").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )
    predictor = Predictor(cfg, calibration_info=calib, dataset_name="demo")
    vis = Visualizer(meta)

    os.makedirs(args.output, exist_ok=True)
    for path in args.input:
        img = read_image(path)
        out = predictor(img)
        stem = os.path.splitext(os.path.basename(path))[0]
        vis.save_panoptic(
            os.path.join(args.output, f"{stem}_panoptic.png"),
            img, out["panoptic"],
        )
        if "center" in out and "offset" in out:
            vis.save_instance_heatmaps(
                os.path.join(args.output, f"{stem}_instances.png"),
                out["center"], out["offset"],
            )
        if "depth" in out:
            vis.save_depth(
                os.path.join(args.output, f"{stem}_depth.png"),
                out["depth"],
            )
        if args.save_pcl and "points" in out:
            np.save(os.path.join(args.output, f"{stem}_points.npy"),
                    out["points"])
        print(f"{path} -> {args.output}/{stem}_*.png")

    if args.video_input:
        import cv2

        cap = cv2.VideoCapture(args.video_input)
        fps = cap.get(cv2.CAP_PROP_FPS) or 17.0
        writer = None
        idx = 0
        while True:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
            out = predictor(frame)
            pan_rgb = vis.panoptic_rgb(out["panoptic"], frame)
            depth_rgb = vis.depth_rgb(out["depth"]) if "depth" in out \
                else np.zeros_like(pan_rgb)
            combined = np.concatenate([pan_rgb, depth_rgb], axis=0)
            if writer is None:
                writer = cv2.VideoWriter(
                    os.path.join(args.output, "demo_output.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), fps,
                    (combined.shape[1], combined.shape[0]),
                )
            writer.write(cv2.cvtColor(combined, cv2.COLOR_RGB2BGR))
            idx += 1
        cap.release()
        if writer is not None:
            writer.release()
        print(f"{args.video_input}: {idx} frames -> "
              f"{args.output}/demo_output.mp4")


if __name__ == "__main__":
    main()
