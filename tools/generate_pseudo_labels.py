#!/usr/bin/env python
"""Panoptic pseudo-label generation over unlabeled video-sequence frames.

Parity with reference: tools/generate_pseudo_labels.py — register the
dataset in pseudo-label-generation mode (image-only loading), run panoptic
inference (optionally MSC+flip TTA) on every frame, remap trainIds back to
dataset ids, save uint16 instance-id PNGs, copy curated gt labels over the
generated ones, and convert to a COCO-panoptic json. The reference's
multi-GPU DDP launch becomes batched inference on the mesh.
"""

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def trainid_to_dataset_id_map(categories):
    return {c["trainId"]: c["id"] for c in categories}


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--dataset", default="cityscapes_scene_seg_train_video_sequence")
    p.add_argument("--data-root", default="./datasets")
    p.add_argument("--weights", default="")
    p.add_argument("--output", required=True)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--batch", type=int, default=4,
                   help="device batch for same-shape frames (TTA: the "
                        "flip pair already doubles it on device)")
    p.add_argument("--gt-instance-dir", default="",
                   help="curated gtFine instanceIds dir; copied over the "
                        "generated labels so human annotations win "
                        "(reference generate_pseudo_labels.py:146-175)")
    p.add_argument("--convert-json", default="",
                   help="when set, convert the final label dir to "
                        "COCO-panoptic (PNG dir = <output>_panoptic, "
                        "json = this path)")
    # multi-process inference sharding (reference: distributed
    # generate_pseudo_labels via launch + DDP, :198-214)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--coordinator", default="127.0.0.1:12355")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    if args.num_processes > 1:
        from mgnet_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from mgnet_tpu.config import load_config
    from mgnet_tpu.data import (
        DatasetCatalog,
        MetadataCatalog,
        TestDatasetMapper,
        read_image,
        register_all_cityscapes_scene_seg,
        register_all_kitti_eigen_scene_seg,
    )
    from mgnet_tpu.inference import Predictor

    cfg = load_config(args.config_file, args.opts)
    cfg.WITH_DEPTH = False
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights

    if "kitti" in args.dataset:
        register_all_kitti_eigen_scene_seg(
            args.data_root, pseudo_label_generation=True
        )
    else:
        register_all_cityscapes_scene_seg(
            args.data_root, pseudo_label_generation=True
        )
    dataset = DatasetCatalog.get(args.dataset)
    if args.max_images:
        dataset = dataset[: args.max_images]
    if args.num_processes > 1:
        import jax

        dataset = dataset[jax.process_index()::jax.process_count()]
    meta = MetadataCatalog.get(args.dataset)
    id_map = trainid_to_dataset_id_map(meta.categories)
    label_divisor = meta.label_divisor

    predictor = Predictor(cfg, dataset_name=args.dataset)
    os.makedirs(args.output, exist_ok=True)

    import time
    from collections import defaultdict
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    # vectorized trainId -> dataset-id remap tables (cityscapes
    # instanceIds convention: stuff -> id, things -> id*1000 + instance)
    max_tid = max(id_map)
    did_table = np.zeros(max_tid + 2, np.int64)
    isthing_table = np.zeros(max_tid + 2, bool)
    for c in meta.categories:
        if c["trainId"] in id_map:
            did_table[c["trainId"]] = id_map[c["trainId"]]
            isthing_table[c["trainId"]] = bool(c.get("isthing"))

    def remap_and_save(pan: np.ndarray, file_name: str) -> None:
        pan = pan.astype(np.int64)
        valid = pan >= 0
        cls = np.clip(pan // label_divisor, 0, max_tid + 1)
        inst = pan % label_divisor
        did = did_table[cls]
        remapped = np.where(
            valid,
            np.where(isthing_table[cls], did * 1000 + inst, did),
            0,
        ).astype(np.uint16)
        if "kitti" in args.dataset:
            # Preserve the drive structure under the output root
            # (image_02 -> label_02, reference generate_pseudo_labels.py
            # :139): flat frame numbers collide across drives, and the
            # registry maps annotations back via label_ -> image_.
            rel = file_name.split("kitti_eigen/")[-1]
            rel = rel.replace("image_", "label_")
            out = os.path.join(
                args.output, os.path.splitext(rel)[0] + "_instanceIds.png")
            os.makedirs(os.path.dirname(out), exist_ok=True)
        else:
            stem = os.path.splitext(os.path.basename(file_name))[0]
            stem = stem.replace("_leftImg8bit", "")
            out = os.path.join(args.output, f"{stem}_instanceIds.png")
        Image.fromarray(remapped).save(out)

    def load(d):
        img = read_image(d["file_name"])
        h, w = img.shape[:2]
        t = predictor.mapper._resize(h, w)
        return d, t.apply_image(img).astype(np.float32)

    # batched inference (reference runs a DDP-batched test loader,
    # generate_pseudo_labels.py:40-64): frames sharing a resized shape
    # run as one device batch; PNG decode and encode ride a thread pool.
    # Software pipeline depth 1: dispatch batch N+1 (async jax dispatch)
    # BEFORE materializing batch N, so the D2H of N's panoptic maps
    # overlaps N+1's device compute (VERDICT r3 #6).
    batch_size = max(1, int(args.batch))
    n_done, t_first, t0 = 0, None, time.time()
    with ThreadPoolExecutor(max(2, batch_size)) as pool:
        buckets = defaultdict(list)
        pending = None  # (device output dict, items)

        def materialize(batch):
            nonlocal n_done, t_first
            out, items = batch
            pan = np.asarray(out["panoptic"])  # blocks: D2H
            for i, (d, _) in enumerate(items):
                pool.submit(remap_and_save, pan[i], d["file_name"])
            n_done += len(items)
            if t_first is None:
                t_first = time.time()  # first batch includes compile

        def drain():
            nonlocal pending
            if pending is not None:
                materialize(pending)
                pending = None

        def flush(items):
            nonlocal pending
            imgs = np.stack([r for _, r in items])
            out = predictor.predict_batch(
                imgs, outputs=("panoptic",), materialize=False)
            prev, pending = pending, (out, items)
            if prev is not None:
                materialize(prev)

        for d, resized in pool.map(load, dataset):
            key = resized.shape
            buckets[key].append((d, resized))
            if len(buckets[key]) == batch_size:
                flush(buckets.pop(key))
        for key in list(buckets):
            flush(buckets.pop(key))
        drain()
    wall = time.time() - t0
    steady = (
        (n_done - batch_size) / (time.time() - t_first)
        if t_first and n_done > batch_size else n_done / max(wall, 1e-9)
    )
    print(f"Wrote pseudo labels for {len(dataset)} images to "
          f"{args.output} ({wall:.1f} s wall, steady-state "
          f"{steady:.2f} img/s -> projected "
          f"{89250 / max(steady, 1e-9) / 3600:.1f} h for the 89,250-frame "
          f"video-sequence split)")

    if args.num_processes > 1:
        # barrier, then rank 0 alone performs the gt copy-over + COCO
        # conversion (reference generate_pseudo_labels.py:144-195)
        from mgnet_tpu.parallel.multihost import (
            is_main_process,
            synchronize,
        )

        synchronize()
        if not is_main_process():
            return

    if args.gt_instance_dir:
        # Human-curated labels override pseudo labels where they exist
        # (one retry for transient FS errors, matching the reference's only
        # fault-handling code path).
        import glob

        files = glob.glob(os.path.join(
            args.gt_instance_dir, "**", "*_instanceIds.png"), recursive=True)
        for attempt in range(2):
            try:
                for f in files:
                    shutil.copy(f, os.path.join(
                        args.output, os.path.basename(f)))
                break
            except OSError:
                if attempt == 1:
                    raise
        print(f"Copied {len(files)} curated gt label files over "
              f"{args.output}")

    if args.convert_json:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "datasets"))
        if "kitti" in args.dataset:
            from prepare_kitti_eigen import convert2panoptic
        else:
            from prepare_cityscapes import convert2panoptic

        out_png_dir = args.output.rstrip("/") + "_panoptic"
        convert2panoptic(args.output, out_png_dir, args.convert_json)
    else:
        print("Next: run datasets/prepare_cityscapes.py (or "
              "prepare_kitti_eigen.py) on the output to produce "
              "COCO-panoptic json + RGB PNGs.")


if __name__ == "__main__":
    main()
