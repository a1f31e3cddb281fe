"""Synthetic batches for smoke tests and benchmarks (SURVEY.md §4:
end-to-end smoke test = tiny synthetic dataset, few steps, loss decreases).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from mgnet_tpu.data.target_generator import PanopticTargetGenerator

__all__ = ["synthetic_train_batch", "make_synthetic_cityscapes_raw",
           "make_synthetic_kitti_raw"]


def synthetic_train_batch(
    batch: int = 2,
    height: int = 64,
    width: int = 64,
    num_classes: int = 20,
    last_stuff_id: int = 10,
    seed: int = 0,
    with_panoptic: bool = True,
    with_depth: bool = True,
) -> Dict[str, np.ndarray]:
    """Random scene with two instances per image + plausible camera."""
    rng = np.random.RandomState(seed)
    out: Dict[str, np.ndarray] = {}

    def rand_img():
        return rng.randint(0, 255, (batch, height, width, 3)).astype(np.float32)

    out["image"] = rand_img()
    if with_depth:
        # context frames correlate with current (shifted) for a meaningful
        # photometric signal
        out["image_prev"] = np.roll(out["image"], 2, axis=2)
        out["image_next"] = np.roll(out["image"], -2, axis=2)
        out["image_orig"] = out["image"] / 255.0
        out["image_prev_orig"] = out["image_prev"] / 255.0
        out["image_next_orig"] = out["image_next"] / 255.0
        K = np.array(
            [[0.8 * width, 0, (width - 1) / 2],
             [0, 0.8 * width, (height - 1) / 2],
             [0, 0, 1]], np.float32,
        )
        out["camera_matrix"] = np.broadcast_to(K, (batch, 3, 3)).copy()
        out["reprojection_mask"] = np.ones((batch, height, width, 1), np.float32)
        out["camera_height"] = np.full((batch,), 1.65, np.float32)

    if with_panoptic:
        thing_ids = list(range(last_stuff_id + 1, num_classes))
        gen = PanopticTargetGenerator(
            ignore_label=255, thing_ids=thing_ids, sigma=8,
            small_instance_area=64, small_instance_weight=3,
        )
        sems, centers, offsets, sw, cw, ow = [], [], [], [], [], []
        for b in range(batch):
            pan = np.full((height, width), 1 * 1000, np.int32)
            segs = [dict(id=1000, category_id=1, iscrowd=0)]
            for i, cid in enumerate(rng.choice(thing_ids, 2)):
                y0 = rng.randint(0, height // 2)
                x0 = rng.randint(0, width // 2)
                pid = cid * 1000 + i + 1
                pan[y0:y0 + height // 3, x0:x0 + width // 3] = pid
                segs.append(dict(id=pid, category_id=int(cid), iscrowd=0))
            t = gen(pan, segs)
            sems.append(t["sem_seg"])
            centers.append(t["center"][..., None])
            offsets.append(t["offset"])
            sw.append(t["sem_seg_weights"])
            cw.append(t["center_weights"])
            ow.append(t["offset_weights"])
        out["sem_seg"] = np.stack(sems)
        out["center"] = np.stack(centers)
        out["offset"] = np.stack(offsets)
        out["sem_seg_weights"] = np.stack(sw)
        out["center_weights"] = np.stack(cw)
        out["offset_weights"] = np.stack(ow)

    return out


def make_synthetic_cityscapes_raw(root: str, split: str = "train",
                                  n_images: int = 2,
                                  height: int = 128, width: int = 256,
                                  seed: int = 7) -> None:
    """Write a RAW synthetic Cityscapes tree (instanceIds, not yet
    COCO-panoptic) so the full pipeline — datasets/prepare_cityscapes.py
    conversion included — can run end-to-end without real data
    (tools/run_pipeline.py --smoke)."""
    import json
    import os

    from PIL import Image

    rng = np.random.RandomState(seed)
    city = "smokecity"
    dirs = {
        "img": f"{root}/cityscapes/leftImg8bit/{split}/{city}",
        "seq": f"{root}/cityscapes/leftImg8bit_sequence/{split}/{city}",
        "cam": f"{root}/cityscapes/camera/{split}/{city}",
        "disp": f"{root}/cityscapes/disparity/{split}/{city}",
        "raw_gt": f"{root}/cityscapes/gtFine/{split}/{city}",
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    for n in range(n_images):
        stem = f"{city}_{n:06d}_000010"
        img = rng.randint(0, 255, (height, width, 3), np.uint8)
        Image.fromarray(img).save(f"{dirs['img']}/{stem}_leftImg8bit.png")
        for i in (9, 10, 11):
            frame = f"{city}_{n:06d}_{i:06d}"
            Image.fromarray(
                rng.randint(0, 255, (height, width, 3), np.uint8)
            ).save(f"{dirs['seq']}/{frame}_leftImg8bit.png")

        # raw instanceIds: road stuff (id 7) + one car instance (26xxx)
        inst = np.full((height, width), 7, np.int32)
        y0 = 30 + 10 * n
        inst[y0:y0 + 40, 100:160] = 26000 + n
        Image.fromarray(inst.astype(np.uint16)).save(
            f"{dirs['raw_gt']}/{stem}_gtFine_instanceIds.png")

        with open(f"{dirs['cam']}/{stem}_camera.json", "w") as f:
            json.dump({
                "intrinsic": {"fx": 226.0, "fy": 226.0,
                              "u0": (width - 1) / 2,
                              "v0": (height - 1) / 2},
                "extrinsic": {"baseline": 0.222, "z": 1.22},
            }, f)
        disp = rng.randint(500, 20000, (height, width)).astype(np.uint16)
        Image.fromarray(disp).save(f"{dirs['disp']}/{stem}_disparity.png")


def make_synthetic_kitti_raw(root: str, n_frames: int = 7,
                             height: int = 96, width: int = 320,
                             seed: int = 11) -> None:
    """Write a RAW synthetic KITTI-Eigen tree (one drive, eigen_zhou +
    eigen_test split lists, per-date calib, sparse depth gt for the test
    frame) so the KITTI leg of tools/run_pipeline.py — pseudo-label
    generation, prepare_kitti_eigen conversion, Eigen-Zhou training and
    depth eval — runs end-to-end without real data. Directory layout per
    reference datasets/README (kitti_eigen/<date>/<drive>/image_02/data)."""
    import os

    from PIL import Image

    rng = np.random.RandomState(seed)
    date = "2011_09_26"
    drive = f"{date}/{date}_drive_0001_sync"
    img_dir = f"{root}/kitti_eigen/{drive}/image_02/data"
    depth_dir = f"{root}/kitti_eigen/{drive}/proj_depth/groundtruth/image_02"
    splits = f"{root}/kitti_eigen/data_splits"
    for d in (img_dir, depth_dir, splits):
        os.makedirs(d, exist_ok=True)

    for i in range(n_frames):
        Image.fromarray(
            rng.randint(0, 255, (height, width, 3), np.uint8)
        ).save(f"{img_dir}/{i:010d}.png")

    test_frame = n_frames // 2
    depth = (rng.uniform(2.0, 60.0, (height, width)) * 256).astype(np.uint16)
    depth[rng.rand(height, width) < 0.7] = 0  # sparse, like projected lidar
    Image.fromarray(depth).save(f"{depth_dir}/{test_frame:010d}.png")

    with open(f"{root}/kitti_eigen/{date}/calib_cam_to_cam.txt", "w") as f:
        f.write("calib_time: 2011\n")
        f.write(f"P_rect_02: {0.8 * width} 0.0 {(width - 1) / 2} 0.0 "
                f"0.0 {0.8 * width} {(height - 1) / 2} 0.0 "
                "0.0 0.0 1.0 0.0\n")

    # interior frames have both neighbors -> usable for training
    with open(f"{splits}/eigen_zhou_files.txt", "w") as f:
        for i in range(1, n_frames - 1):
            f.write(f"{drive}/image_02/data/{i:010d}.png l\n")
    with open(f"{splits}/eigen_test_files.txt", "w") as f:
        f.write(f"{drive}/image_02/data/{test_frame:010d}.png l\n")
