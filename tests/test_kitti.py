"""KITTI-Eigen registry + depth evaluation end-to-end on a mini tree."""

import json
import os

import numpy as np
import pytest

from mgnet_tpu.config import load_config
from mgnet_tpu.data.catalog import DatasetCatalog, MetadataCatalog

DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"


def _make_mini_kitti(root: str):
    from PIL import Image

    h, w = 96, 320
    rng = np.random.RandomState(3)
    img_dir = f"{root}/kitti_eigen/{DRIVE}/image_02/data"
    depth_dir = f"{root}/kitti_eigen/{DRIVE}/proj_depth/groundtruth/image_02"
    splits = f"{root}/kitti_eigen/data_splits"
    for d in (img_dir, depth_dir, splits):
        os.makedirs(d, exist_ok=True)

    for i in (4, 5, 6):
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)
        ).save(f"{img_dir}/{i:010d}.png")
    depth = (rng.uniform(2, 60, (h, w)) * 256).astype(np.uint16)
    Image.fromarray(depth).save(f"{depth_dir}/{5:010d}.png")

    with open(f"{root}/kitti_eigen/2011_09_26/calib_cam_to_cam.txt",
              "w") as f:
        f.write("calib_time: 2011\n")
        f.write("P_rect_02: 250.0 0.0 160.0 0.0 "
                "0.0 250.0 48.0 0.0 0.0 0.0 1.0 0.0\n")

    rel = f"{DRIVE}/image_02/data/{5:010d}.png"
    with open(f"{splits}/eigen_test_files.txt", "w") as f:
        f.write(f"{rel} l\n")
    with open(f"{splits}/eigen_zhou_files.txt", "w") as f:
        f.write(f"{rel} l\n")
    return rel


@pytest.fixture
def mini_kitti(tmp_path):
    for k in list(DatasetCatalog.list()):
        DatasetCatalog.remove(k)
    MetadataCatalog.clear()
    rel = _make_mini_kitti(str(tmp_path))
    from mgnet_tpu.data.kitti import register_all_kitti_eigen_scene_seg

    register_all_kitti_eigen_scene_seg(str(tmp_path))
    return tmp_path, rel


def test_kitti_registry(mini_kitti):
    root, rel = mini_kitti
    dicts = DatasetCatalog.get("kitti_eigen_scene_seg_test")
    assert len(dicts) == 1
    d = dicts[0]
    assert os.path.exists(d["file_name"])
    assert os.path.exists(d["depth_file_name"])
    intr = d["calibration_info"]["intrinsic"]
    assert np.isclose(intr["fx"], 250.0)
    assert np.isclose(intr["u0"], 160.0)
    assert d["calibration_info"]["extrinsic"]["z"] == 1.65
    meta = MetadataCatalog.get("kitti_eigen_scene_seg_test")
    # 19-class set (no ego vehicle) for KITTI training
    assert len(meta.categories) == 19


def test_kitti_depth_eval_end_to_end(mini_kitti):
    root, rel = mini_kitti
    import jax

    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.train.trainer import evaluate_dataset

    cfg = load_config("configs/MGNet-KITTI-Eigen-Zhou.yaml")
    cfg.MODEL.COMPUTE_DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 320
    cfg.MODEL.POST_PROCESSING.MAX_INSTANCES = 16

    model = build_model(cfg)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params = {"model": variables["params"]}
    stats = variables.get("batch_stats", {})

    results = evaluate_dataset(cfg, model, params, stats)
    assert "depth" in results
    d = results["depth"]
    for key in ("Abs Rel", "RMSE", "δ < 1.25"):
        assert key in d and np.isfinite(d[key])
