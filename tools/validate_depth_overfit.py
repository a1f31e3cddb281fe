#!/usr/bin/env python
"""Self-supervised depth overfit validation.

Constructs a synthetic 3-frame sequence with pure horizontal parallax and
two depth layers: the top half of a textured image shifts by 2 px between
frames, the bottom half by 6 px. A translating camera observing two
fronto-parallel planes produces exactly this, with the planes' depths in
ratio 3:1. The photometric loss + pose net must recover that relative
structure (absolute scale is unobservable — the evaluator's GT-median
scaling handles it, as for any monocular self-supervised method).

Passes when Abs Rel < 0.15 against the analytic two-plane ground truth.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 128, 256
FX = 226.0
BASELINE = 0.22
DEPTH_TOP, DEPTH_BOTTOM = 30.0, 10.0  # ratio 3:1 == shift ratio 3:9


def make_dataset(root: str):
    from PIL import Image

    from mgnet_tpu.data.mapper import id2rgb

    city = "depthfit"
    rng = np.random.RandomState(7)
    dirs = {
        "img": f"{root}/cityscapes/leftImg8bit/train/{city}",
        "seq": f"{root}/cityscapes/leftImg8bit_sequence/train/{city}",
        "cam": f"{root}/cityscapes/camera/train/{city}",
        "disp": f"{root}/cityscapes/disparity/train/{city}",
        "gt": f"{root}/cityscapes/gtFine/cityscapes_panoptic_train",
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    # smooth random texture (blur white noise so warping has gradients)
    import cv2

    tex = rng.rand(H, W + 32, 3).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.2)
    tex = ((tex - tex.min()) / (np.ptp(tex) + 1e-6) * 255).astype(np.uint8)

    def frame(shift_sign):
        """shift_sign -1/0/+1: parallax of 2px (top) and 6px (bottom)."""
        img = np.empty((H, W, 3), np.uint8)
        s_top = 3 * shift_sign
        s_bot = 9 * shift_sign
        img[: H // 2] = np.roll(tex[: H // 2], s_top, axis=1)[:, :W]
        img[H // 2:] = np.roll(tex[H // 2:], s_bot, axis=1)[:, :W]
        return img

    stem = f"{city}_000000_000010"
    from PIL import Image

    Image.fromarray(frame(0)).save(f"{dirs['img']}/{stem}_leftImg8bit.png")
    for i, sign in ((9, 1), (10, 0), (11, -1)):
        Image.fromarray(frame(sign)).save(
            f"{dirs['seq']}/{city}_000000_{i:06d}_leftImg8bit.png")

    # panoptic gt (unused for depth; keeps the mapper uniform)
    pan = np.full((H, W), 1 * 1000, np.int32)
    Image.fromarray(id2rgb(pan)).save(
        f"{dirs['gt']}/{stem}_gtFine_panoptic.png")
    ann = {"annotations": [{
        "image_id": stem, "file_name": f"{stem}_gtFine_panoptic.png",
        "segments_info": [{"id": 1000, "category_id": 7, "iscrowd": 0}],
    }], "categories": []}
    with open(f"{root}/cityscapes/gtFine/cityscapes_panoptic_train.json",
              "w") as f:
        json.dump(ann, f)
    with open(f"{dirs['cam']}/{stem}_camera.json", "w") as f:
        json.dump({"intrinsic": {"fx": FX, "fy": FX,
                                 "u0": (W - 1) / 2, "v0": (H - 1) / 2},
                   "extrinsic": {"baseline": BASELINE, "z": 1.2}}, f)

    # disparity GT encoding the two analytic plane depths
    depth_gt = np.full((H, W), DEPTH_TOP, np.float32)
    depth_gt[H // 2:] = DEPTH_BOTTOM
    disp = BASELINE * FX / depth_gt
    stored = (disp * 256.0 + 1.0).astype(np.uint16)
    Image.fromarray(stored).save(f"{dirs['disp']}/{stem}_disparity.png")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--lr", type=float, default=2e-4)
    args = p.parse_args()

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.cityscapes import register_all_cityscapes_scene_seg
    from mgnet_tpu.train.trainer import Trainer, evaluate_dataset

    tmp = tempfile.mkdtemp(prefix="mgnet_depthfit_")
    make_dataset(tmp)
    register_all_cityscapes_scene_seg(tmp)

    cfg = get_default_config()
    cfg.WITH_PANOPTIC = False
    cfg.WITH_UNCERTAINTY = False
    cfg.SOLVER.MAX_ITER = args.steps
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.TEST.EVAL_PERIOD = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 256
    cfg.INPUT.CROP.ENABLED = False
    cfg.INPUT.COLOR_JITTER.ENABLED = False
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = []
    # exact synthetic correspondences: the static-scene automask shortcut
    # would otherwise dominate the loss and starve depth of gradient
    cfg.MODEL.DEPTH_HEAD.AUTOMASK_LOSS = False
    cfg.MODEL.POST_PROCESSING.USE_DGC_SCALING = False  # GT-median scaling
    cfg.DATASETS.TRAIN = ("cityscapes_fine_scene_seg_train",)
    cfg.DATASETS.TEST = ("cityscapes_fine_scene_seg_train",)
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = os.path.join(tmp, "out")
    cfg.MESH.DATA = 1

    trainer = Trainer(cfg)
    trainer.train()

    mpath = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    if os.path.exists(mpath):
        lines = [json.loads(l) for l in open(mpath)]
        for rec in lines[:: max(1, len(lines) // 8)]:
            print({k: round(v, 4) for k, v in rec.items()
                   if k in ("iteration", "loss_photometric",
                            "loss_smoothness", "loss_total")})

    results = evaluate_dataset(
        cfg, trainer.model,
        trainer.state.params, trainer.state.batch_stats,
    )
    d = results["depth"]
    print(json.dumps({k: round(float(v), 4) for k, v in d.items()},
                     indent=2))
    ok = d["Abs Rel"] < 0.15
    print("DEPTH OVERFIT VALIDATION:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
