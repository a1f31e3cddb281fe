#!/usr/bin/env python
"""One-command runbook driver: prepare -> initialize -> train -> eval
(optionally -> pseudo-labels -> video-sequence -> KITTI).

Reference analog: GETTING_STARTED.md "Reproduce Results" (reference
GETTING_STARTED.md:32-56) as ONE script, so a machine with the datasets
mounted can chase PQ 55.6 / AbsRel 0.095 with zero code changes:

  python tools/run_pipeline.py --data-root /datasets \
      --backbone-pth swsl_resnet18.pth --pose-pth resnet18.pth

Every stage is smoke-testable without real data or downloads:

  python tools/run_pipeline.py --smoke

which synthesizes a raw mini Cityscapes tree (instanceIds PNGs), runs
the REAL prepare/convert step, fabricates torchvision-shaped weights,
runs the real converter, trains a few iterations through the flagship
config (overridden to tiny sizes), and evaluates — exercising exactly
the code paths of a full run.

Stages (select with --stages, comma-separated): prepare, init, train,
eval. Default: all of them.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def sh(cmd, **kw):
    print(f"+ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def stage_prepare(args):
    """instanceIds PNGs -> COCO-panoptic PNGs + json (both splits)."""
    for split in ("train", "val"):
        in_dir = os.path.join(args.data_root, "cityscapes", "gtFine", split)
        out_dir = os.path.join(
            args.data_root, "cityscapes", "gtFine",
            f"cityscapes_panoptic_{split}")
        json_path = out_dir + ".json"
        if not glob.glob(os.path.join(in_dir, "*", "*_instanceIds.png")):
            print(f"prepare: no instanceIds under {in_dir}, skipping")
            continue
        if os.path.exists(json_path) and not args.force:
            print(f"prepare: {json_path} exists, skipping")
            continue
        sh([sys.executable, "datasets/prepare_cityscapes.py",
            "--input-dir", in_dir, "--output-dir", out_dir,
            "--json", json_path, "--workers", str(args.workers)])


def stage_init(args):
    """torchvision ResNet-18 .pth -> weights/imagenet_weights.npz."""
    out = os.path.join(args.weights_dir, "imagenet_weights.npz")
    if os.path.exists(out) and not args.force:
        print(f"init: {out} exists, skipping")
        return out
    backbone = args.backbone_pth
    pose = args.pose_pth or backbone
    if args.smoke:
        backbone = pose = _fabricate_torchvision_pth(args.weights_dir)
    if not backbone:
        raise SystemExit(
            "init: pass --backbone-pth (torchvision/SWSL ResNet-18 .pth; "
            "reference initialize.sh downloads "
            "semi_weakly_supervised_resnet18 + resnet18)")
    cmd = [sys.executable, "tools/convert_torchvision_weights.py",
           "--backbone", backbone, "--output", out]
    if pose:
        cmd += ["--pose", pose]
    sh(cmd)
    return out


def _fabricate_torchvision_pth(weights_dir: str) -> str:
    """Random torchvision-R18-shaped state dict for smoke runs."""
    import numpy as np
    import torch

    rng = np.random.RandomState(0)

    def conv(o, i, k):
        return torch.from_numpy(
            rng.randn(o, i, k, k).astype("float32") * 0.05)

    sd = {"conv1.weight": conv(64, 3, 7)}
    for s in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{s}"] = torch.from_numpy(rng.rand(64).astype("float32"))
    chans = [64, 64, 128, 256, 512]
    for st in range(4):
        for b in range(2):
            cin = chans[st] if b == 0 else chans[st + 1]
            cout = chans[st + 1]
            p = f"layer{st + 1}.{b}"
            sd[f"{p}.conv1.weight"] = conv(cout, cin, 3)
            sd[f"{p}.conv2.weight"] = conv(cout, cout, 3)
            for bn in ("bn1", "bn2"):
                for s in ("weight", "bias", "running_mean",
                          "running_var"):
                    sd[f"{p}.{bn}.{s}"] = torch.from_numpy(
                        rng.rand(cout).astype("float32"))
            if cin != cout:
                sd[f"{p}.downsample.0.weight"] = conv(cout, cin, 1)
                for s in ("weight", "bias", "running_mean",
                          "running_var"):
                    sd[f"{p}.downsample.1.{s}"] = torch.from_numpy(
                        rng.rand(cout).astype("float32"))
    os.makedirs(weights_dir, exist_ok=True)
    path = os.path.join(weights_dir, "smoke_resnet18.pth")
    torch.save(sd, path)
    return path


SMOKE_TRAIN_OPTS = [
    "MODEL.COMPUTE_DTYPE", "float32",
    "MODEL.SEM_SEG_HEAD.OHEM_N_MIN", "256",
    "INPUT.MIN_SIZE_TRAIN", "(128,)",
    "INPUT.MAX_SIZE_TRAIN", "256",
    "INPUT.CROP.SIZE", "(64, 64)",
    "INPUT.MIN_SIZE_TEST", "128",
    "INPUT.MAX_SIZE_TEST", "256",
]

# KITTI smoke tree is 96x320 (mgnet_tpu/data/synthetic.py)
SMOKE_KITTI_OPTS = [
    "MODEL.COMPUTE_DTYPE", "float32",
    "MODEL.SEM_SEG_HEAD.OHEM_N_MIN", "256",
    "INPUT.MIN_SIZE_TRAIN", "(96,)",
    "INPUT.MAX_SIZE_TRAIN", "320",
    "INPUT.CROP.ENABLED", "False",
    "INPUT.MIN_SIZE_TEST", "96",
    "INPUT.MAX_SIZE_TEST", "320",
]

TINY_RUN_OPTS = [
    "SOLVER.MAX_ITER", "3",
    "SOLVER.IMS_PER_BATCH", "2",
    "SOLVER.CHECKPOINT_PERIOD", "3",
    "SOLVER.WARMUP_ITERS", "2",
    "TEST.EVAL_PERIOD", "0",
    "DATALOADER.NUM_WORKERS", "2",
    "MESH.DATA", "1",
    "WRITE_OUTPUT_TO_SUBDIR", "False",
]


def _train_opts(args, kitti=False):
    """Config overrides for synthetic runs. --smoke shrinks input sizes
    AND the schedule; --drill keeps the configs' REAL full-resolution
    input pipeline (1024x2048 crops on Cityscapes) and shrinks only the
    schedule — the point is that every jitted shape, mapper path, and
    eval bucket matches a real-data run (VERDICT r3 #2)."""
    if args.drill:
        return list(TINY_RUN_OPTS)
    if args.smoke:
        return (SMOKE_KITTI_OPTS if kitti else SMOKE_TRAIN_OPTS) + \
            TINY_RUN_OPTS
    return []


def stage_train(args, weights_npz):
    cmd = [sys.executable, "tools/train_net.py",
           "--config-file", args.config,
           "--data-root", args.data_root,
           "MODEL.WEIGHTS", weights_npz or "",
           "OUTPUT_DIR", args.output_dir]
    cmd += _train_opts(args)
    if args.resume:
        cmd.insert(2, "--resume")
    sh(cmd)
    final = os.path.join(args.output_dir, "model_final")
    assert os.path.exists(final), f"training left no {final}"
    return final


def stage_eval(args, model_final):
    cmd = [sys.executable, "tools/train_net.py", "--eval-only",
           "--config-file", args.config,
           "--data-root", args.data_root,
           "MODEL.WEIGHTS", model_final,
           "OUTPUT_DIR", args.output_dir]
    cmd += _train_opts(args)
    sh(cmd)
    metrics = os.path.join(args.output_dir, "metrics.json")
    assert os.path.exists(metrics), "eval wrote no metrics.json"
    with open(metrics) as f:
        last = json.loads(f.read().strip().splitlines()[-1])
    print("eval results:", json.dumps(last, indent=2, default=float))


def stage_pseudo(args, model_final):
    """Cityscapes video-sequence pseudo labels with the fine-trained
    model (MSC-flip per the PseudoLabelGeneration config), then the
    prepare_cityscapes conversion into gtFine_sequence — after which
    cityscapes_scene_seg_train_video_sequence is trainable.
    Reference flow: GETTING_STARTED.md steps 2-3."""
    seq_root = os.path.join(args.data_root, "cityscapes", "gtFine_sequence")
    inst_dir = os.path.join(seq_root, "pseudo_instanceIds")
    cmd = [sys.executable, "tools/generate_pseudo_labels.py",
           "--config-file", "configs/MGNet-Cityscapes-PseudoLabelGeneration.yaml",
           "--dataset", "cityscapes_scene_seg_train_video_sequence",
           "--data-root", args.data_root,
           "--weights", model_final,
           "--output", inst_dir,
           "--batch", "2",
           # curated fine labels override pseudo labels where they exist
           # (reference --copy_fine_labels)
           "--gt-instance-dir",
           os.path.join(args.data_root, "cityscapes", "gtFine", "train")]
    if args.smoke:
        cmd += ["INPUT.MIN_SIZE_TEST", "128", "INPUT.MAX_SIZE_TEST", "256",
                "MODEL.COMPUTE_DTYPE", "float32"]
    sh(cmd)
    sh([sys.executable, "datasets/prepare_cityscapes.py",
        "--input-dir", inst_dir,
        "--output-dir", os.path.join(seq_root, "cityscapes_panoptic_train"),
        "--json", os.path.join(seq_root, "cityscapes_panoptic_train.json"),
        "--workers", str(args.workers)])


def stage_video(args, model_final, weights_npz):
    """Retrain on the pseudo-labeled video-sequence split, initialized
    from the fine-trained checkpoint (reference GETTING_STARTED.md step 3:
    MODEL.WEIGHTS = cityscapes_fine checkpoint)."""
    out = args.output_dir.rstrip("/") + "_video"
    cmd = [sys.executable, "tools/train_net.py",
           "--config-file", "configs/MGNet-Cityscapes-VideoSequence.yaml",
           "--data-root", args.data_root,
           "MODEL.WEIGHTS", model_final or weights_npz or "",
           "OUTPUT_DIR", out]
    cmd += _train_opts(args)
    sh(cmd)
    final = os.path.join(out, "model_final")
    assert os.path.exists(final), f"video training left no {final}"
    return final


def stage_kitti(args, model_final, weights_npz):
    """KITTI leg: pseudo labels on the Eigen-Zhou split with the fine
    model, prepare_kitti_eigen conversion, Eigen-Zhou train (fine init)
    + depth eval (reference GETTING_STARTED.md steps 4-6)."""
    plabel_root = os.path.join(args.data_root, "kitti_eigen",
                               "panoptic_pseudo_labels")
    inst_dir = os.path.join(plabel_root, "pseudo_instanceIds")
    cmd = [sys.executable, "tools/generate_pseudo_labels.py",
           "--config-file",
           "configs/MGNet-KITTI-Eigen-PseudoLabelGeneration.yaml",
           "--dataset", "kitti_zhou_scene_seg_train",
           "--data-root", args.data_root,
           "--weights", model_final,
           "--output", inst_dir,
           "--batch", "2"]
    if args.smoke:
        cmd += ["INPUT.MIN_SIZE_TEST", "96", "INPUT.MAX_SIZE_TEST", "320",
                "MODEL.COMPUTE_DTYPE", "float32"]
    sh(cmd)
    sh([sys.executable, "datasets/prepare_kitti_eigen.py",
        "--input-dir", inst_dir,
        "--output-dir", os.path.join(plabel_root,
                                     "eigen_zhou_files_panoptic"),
        "--json", os.path.join(plabel_root,
                               "eigen_zhou_files_panoptic.json"),
        "--workers", str(args.workers)])

    out = args.output_dir.rstrip("/") + "_kitti"
    base = [sys.executable, "tools/train_net.py",
            "--config-file", "configs/MGNet-KITTI-Eigen-Zhou.yaml",
            "--data-root", args.data_root]
    sh(base + ["MODEL.WEIGHTS", model_final or weights_npz or "",
               "OUTPUT_DIR", out] + _train_opts(args, kitti=True))
    final = os.path.join(out, "model_final")
    assert os.path.exists(final), f"KITTI training left no {final}"
    sh(base + ["--eval-only", "MODEL.WEIGHTS", final, "OUTPUT_DIR", out]
       + _train_opts(args, kitti=True))
    metrics = os.path.join(out, "metrics.json")
    assert os.path.exists(metrics), "KITTI eval wrote no metrics.json"
    return final


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="./datasets")
    p.add_argument("--weights-dir", default="./weights")
    p.add_argument("--backbone-pth", default="",
                   help="torchvision/SWSL ResNet-18 checkpoint")
    p.add_argument("--pose-pth", default="",
                   help="vanilla ResNet-18 checkpoint for the pose net")
    p.add_argument("--config",
                   default="configs/MGNet-Cityscapes-Fine.yaml")
    p.add_argument("--output-dir", default="")
    p.add_argument("--stages", default="prepare,init,train,eval",
                   help="comma list from: prepare,init,train,eval,pseudo,"
                        "video,kitti — or 'all' for the full 3-config "
                        "chain (Fine -> pseudo labels -> VideoSequence -> "
                        "KITTI Eigen-Zhou)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--force", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="synthesize mini data + weights; tiny train/eval")
    p.add_argument("--drill", action="store_true",
                   help="full-fidelity drill: synthesize FULL-SHAPE data "
                        "(1024x2048 Cityscapes, 384x1280 KITTI) and run "
                        "the chain with the configs' real input pipeline, "
                        "shrinking only the schedule. Exercises exactly "
                        "the jitted shapes of a real-data run; expects a "
                        "TPU and ~tens of minutes.")
    args = p.parse_args()

    if args.drill:
        args.smoke = True  # drill implies synthetic data + tiny schedule
    if args.smoke and args.data_root == "./datasets":
        args.data_root = tempfile.mkdtemp(prefix="mgnet_smoke_data_")
    if args.smoke and not args.output_dir:
        args.output_dir = tempfile.mkdtemp(prefix="mgnet_smoke_out_")
    if not args.output_dir:
        args.output_dir = "./output/pipeline"
    if args.stages.strip() == "all":
        args.stages = "prepare,init,train,eval,pseudo,video,kitti"
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]

    if args.smoke:
        from mgnet_tpu.data.synthetic import (
            make_synthetic_cityscapes_raw,
            make_synthetic_kitti_raw,
        )

        cs_shape = (1024, 2048) if args.drill else (128, 256)
        for split in ("train", "val"):
            make_synthetic_cityscapes_raw(
                args.data_root, split, height=cs_shape[0], width=cs_shape[1])
        if "kitti" in stages:
            kt_shape = (384, 1280) if args.drill else (96, 320)
            make_synthetic_kitti_raw(
                args.data_root, height=kt_shape[0], width=kt_shape[1])
        print(f"smoke: synthetic raw dataset at {args.data_root} "
              f"({cs_shape[0]}x{cs_shape[1]})")

    weights_npz = os.path.join(args.weights_dir, "imagenet_weights.npz")
    model_final = os.path.join(args.output_dir, "model_final")
    elapsed = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        elapsed[name] = time.monotonic() - t0
        print(f"stage {name}: {elapsed[name]:.1f} s", flush=True)
        return out

    if "prepare" in stages:
        timed("prepare", lambda: stage_prepare(args))
    if "init" in stages:
        weights_npz = timed("init", lambda: stage_init(args))
    if "train" in stages:
        model_final = timed("train", lambda: stage_train(
            args, weights_npz if os.path.exists(weights_npz) else ""))
    if "eval" in stages:
        timed("eval", lambda: stage_eval(args, model_final))
    if "pseudo" in stages:
        timed("pseudo", lambda: stage_pseudo(args, model_final))
    if "video" in stages:
        timed("video", lambda: stage_video(args, model_final, weights_npz))
    if "kitti" in stages:
        timed("kitti", lambda: stage_kitti(args, model_final, weights_npz))
    print("PIPELINE OK:", " -> ".join(
        f"{s}[{elapsed.get(s, 0):.0f}s]" for s in stages))


if __name__ == "__main__":
    main()
