#!/usr/bin/env python
"""Convert KITTI pseudo-label instanceIds PNGs to COCO-panoptic format.

Parity with reference: datasets/prepare_kitti_eigen.py — same conversion
as prepare_cityscapes but annotations file names keep the KITTI drive
structure (label_<...>) so the registry can map them back to image paths.
"""

import argparse
import glob
import json
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mgnet_tpu.data.categories import CITYSCAPES_SCENE_SEG_CATEGORIES  # noqa: E402
from prepare_cityscapes import convert_one  # noqa: E402


def convert2panoptic(input_dir, output_dir, json_path, workers=8):
    os.makedirs(output_dir, exist_ok=True)
    files = sorted(glob.glob(
        os.path.join(input_dir, "**", "*_instanceIds.png"), recursive=True
    ))
    assert files, f"No *_instanceIds.png under {input_dir}"
    with Pool(workers) as pool:
        annotations = pool.map(convert_one, [(f, output_dir) for f in files])
    categories = [
        {"id": c["id"], "name": c["name"], "color": list(c["color"]),
         "supercategory": "", "isthing": c["isthing"]}
        for c in CITYSCAPES_SCENE_SEG_CATEGORIES
    ]
    with open(json_path, "w") as f:
        json.dump({"annotations": annotations, "categories": categories}, f)
    print(f"Converted {len(files)} label files -> {json_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--json", required=True)
    p.add_argument("--workers", type=int, default=8)
    a = p.parse_args()
    convert2panoptic(a.input_dir, a.output_dir, a.json, a.workers)
