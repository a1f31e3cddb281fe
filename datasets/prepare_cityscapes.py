#!/usr/bin/env python
"""Convert Cityscapes instanceIds PNGs to COCO-panoptic format.

Parity with reference: datasets/prepare_cityscapes.py (convert2panoptic):
for every *_instanceIds.png, build an id2rgb panoptic PNG plus a
segments_info entry per segment — stuff segments keyed by label id, thing
instances by id//1000 with iscrowd when the raw id lacks an instance index.
Multiprocess over images.
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
from mgnet_tpu.data.mapper import id2rgb  # noqa: E402

THING_IDS = {c["id"] for c in CITYSCAPES_SCENE_SEG_CATEGORIES if c["isthing"]}
KNOWN_IDS = {c["id"] for c in CITYSCAPES_SCENE_SEG_CATEGORIES}


def convert_one(args):
    in_path, out_dir = args
    from PIL import Image

    inst = np.asarray(Image.open(in_path))
    pan = np.zeros_like(inst, np.int64)
    segments = []
    for raw_id in np.unique(inst):
        raw_id = int(raw_id)
        if raw_id < 1000:
            category_id, iscrowd = raw_id, int(raw_id in THING_IDS)
        else:
            category_id, iscrowd = raw_id // 1000, 0
        if category_id not in KNOWN_IDS:
            continue  # unlabeled / void
        mask = inst == raw_id
        pan[mask] = raw_id
        ys, xs = np.nonzero(mask)
        segments.append({
            "id": raw_id,
            "category_id": category_id,
            "area": int(mask.sum()),
            "bbox": [int(xs.min()), int(ys.min()),
                     int(xs.max() - xs.min() + 1),
                     int(ys.max() - ys.min() + 1)],
            "iscrowd": iscrowd,
        })
    stem = os.path.basename(in_path).replace("_instanceIds.png", "")
    out_name = f"{stem}_panoptic.png"
    Image.fromarray(id2rgb(pan)).save(os.path.join(out_dir, out_name))
    return {
        "image_id": stem,
        "file_name": out_name,
        "segments_info": segments,
    }


def convert2panoptic(input_dir: str, output_dir: str, json_path: str,
                     workers: int = 8):
    os.makedirs(output_dir, exist_ok=True)
    files = sorted(glob.glob(
        os.path.join(input_dir, "**", "*_instanceIds.png"), recursive=True
    ))
    assert files, f"No *_instanceIds.png under {input_dir}"
    with Pool(workers) as pool:
        annotations = pool.map(
            convert_one, [(f, output_dir) for f in files]
        )
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
    p.add_argument("--input-dir", required=True,
                   help="directory containing *_instanceIds.png")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--json", required=True)
    p.add_argument("--workers", type=int, default=8)
    a = p.parse_args()
    convert2panoptic(a.input_dir, a.output_dir, a.json, a.workers)
