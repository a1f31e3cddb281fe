#!/usr/bin/env python
"""Convert KITTI pseudo-label instanceIds PNGs to COCO-panoptic format.

Parity with reference: datasets/prepare_kitti_eigen.py — same conversion
as prepare_cityscapes but annotation file names keep the KITTI drive
structure (<date>/<drive>/label_02/data/<frame>.png) so the registry can
map them back to image paths via label_ -> image_
(mgnet_tpu/data/kitti.py:120-127; reference prepare_kitti_eigen.py:38-52).
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
from prepare_cityscapes import KNOWN_IDS, THING_IDS  # noqa: E402


def convert_one(args):
    """One instanceIds PNG -> nested COCO-panoptic PNG + annotation dict.

    Unlike the cityscapes converter (flat city_seq_frame stems), the
    annotation file_name is the path RELATIVE to the input root, with the
    _instanceIds suffix dropped — bare KITTI frame numbers collide across
    drives, and the loader needs the drive structure back.
    """
    in_path, input_dir, output_dir = args
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
    rel = os.path.relpath(in_path, input_dir)
    file_name = rel.replace("_instanceIds.png", ".png")
    out_path = os.path.join(output_dir, file_name)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    Image.fromarray(id2rgb(pan)).save(out_path)
    return {
        "image_id": os.path.splitext(file_name)[0].replace("/", "_"),
        "file_name": file_name,
        "segments_info": segments,
    }


def convert2panoptic(input_dir, output_dir, json_path, workers=8):
    os.makedirs(output_dir, exist_ok=True)
    files = sorted(glob.glob(
        os.path.join(input_dir, "**", "*_instanceIds.png"), recursive=True
    ))
    assert files, f"No *_instanceIds.png under {input_dir}"
    with Pool(workers) as pool:
        annotations = pool.map(
            convert_one, [(f, input_dir, output_dir) for f in files])
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
