#!/usr/bin/env python
"""Full TrainDatasetMapper throughput benchmark (repeatable harness).

The round-3/4 mapper numbers (801 -> 606 -> 482 ms/sample/core,
BENCH_NOTES §Data pipeline) were measured ad hoc; this tool makes the
measurement a one-command artifact and adds a phase breakdown so resize/
decode changes (e.g. the round-5 PIL-parity resize) are attributable.

Flagship semantics (reference configs/MGNet-Cityscapes-Fine.yaml:
multi-scale resize short side 512-2048 'choice' + 1024x1024 crop +
random pad-to-crop + flip + color jitter) over a 1024x2048 source, 3
frames + panoptic label, seeded RNG — the exact per-sample work the
train loader does per core.

Phases (each timed standalone with the same pinned draws; phases
overlap-free but the full-mapper row is the real number — python/numpy
glue between phases is not attributed):
  decode     4 PNG reads (cur/prev/next/panoptic)
  geometric  shared transform list on 3 frames + label
  jitter     color jitter on 3 frames
  targets    rgb2id + PanopticTargetGenerator
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_fixture(root: str, height: int, width: int):
    from PIL import Image

    from mgnet_tpu.data.mapper import id2rgb

    rng = np.random.RandomState(42)
    os.makedirs(root, exist_ok=True)
    d = {}
    for name, key in (("cur", "file_name"), ("prev", "prev_img_file_name"),
                      ("next", "next_img_file_name")):
        img = rng.randint(0, 255, (height, width, 3), np.uint8)
        p = os.path.join(root, f"{name}.png")
        Image.fromarray(img).save(p)
        d[key] = p

    # a street-scene-like label: road + sky + a handful of instances
    pan = np.full((height, width), 7 * 1000, np.int32)
    pan[: height // 4] = 23 * 1000
    segs = [{"id": 7000, "category_id": 1, "iscrowd": 0},
            {"id": 23000, "category_id": 11, "iscrowd": 0}]
    for i in range(8):
        y = height // 3 + (i % 3) * height // 8
        x = (i * width) // 9
        pan[y:y + height // 8, x:x + width // 12] = 26 * 1000 + i + 1
        segs.append({"id": 26000 + i + 1, "category_id": 14, "iscrowd": 0})
    p = os.path.join(root, "pan.png")
    Image.fromarray(id2rgb(pan)).save(p)
    d["pan_seg_file_name"] = p
    d["segments_info"] = segs
    d["calibration_info"] = {
        "intrinsic": {"fx": 2262.52, "fy": 2265.3,
                      "u0": (width - 1) / 2, "v0": (height - 1) / 2},
        "extrinsic": {"baseline": 0.222, "z": 1.22},
    }
    d["image_id"] = "bench_000000"
    d["height"], d["width"] = height, width
    return d


def bench(fn, n, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--step-seconds", type=float, default=0.336,
                    help="train-step seconds for the cores-needed row")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode-cache", action="store_true",
                    help="enable the disk decode-once cache "
                         "(DATALOADER.DECODE_CACHE_DIR); the bench then "
                         "measures the steady-state (warm-cache) epoch")
    args = ap.parse_args()

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data import native
    from mgnet_tpu.data.catalog import MetadataCatalog
    from mgnet_tpu.data.categories import (
        CITYSCAPES_SCENE_SEG_CATEGORIES,
        build_meta,
    )
    from mgnet_tpu.data.mapper import TrainDatasetMapper, read_image, rgb2id
    from mgnet_tpu.data.transforms import sample_color_jitter

    cfg = get_default_config()
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
    MetadataCatalog.get("mapper_bench").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES))

    print(f"native decode available: {native.native_available()}",
          file=sys.stderr)

    with tempfile.TemporaryDirectory() as tdir:
        d = make_fixture(tdir, args.height, args.width)
        if args.decode_cache:
            cfg.DATALOADER.DECODE_CACHE_DIR = os.path.join(tdir, "dcache")
        mapper = TrainDatasetMapper(cfg, dataset_name="mapper_bench")

        # full mapper, fresh seeded RNG per call (real per-sample work;
        # seed varies per iter so the resize-scale draw is averaged over)
        it = [0]

        def full():
            it[0] += 1
            return mapper(d, rng=np.random.default_rng(it[0]))

        t_full = bench(full, args.iters)

        # ---- phases with pinned draws ----
        rng = np.random.default_rng(1)
        imgs = [read_image(d[k]) for k in
                ("file_name", "prev_img_file_name", "next_img_file_name")]
        tfl = mapper.sampler(rng, imgs[0].shape)
        cj = cfg.INPUT.COLOR_JITTER
        jitter = sample_color_jitter(
            rng, cj.BRIGHTNESS, cj.CONTRAST, cj.SATURATION, cj.HUE)

        t_decode = bench(
            lambda: [mapper._read(d[k]) for k in
                     ("file_name", "prev_img_file_name",
                      "next_img_file_name", "pan_seg_file_name")],
            args.iters)
        pan_rgb_src = read_image(d["pan_seg_file_name"])
        t_geom = bench(
            lambda: ([tfl.apply_image(im) for im in imgs],
                     tfl.apply_segmentation(pan_rgb_src)),
            args.iters)
        aug = [tfl.apply_image(im) for im in imgs]
        t_jit = bench(lambda: [jitter.apply_image(im) for im in aug],
                      args.iters)
        pan_ids = rgb2id(tfl.apply_segmentation(pan_rgb_src))
        t_tgt = bench(
            lambda: mapper.target_gen(pan_ids, d["segments_info"]),
            args.iters)

        rows = [("decode 4 PNG", t_decode), ("geometric x3+label", t_geom),
                ("color jitter x3", t_jit), ("targets", t_tgt),
                ("FULL mapper", t_full)]
        for name, t in rows:
            print(f"# {name:20s} {t * 1e3:8.1f} ms/sample", file=sys.stderr)
        cores = args.batch * t_full / args.step_seconds
        print(f"# cores to feed batch-{args.batch} @ "
              f"{args.step_seconds:.3f} s/step: {cores:.1f}",
              file=sys.stderr)

        print(json.dumps({
            "metric": "train_mapper_ms_per_sample_per_core",
            "value": round(t_full * 1e3, 1),
            "unit": "ms",
            "phases_ms": {n: round(t * 1e3, 1) for n, t in rows[:-1]},
            "cores_for_batch": round(cores, 1),
        }))


if __name__ == "__main__":
    main()
