"""The training orchestrator: data, compiled step, checkpoints, eval.

Replaces the reference's detectron2 DefaultTrainer subclass + launch()
multi-process runtime (reference: tools/train_net.py:37-248; SURVEY.md
§3.1): a single-controller SPMD loop — one process drives the whole mesh;
the compiled train step embeds gradient averaging and sync-BN collectives;
checkpoints via Orbax; periodic evaluation drives the evaluator stack.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mgnet_tpu.data import (
    DatasetCatalog,
    MetadataCatalog,
    TrainLoader,
    read_image,
    rgb2id,
)
from mgnet_tpu.evaluation import (
    DepthEvaluator,
    PanopticEvaluator,
    SemSegEvaluator,
)
from mgnet_tpu.geometry.image import interpolate_bilinear
from mgnet_tpu.inference.fused import statics_from_meta
from mgnet_tpu.models.mgnet import build_model
from mgnet_tpu.parallel import (
    create_mesh,
    is_main_process,
    replicate_to_mesh,
    shard_batch,
    synchronize,
)
from mgnet_tpu.postprocessing import depth_postprocess, panoptic_fusion
from mgnet_tpu.train.state import create_train_state
from mgnet_tpu.train.step import make_eval_step, make_train_step
from mgnet_tpu.utils.checkpoint import CheckpointManager
from mgnet_tpu.utils.events import MetricLogger

__all__ = ["Trainer", "evaluate_dataset"]


class Trainer:
    def __init__(self, cfg, output_dir: Optional[str] = None):
        self.cfg = cfg
        self.output_dir = output_dir or cfg.OUTPUT_DIR
        os.makedirs(self.output_dir, exist_ok=True)

        self.mesh = create_mesh(cfg.MESH.DATA, cfg.MESH.MODEL)
        self.model = build_model(cfg)

        crop = cfg.INPUT.CROP.SIZE if cfg.INPUT.CROP.ENABLED else (512, 512)
        n_dev = self.mesh.devices.size
        batch = cfg.SOLVER.IMS_PER_BATCH
        accum = max(1, int(cfg.SOLVER.GRAD_ACCUM_STEPS))
        assert batch % (n_dev * accum) == 0, (
            f"IMS_PER_BATCH={batch} must divide over {n_dev} devices x "
            f"{accum} GRAD_ACCUM_STEPS micro-batches"
        )
        self.state = create_train_state(
            cfg, self.model, jax.random.PRNGKey(cfg.SEED),
            sample_shape=(batch, crop[0], crop[1], 3),
        )
        self.state = replicate_to_mesh(self.mesh, self.state)
        self.train_step = jax.jit(make_train_step(cfg, self.model),
                                  donate_argnums=(0,))
        self.ckpt = CheckpointManager(
            os.path.join(self.output_dir, "checkpoints")
        )
        self.logger = MetricLogger(self.output_dir)

        dataset_name = cfg.DATASETS.TRAIN[0]
        dataset = DatasetCatalog.get(dataset_name)
        # dynamic mapper loading from config strings (reference
        # tools/train_net.py:90-92 via create_object_by_string) — custom
        # mappers plug in purely via INPUT.TRAIN_DATASET_MAPPER
        from mgnet_tpu.utils.loader import locate

        mapper = locate(cfg.INPUT.TRAIN_DATASET_MAPPER)(
            cfg, dataset_name=dataset_name
        )
        # per-process dataset sharding: each host maps only its slice of
        # every global batch; shard_batch assembles the global array
        self.loader = TrainLoader(
            dataset, mapper, batch_size=batch, seed=cfg.SEED,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            prefetch=cfg.DATALOADER.PREFETCH,
            divisibility=cfg.MODEL.SIZE_DIVISIBILITY,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

    def resume_or_load(self, resume: bool = True):
        if resume:
            self.state, restored = self.ckpt.restore(self.state)
            if restored:
                print(f"Resumed from step {int(self.state.step)}")
                return
        weights = self.cfg.MODEL.WEIGHTS
        if weights:
            if os.path.isdir(weights):
                # Trained-checkpoint init (reference DetectionCheckpointer
                # accepts both; GETTING_STARTED.md step 3 starts the
                # VideoSequence/KITTI legs from the Fine model_final).
                # Grafted leaf-by-leaf with shape checking like the npz
                # path: the KITTI legs have a 19-class head vs the Fine
                # checkpoint's 20 — mismatched leaves keep their fresh
                # init (detectron2 matching_heuristics semantics).
                from mgnet_tpu.utils.checkpoint import load_params
                from mgnet_tpu.utils.weights import (
                    flatten_params,
                    unflatten_params,
                )

                ck_params, ck_stats = load_params(weights, None)
                matched, skipped = 0, []
                new_state = {}
                for name, src, dst in (
                    ("params", ck_params, self.state.params),
                    ("batch_stats", ck_stats, self.state.batch_stats),
                ):
                    src_flat = flatten_params(src)
                    dst_flat = flatten_params(jax.device_get(dst))
                    take = {}
                    for k, v in src_flat.items():
                        if k in dst_flat and dst_flat[k].shape == np.asarray(
                                v).shape:
                            take[k] = np.asarray(v)
                            matched += 1
                        else:
                            skipped.append(k)
                    new_state[name] = unflatten_params(dst, take)
                if matched == 0:
                    raise ValueError(
                        f"MODEL.WEIGHTS={weights!r} (checkpoint dir) "
                        "matched zero parameter leaves; wrong checkpoint "
                        "or incompatible model.")
                self.state = self.state.replace(
                    params=new_state["params"],
                    batch_stats=new_state["batch_stats"],
                )
                print(f"Loaded checkpoint weights from {weights}: "
                      f"{matched} leaves"
                      + (f", skipped {len(skipped)} (shape/name mismatch): "
                         f"{skipped[:6]}..." if skipped else ""))
                return
            # ImageNet init grafting (reference DetectionCheckpointer with
            # matching_heuristics, SURVEY.md §5). Resolve with or without
            # the .npz suffix; a configured-but-absent weights file is a
            # hard error — silently training from scratch would sink
            # accuracy parity (reference configs/MGNet-Cityscapes-Fine.yaml:3).
            from mgnet_tpu.utils.weights import load_pretrained_npz

            candidates = [weights]
            if not weights.endswith(".npz"):
                candidates.insert(0, weights + ".npz")
            path = next((p for p in candidates if os.path.exists(p)), None)
            if path is None:
                raise FileNotFoundError(
                    f"MODEL.WEIGHTS={weights!r} not found "
                    f"(tried {candidates}); run "
                    "tools/initialize_weights.sh or clear MODEL.WEIGHTS "
                    "to train from scratch."
                )
            params, stats, info = load_pretrained_npz(
                path, jax.device_get(self.state.params),
                jax.device_get(self.state.batch_stats),
            )
            if info["matched"] == 0:
                raise ValueError(
                    f"MODEL.WEIGHTS={path!r} matched zero parameter leaves "
                    f"({info}); wrong file or incompatible model."
                )
            self.state = self.state.replace(
                params=params, batch_stats=stats
            )
            print(f"Loaded pretrained weights from {path}: {info}")

    def train(self):
        cfg = self.cfg
        max_iter = cfg.SOLVER.MAX_ITER
        start = int(self.state.step)
        it = iter(self.loader)
        t_last = time.time()
        for i in range(start, max_iter):
            batch = next(it)
            batch = shard_batch(self.mesh, batch)
            self.state, metrics = self.train_step(self.state, batch)
            if (i + 1) % 20 == 0 or i == start:
                host = {k: float(v) for k, v in metrics.items()}
                host["iter_time"] = (time.time() - t_last) / 20
                t_last = time.time()
                self.logger.log(i + 1, host)
            if (i + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or i + 1 == max_iter:
                # replicated arrays are fully addressable on every host;
                # rank 0 alone persists them (reference rank-0 writes)
                if is_main_process():
                    self.ckpt.save(i + 1, self.state)
                synchronize()
            if cfg.TEST.EVAL_PERIOD > 0 and (i + 1) % cfg.TEST.EVAL_PERIOD == 0:
                results = self.test()
                flat = {
                    f"eval/{grp}/{k}": v
                    for grp, d in results.items() for k, v in d.items()
                }
                self.logger.log(i + 1, flat)
        self.ckpt.wait()
        from mgnet_tpu.utils.profiling import peak_hbm_gb

        peak = peak_hbm_gb()
        if peak is not None:
            self.logger.log(max_iter, {"peak_hbm_gb": peak})
        # params-only snapshot for eval/demo/export (detectron2
        # model_final analog); restored by utils.checkpoint.load_params
        from mgnet_tpu.utils.checkpoint import save_params

        if is_main_process():
            save_params(
                os.path.join(self.output_dir, "model_final"),
                jax.device_get(self.state.params),
                jax.device_get(self.state.batch_stats),
            )
        synchronize()
        self.loader.close()

    def test(self) -> Dict[str, Dict[str, float]]:
        return evaluate_dataset(
            self.cfg, self.model,
            jax.device_get(self.state.params),
            jax.device_get(self.state.batch_stats),
            image_logger=self.logger,
            log_step=int(self.state.step),
            visualize_dir=(
                os.path.join(self.output_dir, "eval_vis")
                if self.cfg.VISUALIZE_EVALUATION else None
            ),
        )


def run_bucketed_eval(prepared_iter, key_fn, batch_size, flush):
    """Shape-bucketed batching scheduler for the eval loop.

    Groups a stream of prepared samples by shape key, flushing a FULL
    batch (``batch_size``) as soon as one accumulates; after the stream
    ends, the one partial tail bucket per key flushes with ``final=True``
    so ``eval_pad_to`` can shrink its padding. Module-level (not a
    closure) so the exactly-once / padding invariants are unit-testable
    (tests/test_eval_buckets.py). Returns the number of samples seen.
    """
    from collections import defaultdict

    buckets = defaultdict(list)
    n_items = 0
    for item in prepared_iter:
        key = key_fn(item)
        buckets[key].append(item)
        n_items += 1
        if len(buckets[key]) == batch_size:
            flush(key, buckets.pop(key))
    for key in list(buckets):
        flush(key, buckets.pop(key), final=True)
    return n_items


def eval_pad_to(n_items: int, batch_size: int, final: bool) -> int:
    """Static batch size a bucket of ``n_items`` pads to.

    Mid-stream flushes only happen at exactly ``batch_size``; the FINAL
    partial bucket per shape key pads to the next power of two instead,
    clamped to ``batch_size`` (a pow2 above it would compile and run a
    larger device batch than the user memory-tuned for). This bounds the
    wasted compute at pow2(k)-k < k instead of batch_size-k — on KITTI
    every per-drive width is its own shape key, so tail buckets add up
    (VERDICT r3 weak #9). Each pow2 size is one extra retrace of
    eval_step, cached in the persistent compilation cache.
    """
    if not final:
        return batch_size
    return min(batch_size, 1 << max(0, n_items - 1).bit_length())


def evaluate_dataset(cfg, model, params, batch_stats,
                     dataset_name: Optional[str] = None,
                     max_samples: Optional[int] = None,
                     image_logger=None, log_step: int = 0,
                     visualize_dir: Optional[str] = None
                     ) -> Dict[str, Dict[str, float]]:
    """Run the full evaluator stack over a test split.

    Parity: reference Trainer.test + inference_on_dataset (SURVEY.md §3.2):
    raw forward -> resize outputs to original resolution -> panoptic fusion
    -> DGC depth -> PanopticEvaluator / SemSegEvaluator / DepthEvaluator;
    optional instance extraction (TEST.EVAL_INSTANCE), TensorBoard image
    logging of the first predictions (reference TensorboardImageWriter,
    tensorboard_image_writer.py:14-105) and on-disk prediction dumps
    (reference EvaluationVisualizer / VISUALIZE_EVALUATION flag).
    """
    dataset_name = dataset_name or cfg.DATASETS.TEST[0]
    dataset = DatasetCatalog.get(dataset_name)
    if max_samples:
        dataset = dataset[:max_samples]
    # multi-process evaluation: each process handles a strided shard;
    # evaluators merge state via all_gather in evaluate() (reference
    # comm.gather, panoptic_evaluation.py:119-122)
    n_proc = jax.process_count()
    if n_proc > 1:
        dataset = dataset[jax.process_index()::n_proc]
    meta = MetadataCatalog.get(dataset_name)
    # dynamic mapper loading (reference tools/train_net.py:94-97)
    from mgnet_tpu.utils.loader import locate

    mapper = locate(cfg.INPUT.TEST_DATASET_MAPPER)(
        cfg, dataset_name=dataset_name
    )
    statics = statics_from_meta(cfg, meta)

    if cfg.TEST.MSC_FLIP_EVAL:
        # multi-scale + flip TTA (reference forward_multi_scale_flip path,
        # enabled by the PseudoLabelGeneration configs)
        from mgnet_tpu.inference.tta import multi_scale_flip_inference
        from mgnet_tpu.train.step import normalize_images

        pm = tuple(cfg.MODEL.PIXEL_MEAN)
        ps = tuple(cfg.MODEL.PIXEL_STD)

        def tta_step(params, batch_stats, images):
            variables = {"params": params["model"],
                         "batch_stats": batch_stats}
            x = normalize_images(images, pm, ps)
            out = multi_scale_flip_inference(
                model, variables, x,
                with_panoptic=cfg.WITH_PANOPTIC,
                with_depth=cfg.WITH_DEPTH,
            )
            # sem_seg here is averaged *probabilities*; downstream argmax
            # is unchanged, log-space consumers use it as scores
            return out

        eval_step = jax.jit(tta_step)
    else:
        eval_step = jax.jit(make_eval_step(cfg, model))
    evaluators = {}
    if cfg.WITH_PANOPTIC:
        evaluators["panoptic"] = PanopticEvaluator(meta)
        if cfg.TEST.EVAL_SEMANTIC:
            evaluators["semantic"] = SemSegEvaluator(meta)
    if cfg.WITH_DEPTH:
        evaluators["depth"] = DepthEvaluator(
            min_depth=cfg.TEST.MIN_DEPTH, max_depth=cfg.TEST.MAX_DEPTH,
            use_gt_scale=not cfg.MODEL.POST_PROCESSING.USE_DGC_SCALING,
            use_eigen_crop="kitti" in dataset_name,
        )

    visualizer = None
    if image_logger is not None or visualize_dir or cfg.VISUALIZE_EVALUATION:
        from mgnet_tpu.inference.visualizer import Visualizer

        visualizer = Visualizer(meta)
        if visualize_dir:
            os.makedirs(visualize_dir, exist_ok=True)
    logged_images = 0

    instances_out = [] if cfg.TEST.EVAL_INSTANCE else None
    if cfg.TEST.EVAL_INSTANCE:
        from mgnet_tpu.evaluation.instance_ap import InstanceAPEvaluator

        evaluators["instance_ap"] = InstanceAPEvaluator(meta)
    thing_train_ids = set(
        meta.thing_dataset_id_to_contiguous_id.values()
    )

    div = cfg.MODEL.SIZE_DIVISIBILITY
    # Fixed pad bucket: test-mapper outputs have shortest edge
    # MIN_SIZE_TEST and longest <= MAX_SIZE_TEST; padding every sample to
    # one bucket gives a single compiled executable across the split
    # (KITTI widths vary per drive).
    bucket_h = -(-cfg.INPUT.MIN_SIZE_TEST // div) * div
    bucket_w = -(-cfg.INPUT.MAX_SIZE_TEST // div) * div
    # Size-bucketed batched inference (reference inference_on_dataset
    # batching, tools/train_net.py:156-170): samples sharing (padded,
    # valid, original) shapes run through one compiled executable with
    # B = TEST.IMS_PER_BATCH; partial buckets are padded by repeating
    # the last sample so no extra executable compiles. TTA batches
    # TEST.TTA_IMS_PER_BATCH images (the flip pair is batched inside
    # the TTA pass itself; the 2.0x scale bounds memory).
    batch_size = max(1, int(
        cfg.TEST.TTA_IMS_PER_BATCH if cfg.TEST.MSC_FLIP_EVAL
        else cfg.TEST.IMS_PER_BATCH))

    from functools import partial

    fuse_batch = jax.vmap(partial(
        panoptic_fusion,
        num_classes=statics.num_classes,
        last_stuff_id=statics.last_stuff_id,
        label_divisor=statics.label_divisor,
        stuff_area=statics.stuff_area,
        void_label=-1,
        threshold=statics.center_threshold,
        nms_kernel=statics.nms_kernel,
        max_instances=statics.max_instances,
        use_pallas=statics.use_pallas_fusion,
    ))
    need_probs = instances_out is not None

    def run_device_batch(imgs, cams, cam_hs, h2, w2, height, width):
        """One batched forward + on-device postproc; one D2H per batch.

        Outputs are compacted on-device before the fetch (sem fits uint8,
        panoptic ids fit int16 — max 19*1000+128, void=-1 — heatmap/
        depth/probs travel f16) and upcast on the host: the eval loop is
        D2H-bound through the TPU relay (~50 MB/image uncompacted,
        BENCH_NOTES §Evaluation), and host-side metric math stays f32/
        int32 exact. f16 depth: relative step 2^-11 ≈ 5e-4, far below
        metric reporting precision; +inf (sky at inv->0) upcasts to inf
        and is masked by the [min,max] depth range as before.
        """
        out = eval_step(params, batch_stats, jnp.asarray(imgs))

        def to_full(x):
            return interpolate_bilinear(x[:, :h2, :w2], (height, width))

        res = {}
        pan = None
        if cfg.WITH_PANOPTIC:
            sem_logits = to_full(out["sem_seg"].astype(jnp.float32))
            center = to_full(out["center"].astype(jnp.float32))
            offset = to_full(out["offset"].astype(jnp.float32))
            # channel-first argmax (lane-efficient; see inference/fused.py)
            sem = jnp.argmax(
                sem_logits.transpose(0, 3, 1, 2), axis=1
            ).astype(jnp.int32)
            pan = fuse_batch(sem, center[..., 0], offset)
            res["sem"] = sem.astype(jnp.uint8)
            res["pan"] = pan.astype(jnp.int16)
            res["center"] = center[..., 0].astype(jnp.float16)
            if need_probs:
                res["probs"] = (
                    sem_logits  # TTA path: already averaged probabilities
                    if cfg.TEST.MSC_FLIP_EVAL
                    else jax.nn.softmax(sem_logits, axis=-1)
                ).astype(jnp.float16)
        if cfg.WITH_DEPTH:
            depth = to_full(out["depth"].astype(jnp.float32))
            dpp, _ = depth_postprocess(
                depth,
                jnp.asarray(cams) if cams is not None else None,
                jnp.asarray(cam_hs, jnp.float32),
                pan,
                use_dgc_scaling=cfg.MODEL.POST_PROCESSING.USE_DGC_SCALING,
                road_class_id=statics.road_class_id,
                filter_class_ids=statics.depth_filter_ids,
            )
            # clamp the far-plane sentinel (1/inv_clip = 1e6 m) into
            # f16 range: unclamped it becomes inf in the f16 cast and
            # poisons the depth metrics (any value past the evaluator's
            # 80 m max-depth mask is equivalent)
            res["depth"] = jnp.minimum(dpp, 6.0e4).astype(jnp.float16)
        host = jax.device_get(res)
        upcast = {"sem": np.int32, "pan": np.int32, "center": np.float32,
                  "probs": np.float32, "depth": np.float32}
        return {k: v.astype(upcast.get(k, v.dtype)) for k, v in host.items()}

    def process_one(sample_idx, d, sample, res, i):
        """Host-side GT loading + evaluator accumulation for one sample."""
        nonlocal logged_images
        result = {}
        if cfg.WITH_PANOPTIC:
            pan_np = res["pan"][i]
            result["panoptic"] = pan_np
            gt_meta = sample.get("meta", {})
            if gt_meta.get("pan_seg_file_name"):
                gt_pan = rgb2id(read_image(gt_meta["pan_seg_file_name"]))
                evaluators["panoptic"].process(
                    pan_np, gt_pan, gt_meta.get("segments_info")
                )
                if "semantic" in evaluators:
                    # semantic GT from the panoptic map + segments
                    gt_sem = np.full_like(gt_pan, 255, dtype=np.int32)
                    for s in gt_meta.get("segments_info", []):
                        gt_sem[gt_pan == s["id"]] = s["category_id"]
                    # instance masks for the iIoU weighting (non-crowd
                    # things, cityscapesscripts semantics)
                    gt_inst_masks = [
                        dict(category_id=s["category_id"],
                             mask=gt_pan == s["id"])
                        for s in gt_meta.get("segments_info", [])
                        if s["category_id"] in thing_train_ids
                        and not s.get("iscrowd", 0)
                    ]
                    evaluators["semantic"].process(
                        res["sem"][i], gt_sem,
                        gt_instances=gt_inst_masks)

            if instances_out is not None:
                from mgnet_tpu.postprocessing import extract_instances

                pred_inst = extract_instances(
                    res["probs"][i], res["center"][i], pan_np,
                    thing_ids=sorted(thing_train_ids),
                    label_divisor=statics.label_divisor,
                )
                instances_out.append(dict(
                    image_id=sample.get("image_id", str(sample_idx)),
                    instances=pred_inst,
                ))
                gt_meta2 = sample.get("meta", {})
                if gt_meta2.get("pan_seg_file_name"):
                    gt_pan2 = rgb2id(
                        read_image(gt_meta2["pan_seg_file_name"]))
                    gt_inst = [
                        dict(category_id=s["category_id"],
                             mask=gt_pan2 == s["id"],
                             iscrowd=s.get("iscrowd", 0))
                        for s in gt_meta2.get("segments_info", [])
                        if s["category_id"] in thing_train_ids
                    ]
                    # void = pixels not covered by any GT segment
                    evaluators["instance_ap"].process(
                        pred_inst, gt_inst, void_mask=gt_pan2 == 0)

        if cfg.WITH_DEPTH:
            dpp_i = res["depth"][i]
            gt_meta = sample.get("meta", {})
            if gt_meta.get("depth_file_name") or gt_meta.get(
                "disparity_file_name"
            ):
                evaluators["depth"].process(
                    dpp_i,
                    {**gt_meta,
                     "calibration_info": gt_meta.get("calibration_info")},
                )
            result["depth_vis"] = dpp_i

        # eval-time visual artifacts (<=2 images, reference
        # tensorboard_image_writer.py:66-83)
        if visualizer is not None and logged_images < 2:
            image_u8 = read_image(d["file_name"])
            if "panoptic" in result:
                pan_rgb = visualizer.panoptic_rgb(result["panoptic"], image_u8)
                if image_logger is not None:
                    image_logger.log_image(
                        log_step, f"eval/panoptic_{logged_images}", pan_rgb)
                if visualize_dir:
                    visualizer._save(
                        os.path.join(
                            visualize_dir,
                            f"eval_{sample_idx:04d}_panoptic.png"),
                        pan_rgb)
            if "depth_vis" in result:
                d_rgb = visualizer.depth_rgb(result["depth_vis"])
                if image_logger is not None:
                    image_logger.log_image(
                        log_step, f"eval/depth_{logged_images}", d_rgb)
                if visualize_dir:
                    visualizer._save(
                        os.path.join(
                            visualize_dir,
                            f"eval_{sample_idx:04d}_depth.png"),
                        d_rgb)
            logged_images += 1

    def prepare(args):
        sample_idx, d = args
        sample = mapper(d)
        img = sample["image"]
        h2, w2 = img.shape[:2]
        ph = bucket_h if h2 <= bucket_h else -(-h2 // div) * div
        pw = bucket_w if w2 <= bucket_w else -(-w2 // div) * div
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[:h2, :w2] = img
        return sample_idx, d, sample, padded

    def flush(key, items, final=False):
        _, _, h2, w2, height, width = key
        imgs = [it[3] for it in items]
        cams = [
            np.asarray(it[2]["camera_matrix"], np.float32)
            if "camera_matrix" in it[2] else None
            for it in items
        ]
        cam_hs = [float(it[2].get("camera_height", 1.0)) for it in items]
        # Repeat-pad partial buckets to a static batch (see eval_pad_to
        # for the pow2 tail-bucket policy). process_one below iterates
        # only over the real ``items``, so pad copies never reach any
        # evaluator.
        pad_to = eval_pad_to(len(imgs), batch_size, final)
        while len(imgs) < pad_to:
            imgs.append(imgs[-1])
            cams.append(cams[-1])
            cam_hs.append(cam_hs[-1])
        have_cams = all(c is not None for c in cams)
        res = run_device_batch(
            np.stack(imgs),
            np.stack(cams) if have_cams else None,
            np.asarray(cam_hs, np.float32),
            h2, w2, height, width,
        )
        for i, it in enumerate(items):
            process_one(it[0], it[1], it[2], res, i)

    from concurrent.futures import ThreadPoolExecutor

    def bucket_key(item):
        sample, padded = item[2], item[3]
        return (padded.shape[0], padded.shape[1],
                sample["image"].shape[0], sample["image"].shape[1],
                sample["height"], sample["width"])

    t_eval = time.time()
    with ThreadPoolExecutor(
        max(1, int(cfg.DATALOADER.NUM_WORKERS))
    ) as pool:
        n_images = run_bucketed_eval(
            pool.map(prepare, enumerate(dataset)),
            bucket_key, batch_size, flush,
        )
    eval_seconds = time.time() - t_eval

    results: Dict[str, Dict[str, float]] = {}
    for ev in evaluators.values():
        out = ev.evaluate()
        for k, v in out.items():
            results[k] = v
    if instances_out is not None:
        results.setdefault("instances", {}).update({
            "num_images": len(instances_out),
            "num_instances": float(sum(
                len(e["instances"]) for e in instances_out
            )),
        })
    if n_images and eval_seconds > 0:
        results["eval_speed"] = {
            "images_per_s": n_images / eval_seconds,
            "num_images": float(n_images),
        }
        from mgnet_tpu.utils.profiling import peak_hbm_gb

        peak = peak_hbm_gb()
        if peak is not None:
            results["eval_speed"]["peak_hbm_gb"] = peak
    return results
