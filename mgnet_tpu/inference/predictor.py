"""Single-image predictor.

Behavioral parity with reference: mgnet/inference/predictor.py
(MGNetPredictor): load checkpoint, resize shortest edge to the test size,
build the camera matrix from calibration info, run the model + full
post-processing, return per-image results.

TPU-first: the whole forward + post-processing is the fused jitted
executable (inference/fused.py); resize-to-original happens on device via
the align-corners bilinear matmul resize.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mgnet_tpu.data.catalog import MetadataCatalog
from mgnet_tpu.data.mapper import TestDatasetMapper
from mgnet_tpu.inference.fused import build_fused_inference, statics_from_meta
from mgnet_tpu.models.mgnet import build_model

__all__ = ["Predictor"]


class Predictor:
    def __init__(self, cfg, params=None, batch_stats=None,
                 checkpoint_path: Optional[str] = None,
                 calibration_info: Optional[Dict] = None,
                 dataset_name: Optional[str] = None):
        self.cfg = cfg
        self.model = build_model(cfg)
        if params is None:
            path = checkpoint_path or cfg.MODEL.WEIGHTS
            if path and not os.path.isfile(path) and os.path.isfile(
                    path + ".npz"):
                path = path + ".npz"  # suffix-tolerant, as in the trainer
            if path and path.endswith(".npz"):
                # ImageNet-init npz (flagship configs' MODEL.WEIGHTS):
                # random init + grafting, the trainer's resume_or_load
                # semantics — orbax restore would choke on a flat npz
                from mgnet_tpu.utils.weights import load_pretrained_npz

                dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
                variables = self.model.init(
                    jax.random.PRNGKey(0), dummy, train=False
                )
                params = {"model": variables["params"]}
                batch_stats = variables.get("batch_stats", {})
                params, batch_stats, info = load_pretrained_npz(
                    path, params, batch_stats)
                if info["matched"] == 0:
                    raise ValueError(
                        f"weights {path!r} matched zero leaves ({info})")
            elif path:
                from mgnet_tpu.utils.checkpoint import load_params

                params, batch_stats = load_params(path)
            else:
                dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
                variables = self.model.init(
                    jax.random.PRNGKey(0), dummy, train=False
                )
                params = {"model": variables["params"]}
                batch_stats = variables.get("batch_stats", {})
        self.params = params
        self.batch_stats = batch_stats

        self.use_tta = bool(cfg.TEST.MSC_FLIP_EVAL)
        name = dataset_name or cfg.DATASETS.TEST[0]
        meta = MetadataCatalog.get(name)
        if meta.get("categories") is None:
            # dataset not registered: fall back to the category table
            # matching the model's class count
            from mgnet_tpu.data.categories import (
                CITYSCAPES_CATEGORIES,
                CITYSCAPES_SCENE_SEG_CATEGORIES,
                build_meta,
            )

            cats = (CITYSCAPES_SCENE_SEG_CATEGORIES
                    if cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES == 20
                    else CITYSCAPES_CATEGORIES)
            meta.set(**build_meta(cats))
        statics = statics_from_meta(cfg, meta)
        self.statics = statics
        if self.use_tta:
            # multi-scale + flip averaging before post-processing
            # (reference TEST.MSC_FLIP_EVAL / forward_multi_scale_flip,
            # used by the PseudoLabelGeneration configs)
            from functools import partial

            from mgnet_tpu.inference.tta import multi_scale_flip_inference
            from mgnet_tpu.postprocessing.panoptic import panoptic_fusion
            from mgnet_tpu.train.step import normalize_images

            pm = tuple(cfg.MODEL.PIXEL_MEAN)
            ps = tuple(cfg.MODEL.PIXEL_STD)
            with_pan = cfg.WITH_PANOPTIC
            with_depth = cfg.WITH_DEPTH

            def tta_fused(params, batch_stats, image, camera_matrix=None,
                          camera_height=None):
                variables = {"params": params["model"],
                             "batch_stats": batch_stats}
                x = normalize_images(image, pm, ps)
                out = multi_scale_flip_inference(
                    self.model, variables, x,
                    with_panoptic=with_pan, with_depth=with_depth,
                )
                result = {}
                if with_pan:
                    sem = jnp.argmax(out["sem_seg"], axis=-1).astype(
                        jnp.int32)
                    fuse = partial(
                        panoptic_fusion,
                        num_classes=statics.num_classes,
                        last_stuff_id=statics.last_stuff_id,
                        label_divisor=statics.label_divisor,
                        stuff_area=statics.stuff_area,
                        void_label=-1,
                        threshold=statics.center_threshold,
                        nms_kernel=statics.nms_kernel,
                        max_instances=statics.max_instances,
                    )
                    result["panoptic"] = jax.vmap(fuse)(
                        sem, out["center"][..., 0], out["offset"]
                    )
                    result["sem_seg"] = sem
                    result["center"] = out["center"][..., 0]
                    result["offset"] = out["offset"]
                if with_depth:
                    result["depth"] = out["depth"][..., 0]
                return result

            self._fused_raw = tta_fused
            self.fused = jax.jit(tta_fused)
        else:
            self._fused_raw = build_fused_inference(
                self.model, statics,
                tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD),
                with_panoptic=cfg.WITH_PANOPTIC, with_depth=cfg.WITH_DEPTH,
            )
            self.fused = jax.jit(self._fused_raw)
        self._fused_filtered: Dict = {}
        self.mapper = TestDatasetMapper(cfg)
        self.calibration_info = calibration_info

    def __call__(self, image: np.ndarray,
                 camera_matrix: Optional[np.ndarray] = None,
                 camera_height: Optional[float] = None) -> Dict:
        """image: [H, W, 3] uint8 RGB. Returns numpy results dict."""
        h, w = image.shape[:2]
        t = self.mapper._resize(h, w)
        resized = t.apply_image(image).astype(np.float32)
        if camera_matrix is None and self.calibration_info is not None:
            intr = self.calibration_info["intrinsic"]
            camera_matrix = np.array(
                [[intr["fx"], 0, intr["u0"]],
                 [0, intr["fy"], intr["v0"]],
                 [0, 0, 1]], np.float32,
            )
            camera_height = self.calibration_info["extrinsic"]["z"]
        if camera_matrix is not None:
            # co-augment intrinsics with the resize
            oc = t.apply_coords(np.array(
                [[camera_matrix[0, 2], camera_matrix[1, 2]]]
            ))
            fl = t.apply_focal(np.array(
                [[camera_matrix[0, 0], camera_matrix[1, 1]]]
            ))
            camera_matrix = np.array(
                [[fl[0, 0], 0, oc[0, 0]],
                 [0, fl[0, 1], oc[0, 1]],
                 [0, 0, 1]], np.float32,
            )
        kwargs = {}
        if camera_matrix is not None:
            kwargs["camera_matrix"] = jnp.asarray(camera_matrix)[None]
            kwargs["camera_height"] = jnp.asarray(
                [camera_height if camera_height is not None else 1.0],
                jnp.float32,
            )
        out = self.fused(
            self.params, self.batch_stats, jnp.asarray(resized)[None],
            **kwargs,
        )
        return {k: np.asarray(v[0]) for k, v in out.items()}

    def predict_batch(self, images_resized: np.ndarray,
                      camera_matrix: Optional[np.ndarray] = None,
                      camera_height: Optional[np.ndarray] = None,
                      outputs: Optional[tuple] = None,
                      materialize: bool = True) -> Dict:
        """Batched raw-path inference on pre-resized images.

        Args:
            images_resized: [B, H, W, 3] float32, already mapper-resized
                to a common shape (e.g. the fixed-size video-sequence
                frames in pseudo-label generation — reference DDP batched
                loader, generate_pseudo_labels.py:40-64).
            outputs: optional tuple of result keys to compute and fetch.
                When set, a filtered executable is compiled (cached per
                key tuple): XLA dead-code-eliminates the unrequested
                branches AND only the requested arrays travel D2H — at
                1024x2048 the full panoptic dict is ~40 MB/image while
                `("panoptic",)` is 8 MB, the difference dominating
                host-attached transfer cost (pseudo-label generation
                consumes panoptic only).
        Returns dict of [B, ...] numpy arrays.
        """
        kwargs = {}
        if camera_matrix is not None:
            kwargs["camera_matrix"] = jnp.asarray(camera_matrix)
            kwargs["camera_height"] = jnp.asarray(
                camera_height if camera_height is not None
                else np.ones((images_resized.shape[0],), np.float32))
        fn = self.fused
        if outputs is not None:
            # validate BEFORE compiling: a bad key inside the jitted
            # filtered closure would surface as a bare trace-time KeyError
            available = set()
            if self.cfg.WITH_PANOPTIC:
                available |= {"sem_seg", "center", "offset", "panoptic"}
            if self.cfg.WITH_DEPTH:
                available.add("depth")
                if self.cfg.MODEL.POST_PROCESSING.USE_DGC_SCALING:
                    available.add("points")
            bad = [k for k in outputs if k not in available]
            if bad:
                raise ValueError(
                    f"predict_batch outputs {bad} not produced by this "
                    f"config (available: {sorted(available)})")
            if "points" in outputs and camera_matrix is None:
                raise ValueError(
                    "'points' requires camera_matrix (DGC unprojection)")
            key = tuple(outputs)
            if key not in self._fused_filtered:
                raw = self._fused_raw

                def filtered(params, batch_stats, image, _keys=key,
                             **kw):
                    res = raw(params, batch_stats, image, **kw)
                    return {k: res[k] for k in _keys}

                self._fused_filtered[key] = jax.jit(filtered)
            fn = self._fused_filtered[key]
        out = fn(
            self.params, self.batch_stats, jnp.asarray(images_resized),
            **kwargs,
        )
        if not materialize:
            # device arrays, dispatch still in flight: the caller can
            # enqueue the NEXT batch before blocking on np.asarray, so
            # D2H transfer of batch N overlaps batch N+1's compute
            # (pseudo-label generation's software pipeline)
            return dict(out)
        return {k: np.asarray(v) for k, v in out.items()}
