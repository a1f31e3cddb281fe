"""Hierarchical configuration system for MGNet-TPU.

Provides the same capabilities as the reference's yacs-based config
(reference: mgnet/config.py, detectron2 CfgNode):

* nested attribute-style access (``cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES``)
* YAML files with ``_BASE_`` inheritance
  (reference: configs/MGNet-Cityscapes-VideoSequence.yaml:1)
* CLI ``--opts KEY VALUE`` dotted overrides
  (reference: tools/train_net.py:189)
* freezing after setup

This is a fresh, minimal implementation — not a copy of yacs.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, List

import yaml

__all__ = ["ConfigNode", "get_default_config", "load_config"]

_FROZEN = "__frozen__"
_BASE_KEY = "_BASE_"


class ConfigNode(dict):
    """A dict subclass with attribute access, freezing, and YAML merging."""

    def __init__(self, init: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, _FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(f"Config has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(f"Cannot set '{name}' on a frozen config")
        if isinstance(value, dict) and not isinstance(value, ConfigNode):
            value = ConfigNode(value)
        self[name] = value

    def __delattr__(self, name: str) -> None:
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError("Cannot delete from a frozen config")
        del self[name]

    # -- freezing ------------------------------------------------------------
    def freeze(self) -> "ConfigNode":
        object.__setattr__(self, _FROZEN, True)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.freeze()
        return self

    def defrost(self) -> "ConfigNode":
        object.__setattr__(self, _FROZEN, False)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, _FROZEN)

    def clone(self) -> "ConfigNode":
        out = ConfigNode()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return out

    # -- merging -------------------------------------------------------------
    def merge_dict(self, other: Dict[str, Any], allow_new: bool = False) -> None:
        """Recursively merge ``other`` into self."""
        if self.is_frozen():
            raise AttributeError("Cannot merge into a frozen config")
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), ConfigNode):
                self[k].merge_dict(v, allow_new=allow_new)
            else:
                if k not in self and not allow_new:
                    raise KeyError(f"Unknown config key: {k}")
                self[k] = ConfigNode(v) if isinstance(v, dict) else _coerce(v, self.get(k))

    def merge_from_file(self, path: str, allow_new: bool = False) -> None:
        data = _load_yaml_with_base(path)
        self.merge_dict(data, allow_new=allow_new)

    def merge_from_list(self, opts: List[str]) -> None:
        """Merge dotted KEY VALUE pairs, e.g. ["SOLVER.BASE_LR", "0.01"]."""
        assert len(opts) % 2 == 0, f"opts must be KEY VALUE pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Unknown config key: {key}")
            node[leaf] = _coerce(_parse_literal(value), node[leaf])

    # -- serialization --------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return {
            k: (v.to_dict() if isinstance(v, ConfigNode) else v) for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def dump_to_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.dump())


def _parse_literal(s: Any) -> Any:
    if not isinstance(s, str):
        return s
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _coerce(value: Any, old: Any) -> Any:
    """Light type coercion so CLI/yaml scalars match existing types."""
    if old is None or value is None:
        return value
    if isinstance(old, bool) and isinstance(value, int):
        return bool(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(old, list) and isinstance(value, tuple):
        return list(value)
    return value


def _load_yaml_with_base(path: str) -> Dict[str, Any]:
    """Load a YAML file, recursively resolving ``_BASE_`` inheritance."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base_rel = data.pop(_BASE_KEY, None)
    if base_rel is not None:
        base_path = base_rel
        if not os.path.isabs(base_path):
            base_path = os.path.join(os.path.dirname(path), base_path)
        base = _load_yaml_with_base(base_path)
        _deep_update(base, data)
        return base
    return data


def _deep_update(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


# ---------------------------------------------------------------------------
# Default schema — mirrors the reference's ~70 MGNet keys
# (reference: mgnet/config.py:6-138 and detectron2 base keys it relies on)
# plus TPU-native additions (mesh layout, dtype policy).
# ---------------------------------------------------------------------------


def get_default_config() -> ConfigNode:
    c = ConfigNode()

    c.VERSION = 2
    c.OUTPUT_DIR = "./output"
    c.WRITE_OUTPUT_TO_SUBDIR = True
    c.COMMIT_ID = ""
    c.SEED = 0

    # Task toggles (reference: mgnet/config.py:18-22)
    c.WITH_PANOPTIC = True
    c.WITH_DEPTH = True
    c.WITH_UNCERTAINTY = True
    c.VISUALIZE_EVALUATION = False

    # ---------------- model ----------------
    c.MODEL = ConfigNode()
    c.MODEL.META_ARCHITECTURE = "MGNet"
    c.MODEL.WEIGHTS = ""
    c.MODEL.PIXEL_MEAN = [123.675, 116.280, 103.530]
    c.MODEL.PIXEL_STD = [58.395, 57.120, 57.375]
    c.MODEL.SIZE_DIVISIBILITY = 32
    # TPU dtype policy: params fp32, compute bf16 (replaces CUDA AMP).
    c.MODEL.COMPUTE_DTYPE = "bfloat16"
    # Rematerialize backbone blocks (activation-memory/compute trade;
    # XLA-native replacement for the InPlaceABN in-place trick).
    c.MODEL.REMAT = False

    c.MODEL.BACKBONE = ConfigNode()
    c.MODEL.BACKBONE.NAME = "resnet_abn"
    c.MODEL.BACKBONE.FREEZE_AT = 0

    c.MODEL.RESNETS = ConfigNode()
    c.MODEL.RESNETS.DEPTH = 18
    c.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    c.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    c.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]

    c.MODEL.GCM = ConfigNode()
    c.MODEL.GCM.GCM_CHANNELS = 128
    c.MODEL.GCM.INIT_METHOD = "xavier"

    def _decoder_head(num_classes=None):
        h = ConfigNode()
        h.IN_FEATURES = ["res3", "res4", "res5"]
        h.COMMON_STRIDE = 8
        h.ARM_CHANNELS = [128, 128]
        h.REFINE_CHANNELS = [128, 128]
        h.FFM_CHANNELS = 256
        h.HEAD_CHANNELS = 256
        h.INIT_METHOD = "xavier"
        if num_classes is not None:
            h.NUM_CLASSES = num_classes
        return h

    c.MODEL.SEM_SEG_HEAD = _decoder_head(num_classes=20)
    c.MODEL.SEM_SEG_HEAD.NAME = "MGNetSemSegHead"
    c.MODEL.SEM_SEG_HEAD.IGNORE_VALUE = 255
    c.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT = 1.0
    c.MODEL.SEM_SEG_HEAD.LOSS_TYPE = "ohem"
    c.MODEL.SEM_SEG_HEAD.LOSS_TOP_K = 0.2
    c.MODEL.SEM_SEG_HEAD.OHEM_THRESHOLD = 0.7
    c.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = 100000

    c.MODEL.INS_EMBED_HEAD = _decoder_head()
    c.MODEL.INS_EMBED_HEAD.NAME = "MGNetInsEmbedHead"
    c.MODEL.INS_EMBED_HEAD.CENTER_LOSS_WEIGHT = 200.0
    c.MODEL.INS_EMBED_HEAD.OFFSET_LOSS_WEIGHT = 0.01

    c.MODEL.DEPTH_HEAD = _decoder_head()
    c.MODEL.DEPTH_HEAD.NAME = "MGNetSelfSupervisedDepthHead"
    c.MODEL.DEPTH_HEAD.INIT_METHOD = "default"
    c.MODEL.DEPTH_HEAD.MSC_LOSS = True
    c.MODEL.DEPTH_HEAD.SSIM_LOSS_WEIGHT = 0.85
    c.MODEL.DEPTH_HEAD.PHOTOMETRIC_LOSS_WEIGHT = 1.0
    c.MODEL.DEPTH_HEAD.SMOOTHING_LOSS_WEIGHT = 0.001
    c.MODEL.DEPTH_HEAD.AUTOMASK_LOSS = True
    c.MODEL.DEPTH_HEAD.PHOTOMETRIC_REDUCE_OP = "min"
    c.MODEL.DEPTH_HEAD.PADDING_MODE = "zeros"
    # Fused Pallas SSIM+L1 kernel in the photometric loss
    # (ops/pallas/ssim.py). Round 3 shipped a forward-only kernel whose
    # VJP re-ran the XLA formulation (a measured net LOSS, 403.9 vs
    # 393.9 ms/step); round 4 added the fused backward (dx,dy from one
    # VMEM pass) and the pair is a measured WIN: 336.1 vs 362.0 ms/step
    # batch 8 @1024² (BENCH_NOTES §Training r4), so it is now the
    # default. Not an approximation: same f32 statistics recomputed in
    # VMEM, exactness-tested against XLA autodiff (tests/
    # test_pallas_ops.py); auto-falls back to the XLA path off-TPU.
    c.MODEL.DEPTH_HEAD.USE_PALLAS_SSIM = True
    # Use the banded-matmul Pallas warp kernel for the view-synthesis
    # grid_sample (ops/pallas/warp.py) — the train-step floor. Exact for
    # any input (XLA violator correction + full-sampler guard); auto-
    # falls back to the XLA gather formulation off-TPU or for
    # non-conforming shapes.
    c.MODEL.DEPTH_HEAD.USE_PALLAS_WARP = True
    # bf16x2 band split in the warp kernel for the photometric loss
    # (drops the low residual term: one-third less MXU work, measured
    # 32.5 -> 27.4 ms/warp). On the loss's unit-range images: value
    # error <= ~2^-17 * max|image| ≈ 4e-6; spatial-derivative fields
    # (the coord-gradient path) <= ~2e-5 in per-pixel units, i.e.
    # ~1e-4 relative gradient noise — orders below minibatch noise.
    # Set False to force the bf16x3 exact-to-1-ulp split everywhere.
    c.MODEL.DEPTH_HEAD.PALLAS_WARP_FAST = True

    c.MODEL.POST_PROCESSING = ConfigNode()
    c.MODEL.POST_PROCESSING.STUFF_AREA = 2048
    c.MODEL.POST_PROCESSING.CENTER_THRESHOLD = 0.3
    c.MODEL.POST_PROCESSING.NMS_KERNEL = 7
    c.MODEL.POST_PROCESSING.USE_DGC_SCALING = True
    # Fixed max instance count K for the XLA panoptic-fusion formulation
    # (replaces the reference's dynamic torch.nonzero,
    # reference: mgnet/postprocessing/panoptic_post_proc.py:59).
    c.MODEL.POST_PROCESSING.MAX_INSTANCES = 128
    # Use the Pallas VMEM-resident center-argmin kernel for the pixel
    # clustering step of panoptic fusion (ops/pallas/center_argmin.py).
    # Auto-falls back to the chunked XLA argmin on non-TPU backends.
    c.MODEL.POST_PROCESSING.USE_PALLAS_FUSION = True

    # ---------------- solver ----------------
    c.SOLVER = ConfigNode()
    c.SOLVER.OPTIMIZER = "ADAM"
    c.SOLVER.BASE_LR = 0.0001
    c.SOLVER.MAX_ITER = 60000
    c.SOLVER.IMS_PER_BATCH = 12
    # Split each global batch into k sequential micro-batches inside the
    # jitted step (gradients averaged, optimizer applied once): runs the
    # exact batch-12 flagship schedule on chips that fit only batch 12/k
    # (reference trains batch 12 over 4 GPUs; see train/step.py).
    c.SOLVER.GRAD_ACCUM_STEPS = 1
    c.SOLVER.LR_SCHEDULER_NAME = "WarmupPolyLR"
    c.SOLVER.POLY_LR_POWER = 0.9
    c.SOLVER.POLY_LR_CONSTANT_ENDING = 0.0
    c.SOLVER.WARMUP_FACTOR = 0.1
    c.SOLVER.WARMUP_ITERS = 1000
    c.SOLVER.HEAD_LR_FACTOR = 10.0
    c.SOLVER.WEIGHT_DECAY = 0.0
    c.SOLVER.WEIGHT_DECAY_NORM = 0.0
    c.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    c.SOLVER.MOMENTUM = 0.9
    c.SOLVER.CHECKPOINT_PERIOD = 5000
    c.SOLVER.CLIP_GRADIENTS = ConfigNode()
    c.SOLVER.CLIP_GRADIENTS.ENABLED = True
    c.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "full_model"
    c.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 0.01
    c.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0
    c.SOLVER.AMP = ConfigNode()
    c.SOLVER.AMP.ENABLED = True  # maps to bf16 compute on TPU

    # ---------------- input / data ----------------
    c.INPUT = ConfigNode()
    c.INPUT.FORMAT = "RGB"
    c.INPUT.MIN_SIZE_TRAIN = (512, 640, 704, 832, 896, 1024, 1152, 1216, 1344,
                              1408, 1536, 1664, 1728, 1856, 1920, 2048)
    c.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    c.INPUT.MIN_SIZE_TEST = 1024
    c.INPUT.MAX_SIZE_TRAIN = 4096
    c.INPUT.MAX_SIZE_TEST = 2048
    c.INPUT.RANDOM_FLIP = "horizontal"
    c.INPUT.CROP = ConfigNode()
    c.INPUT.CROP.ENABLED = True
    c.INPUT.CROP.TYPE = "absolute"
    c.INPUT.CROP.SIZE = (1024, 1024)
    c.INPUT.CROP.RANDOM_PAD_TO_CROP_SIZE = True
    c.INPUT.COLOR_JITTER = ConfigNode()
    c.INPUT.COLOR_JITTER.ENABLED = True
    c.INPUT.COLOR_JITTER.BRIGHTNESS = 0.2
    c.INPUT.COLOR_JITTER.CONTRAST = 0.2
    c.INPUT.COLOR_JITTER.SATURATION = 0.2
    c.INPUT.COLOR_JITTER.HUE = 0.05
    c.INPUT.GAUSSIAN_SIGMA = 8
    c.INPUT.IGNORE_STUFF_IN_OFFSET = True
    c.INPUT.SMALL_INSTANCE_AREA = 4096
    c.INPUT.SMALL_INSTANCE_WEIGHT = 3
    c.INPUT.IGNORE_CROWD_IN_SEMANTIC = False
    c.INPUT.IGNORED_CATEGORIES_IN_DEPTH = []
    c.INPUT.TRAIN_DATASET_MAPPER = "mgnet_tpu.data.TrainDatasetMapper"
    c.INPUT.TEST_DATASET_MAPPER = "mgnet_tpu.data.TestDatasetMapper"

    c.DATASETS = ConfigNode()
    c.DATASETS.TRAIN = ("cityscapes_fine_scene_seg_train",)
    c.DATASETS.TEST = ("cityscapes_fine_scene_seg_val",)

    c.DATALOADER = ConfigNode()
    c.DATALOADER.NUM_WORKERS = 10
    c.DATALOADER.PREFETCH = 4
    # decode-once cache dir for epoch-repeating PNGs ('' = off); see
    # data/decode_cache.py — pays each decode once, then raw mmap reads
    c.DATALOADER.DECODE_CACHE_DIR = ""

    # ---------------- test ----------------
    c.TEST = ConfigNode()
    c.TEST.EVAL_PERIOD = 5000
    c.TEST.AMP = ConfigNode()
    c.TEST.AMP.ENABLED = True
    c.TEST.MSC_FLIP_EVAL = False
    c.TEST.EVAL_SEMANTIC = True
    c.TEST.EVAL_INSTANCE = False
    c.TEST.MIN_DEPTH = 0.001
    c.TEST.MAX_DEPTH = 80.0
    # evaluation batch size per process (size-bucketed; detectron2
    # inference_on_dataset analog). TTA (MSC_FLIP_EVAL) forces 1.
    c.TEST.IMS_PER_BATCH = 4
    # TTA (MSC_FLIP_EVAL) batch: the flip pair already doubles the device
    # batch and the 2.0x scale octuples pixel count. Measured on one v5e
    # (16 GB HBM) @1024x2048: batch 4 = 164.3 ms/img (the sweet spot;
    # batch 2 = 302 ms/img, batch 8 OOMs at 27.7G — the seven scale-pair
    # logit upsamples are live simultaneously). BENCH_NOTES §TTA r4.
    c.TEST.TTA_IMS_PER_BATCH = 4

    # ---------------- TPU-native: mesh / parallelism ----------------
    c.MESH = ConfigNode()
    # Data parallelism over the "data" axis (reference's DDP analog,
    # reference: tools/train_net.py:241-248). -1 = all available devices.
    c.MESH.DATA = -1
    # Spatial model parallelism axis for very large inputs (off by default).
    c.MESH.MODEL = 1

    return c


def load_config(path: str | None = None, opts: List[str] | None = None) -> ConfigNode:
    cfg = get_default_config()
    if path:
        cfg.merge_from_file(path)
    if opts:
        cfg.merge_from_list(list(opts))
    return cfg
