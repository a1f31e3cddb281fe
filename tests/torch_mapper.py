"""Transcription of the reference TRAIN DATA PIPELINE, for golden parity
testing of mgnet_tpu.data.{transforms,mapper,target_generator}.

TEST FIXTURE, not product code (companion to torch_losses.py /
torch_mirror.py): a faithful re-statement of the reference's mapper chain
so the numpy pipeline can be compared per output key on fixed PNG
fixtures with pinned augmentation parameters. Semantics follow (cited per
item):

* reference mgnet/data/dataset_mapper.py:129-259 (MGNetTrainDatasetMapper
  __call__ order: read -> shared geometric augs on all frames + panoptic
  RGB -> color jitter separately keeping *_orig -> rgb2id -> targets ->
  reprojection mask -> camera co-augmentation) and :262-307 (test mapper)
* reference mgnet/data/transform.py:89-133 (resize-shortest-edge with
  camera co-aug; detectron2 ResizeTransform's uint8 path is PIL
  Image.resize — BILINEAR for images, NEAREST for segmentation)
* reference mgnet/data/transform.py:17-87 (random pad with the (3,2)
  np.pad constant, seg pad value, reprojection-mask border zeroing)
* reference mgnet/data/transform.py:136-225 (ColorJitterTransform:
  torchvision-functional ops in a sampled order; torchvision's PIL
  backend is ImageEnhance.Brightness/Contrast/Color and an HSV roundtrip
  with a uint8-wrapped hue shift — replicated here with PIL directly
  since torchvision is not installed in this container)
* detectron2 CropTransform / HFlipTransform / fvcore PadTransform
  (slice crop, coords x -> w - x flip, np.pad) as composed by
  dataset_mapper.py:72-90
* reference mgnet/data/target_generator.py:8-158
  (PanopticDeepLabTargetGenerator)
* panopticapi rgb2id (R + 256 G + 256^2 B)

Transforms take PINNED parameters (no RNG) so both pipelines can be
driven with identical augmentation draws.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import torch
from PIL import Image, ImageEnhance


# ---------------------------------------------------------------------------
# Geometric transforms (detectron2/fvcore semantics)
# ---------------------------------------------------------------------------


class RefResizeTransform:
    """detectron2 ResizeTransform (uint8 -> PIL resize) + the reference's
    camera co-aug methods (transform.py:122-133)."""

    def __init__(self, h, w, new_h, new_w):
        self.h, self.w, self.new_h, self.new_w = h, w, new_h, new_w

    def apply_image(self, img, interp=Image.BILINEAR):
        assert img.dtype == np.uint8
        pil = Image.fromarray(img)
        return np.asarray(pil.resize((self.new_w, self.new_h), interp))

    def apply_segmentation(self, seg):
        return self.apply_image(seg, interp=Image.NEAREST)

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] = (coords[:, 0] + 0.5) * (self.new_w * 1.0 / self.w) - 0.5
        coords[:, 1] = (coords[:, 1] + 0.5) * (self.new_h * 1.0 / self.h) - 0.5
        return coords

    def apply_focal(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] = coords[:, 0] * (self.new_w * 1.0 / self.w)
        coords[:, 1] = coords[:, 1] * (self.new_h * 1.0 / self.h)
        return coords


class RefCropTransform:
    """detectron2 CropTransform: slice + coord shift."""

    def __init__(self, x0, y0, w, h):
        self.x0, self.y0, self.cw, self.ch = x0, y0, w, h

    def apply_image(self, img):
        return img[self.y0:self.y0 + self.ch, self.x0:self.x0 + self.cw]

    apply_segmentation = apply_image

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class RefHFlipTransform:
    """detectron2 HFlipTransform: x -> width - x."""

    def __init__(self, width):
        self.width = width

    def apply_image(self, img):
        return np.flip(img, axis=1)

    apply_segmentation = apply_image

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords


class RefPadTransform:
    """fvcore PadTransform + the reference's seg/reprojection additions
    (transform.py:46-87). ``pad_value`` is exactly what the reference
    passes: np.repeat(expand_dims(PIXEL_MEAN, 1), 2, axis=1) — which
    np.pad reads as one constant per AXIS."""

    def __init__(self, x0, y0, x1, y1, pad_value, pad_value_seg):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.pad_value = pad_value
        self.pad_value_seg = pad_value_seg

    def apply_image(self, img):
        padding = ((self.y0, self.y1), (self.x0, self.x1), (0, 0))
        return np.pad(img, padding, mode="constant",
                      constant_values=self.pad_value)

    def apply_segmentation(self, img):
        if img.ndim == 3:
            padding = ((self.y0, self.y1), (self.x0, self.x1), (0, 0))
        else:
            padding = ((self.y0, self.y1), (self.x0, self.x1))
        return np.pad(img, padding, mode="constant",
                      constant_values=self.pad_value_seg)

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def apply_reprojection_mask(self, reprojection_mask):
        if self.x0 == 0 and self.x1 == 0 and self.y0 == 0 and self.y1 == 0:
            return reprojection_mask
        mask = np.zeros_like(reprojection_mask, dtype=bool)
        mask[self.y0:mask.shape[0] - self.y1,
             self.x0:mask.shape[1] - self.x1] = 1
        return reprojection_mask & mask


class RefTransformList:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __iter__(self):
        return iter(self.transforms)

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_segmentation(self, seg):
        for t in self.transforms:
            seg = t.apply_segmentation(seg)
        return seg

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords


# ---------------------------------------------------------------------------
# Color jitter (torchvision F_pil ops, via PIL directly)
# ---------------------------------------------------------------------------


class RefColorJitterTransform:
    """transform.py:190-221: ops in ``fn_idx`` order on a PIL image.
    torchvision's PIL backend: adjust_brightness/contrast/saturation are
    ImageEnhance.Brightness/Contrast/Color; adjust_hue converts to HSV,
    adds np.uint8(hue_factor * 255) with uint8 wraparound (numpy 1.x
    trunc-then-wrap for negatives), and converts back."""

    def __init__(self, fn_idx, brightness_factor, contrast_factor,
                 saturation_factor, hue_factor):
        self.fn_idx = fn_idx
        self.brightness_factor = brightness_factor
        self.contrast_factor = contrast_factor
        self.saturation_factor = saturation_factor
        self.hue_factor = hue_factor

    @staticmethod
    def _adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
        h, s, v = img.convert("HSV").split()
        np_h = np.array(h, dtype=np.int32)
        shift = int(np.trunc(np.float64(hue_factor) * 255.0)) % 256
        np_h = ((np_h + shift) % 256).astype(np.uint8)
        h = Image.fromarray(np_h, "L")
        return Image.merge("HSV", (h, s, v)).convert("RGB")

    def apply_image(self, img):
        pil = Image.fromarray(img)
        for fn_id in self.fn_idx:
            if fn_id == 0 and self.brightness_factor is not None:
                pil = ImageEnhance.Brightness(pil).enhance(
                    self.brightness_factor)
            elif fn_id == 1 and self.contrast_factor is not None:
                pil = ImageEnhance.Contrast(pil).enhance(
                    self.contrast_factor)
            elif fn_id == 2 and self.saturation_factor is not None:
                pil = ImageEnhance.Color(pil).enhance(
                    self.saturation_factor)
            elif fn_id == 3 and self.hue_factor is not None:
                pil = self._adjust_hue(pil, self.hue_factor)
        return np.asarray(pil)


# ---------------------------------------------------------------------------
# Target generator (target_generator.py:8-158)
# ---------------------------------------------------------------------------


def ref_rgb2id(color: np.ndarray) -> np.ndarray:
    if color.dtype == np.uint8:
        color = color.astype(np.uint32)
    return (color[:, :, 0] + 256 * color[:, :, 1]
            + 256 * 256 * color[:, :, 2])


class RefPanopticDeepLabTargetGenerator:
    def __init__(self, ignore_label, thing_ids, sigma=8,
                 ignore_stuff_in_offset=False, small_instance_area=0,
                 small_instance_weight=1, ignore_crowd_in_semantic=False):
        self.ignore_label = ignore_label
        self.thing_ids = sorted(list(thing_ids))
        self.ignore_stuff_in_offset = ignore_stuff_in_offset
        self.small_instance_area = small_instance_area
        self.small_instance_weight = small_instance_weight
        self.ignore_crowd_in_semantic = ignore_crowd_in_semantic
        self.sigma = sigma
        size = 6 * sigma + 3
        x = np.arange(0, size, 1, float)
        y = x[:, np.newaxis]
        x0 = y0 = 3 * sigma + 1
        self.g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))

    def __call__(self, panoptic, segments_info):
        height, width = panoptic.shape[0], panoptic.shape[1]
        semantic = np.zeros_like(panoptic, dtype=np.uint8) + self.ignore_label
        center = np.zeros((height, width), dtype=np.float32)
        center_pts = []
        offset = np.zeros((2, height, width), dtype=np.float32)
        y_coord, x_coord = np.meshgrid(
            np.arange(height, dtype=np.float32),
            np.arange(width, dtype=np.float32), indexing="ij")
        semantic_weights = np.ones_like(panoptic, dtype=np.uint8)
        center_weights = np.zeros_like(panoptic, dtype=np.uint8)
        offset_weights = np.zeros_like(panoptic, dtype=np.uint8)
        for seg in segments_info:
            cat_id = seg["category_id"]
            if not (self.ignore_crowd_in_semantic and seg["iscrowd"]):
                semantic[panoptic == seg["id"]] = cat_id
            if not seg["iscrowd"]:
                if not self.ignore_stuff_in_offset or cat_id in self.thing_ids:
                    offset_weights[panoptic == seg["id"]] = 1
                    center_weights[panoptic == seg["id"]] = 1
            if cat_id in self.thing_ids and not seg["iscrowd"]:
                mask_index = np.where(panoptic == seg["id"])
                if len(mask_index[0]) == 0:
                    continue
                ins_area = len(mask_index[0])
                if ins_area < self.small_instance_area:
                    semantic_weights[panoptic == seg["id"]] = \
                        self.small_instance_weight
                center_y = np.mean(mask_index[0])
                center_x = np.mean(mask_index[1])
                center_pts.append([center_y, center_x])
                y, x = int(np.round(center_y)), int(np.round(center_x))
                sigma = self.sigma
                ul = (int(np.round(x - 3 * sigma - 1)),
                      int(np.round(y - 3 * sigma - 1)))
                br = (int(np.round(x + 3 * sigma + 2)),
                      int(np.round(y + 3 * sigma + 2)))
                gx0, gx1 = max(0, -ul[0]), min(br[0], width) - ul[0]
                gy0, gy1 = max(0, -ul[1]), min(br[1], height) - ul[1]
                cx0, cx1 = max(0, ul[0]), min(br[0], width)
                cy0, cy1 = max(0, ul[1]), min(br[1], height)
                center[cy0:cy1, cx0:cx1] = np.maximum(
                    center[cy0:cy1, cx0:cx1], self.g[gy0:gy1, gx0:gx1])
                offset[0][mask_index] = center_y - y_coord[mask_index]
                offset[1][mask_index] = center_x - x_coord[mask_index]
        center_weights[semantic < self.thing_ids[0]] = 1
        center_weights = center_weights[None]
        offset_weights = offset_weights[None]
        return dict(
            sem_seg=torch.as_tensor(semantic.astype("long")),
            center=torch.as_tensor(center.astype(np.float32)),
            center_points=center_pts,
            offset=torch.as_tensor(offset.astype(np.float32)),
            sem_seg_weights=torch.as_tensor(
                semantic_weights.astype(np.float32)),
            center_weights=torch.as_tensor(
                center_weights.astype(np.float32)),
            offset_weights=torch.as_tensor(
                offset_weights.astype(np.float32)),
        )


# ---------------------------------------------------------------------------
# Train mapper (dataset_mapper.py:129-259) with pinned transforms
# ---------------------------------------------------------------------------


def ref_read_image(path: str) -> np.ndarray:
    """detectron2 utils.read_image(format='RGB') on PNG fixtures."""
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


class RefTrainMapper:
    def __init__(self, transforms: Sequence, color_jitter: Optional[
            RefColorJitterTransform], target_gen, depth_ignore_ids:
            List[int], with_depth: bool = True):
        self.tfl = RefTransformList(transforms)
        self.color_jitter = color_jitter
        self.target_gen = target_gen
        self.depth_ignore_ids = depth_ignore_ids
        self.with_depth = with_depth

    def __call__(self, dataset_dict: Dict) -> Dict:
        d = dict(dataset_dict)
        image_orig = ref_read_image(d["file_name"])
        pan_seg_gt = ref_read_image(d["pan_seg_file_name"])

        image_orig = self.tfl.apply_image(image_orig)
        pan_seg_gt = self.tfl.apply_segmentation(pan_seg_gt)

        if self.color_jitter is not None:
            image = self.color_jitter.apply_image(image_orig)
        else:
            image = image_orig

        d["image"] = torch.as_tensor(
            np.ascontiguousarray(image.transpose([2, 0, 1])))

        pan_seg_gt = ref_rgb2id(pan_seg_gt)
        d.update(self.target_gen(pan_seg_gt, d["segments_info"]))

        if self.with_depth:
            image_prev_orig = self.tfl.apply_image(
                ref_read_image(d["prev_img_file_name"]))
            image_next_orig = self.tfl.apply_image(
                ref_read_image(d["next_img_file_name"]))
            if self.color_jitter is not None:
                image_prev = self.color_jitter.apply_image(image_prev_orig)
                image_next = self.color_jitter.apply_image(image_next_orig)
            else:
                image_prev = image_prev_orig
                image_next = image_next_orig
            for k, v in (("image_orig", image_orig),
                         ("image_prev_orig", image_prev_orig),
                         ("image_prev", image_prev),
                         ("image_next_orig", image_next_orig),
                         ("image_next", image_next)):
                d[k] = torch.as_tensor(
                    np.ascontiguousarray(v.transpose([2, 0, 1])))

            reprojection_mask = np.ones_like(pan_seg_gt, dtype=bool)
            for tid in self.depth_ignore_ids:
                reprojection_mask[d["sem_seg"].numpy() == tid] = 0

            optical_center = np.array(
                [[d["calibration_info"]["intrinsic"]["u0"],
                  d["calibration_info"]["intrinsic"]["v0"]]]).reshape(1, 2)
            focal_length = np.array(
                [[d["calibration_info"]["intrinsic"]["fx"],
                  d["calibration_info"]["intrinsic"]["fy"]]]).reshape(1, 2)

            optical_center = self.tfl.apply_coords(optical_center)
            for tf in self.tfl:
                if hasattr(tf, "apply_reprojection_mask"):
                    reprojection_mask = tf.apply_reprojection_mask(
                        reprojection_mask)
                if hasattr(tf, "apply_focal"):
                    focal_length = tf.apply_focal(focal_length)

            camera_matrix = np.array(
                [[focal_length[0, 0], 0, optical_center[0, 0], 0],
                 [0, focal_length[0, 1], optical_center[0, 1], 0],
                 [0, 0, 1, 0],
                 [0, 0, 0, 1]], dtype=np.float32)
            d["camera_matrix"] = torch.as_tensor(camera_matrix)
            d["reprojection_mask"] = torch.as_tensor(
                reprojection_mask.astype(bool))
            d["camera_height"] = torch.tensor(
                [d["calibration_info"]["extrinsic"]["z"]])
        return d
