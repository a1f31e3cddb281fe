"""Geometric + photometric augmentations with camera-matrix co-augmentation.

Behavioral parity with reference: mgnet/data/transform.py and the
detectron2 transforms it builds on:
* resize-shortest-edge with 'choice' sampling and max-size cap; focal
  lengths scale with the resize, optical center uses the pixel-center
  (+0.5) convention (transform.py:89-133)
* random absolute crop (optical center shifts by the crop origin)
* random pad to crop size: image padded with the pixel mean, labels with a
  seg pad value, reprojection mask zeroed on padding (transform.py:17-87)
* horizontal flip (x -> w - x for the optical center, matching detectron2
  HFlipTransform)
* color jitter with torchvision semantics: random order of
  brightness/contrast/saturation/hue with factors sampled once and
  re-applicable to the context frames (transform.py:136-225)

Fresh numpy/cv2 implementation — deterministic given a numpy Generator, so
the data pipeline is reproducible from explicit seeds (SURVEY.md §5
determinism note).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

__all__ = [
    "Transform",
    "ResizeTransform",
    "CropTransform",
    "HFlipTransform",
    "PadTransform",
    "ColorJitterTransform",
    "TransformList",
    "build_train_transform_sampler",
    "sample_color_jitter",
]


class Transform:
    """Deterministic transform applied consistently to image/seg/coords."""

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        return img

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        return seg

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        return coords

    def apply_focal(self, focal: np.ndarray) -> np.ndarray:
        return focal

    def apply_reprojection_mask(self, mask: np.ndarray) -> np.ndarray:
        return mask


class TransformList(Transform):
    def __init__(self, transforms: Sequence[Transform]):
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

    def apply_focal(self, focal):
        for t in self.transforms:
            focal = t.apply_focal(focal)
        return focal

    def apply_reprojection_mask(self, mask):
        for t in self.transforms:
            mask = t.apply_reprojection_mask(mask)
        return mask


@dataclass
class ResizeTransform(Transform):
    h: int
    w: int
    new_h: int
    new_w: int

    def apply_image(self, img):
        if (self.h, self.w) == (self.new_h, self.new_w):
            return img
        return cv2.resize(
            img, (self.new_w, self.new_h), interpolation=cv2.INTER_LINEAR
        )

    def apply_segmentation(self, seg):
        if (self.h, self.w) == (self.new_h, self.new_w):
            return seg
        return cv2.resize(
            seg, (self.new_w, self.new_h), interpolation=cv2.INTER_NEAREST
        )

    def apply_coords(self, coords):
        # pixel-center convention for the optical center
        # (reference transform.py:122-127)
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] = (coords[:, 0] + 0.5) * (self.new_w / self.w) - 0.5
        coords[:, 1] = (coords[:, 1] + 0.5) * (self.new_h / self.h) - 0.5
        return coords

    def apply_focal(self, focal):
        focal = np.asarray(focal, np.float64).copy()
        focal[:, 0] *= self.new_w / self.w
        focal[:, 1] *= self.new_h / self.h
        return focal


@dataclass
class CropTransform(Transform):
    x0: int
    y0: int
    w: int
    h: int

    def apply_image(self, img):
        return img[self.y0:self.y0 + self.h, self.x0:self.x0 + self.w]

    apply_segmentation = apply_image

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


@dataclass
class HFlipTransform(Transform):
    width: int

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    apply_segmentation = apply_image

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords


@dataclass
class PadTransform(Transform):
    x0: int
    y0: int
    x1: int
    y1: int
    pad_value: Tuple[float, ...] = (0.0, 0.0, 0.0)
    pad_value_seg: float = 0.0

    @property
    def _any(self):
        return self.x0 or self.x1 or self.y0 or self.y1

    def apply_image(self, img):
        if not self._any:
            return img
        out = np.pad(
            img, ((self.y0, self.y1), (self.x0, self.x1), (0, 0)),
            mode="constant",
        )
        pv = np.asarray(self.pad_value, img.dtype)
        if self.y0:
            out[: self.y0] = pv
        if self.y1:
            out[out.shape[0] - self.y1:] = pv
        if self.x0:
            out[:, : self.x0] = pv
        if self.x1:
            out[:, out.shape[1] - self.x1:] = pv
        return out

    def apply_segmentation(self, seg):
        if not self._any:
            return seg
        pads = ((self.y0, self.y1), (self.x0, self.x1))
        if seg.ndim == 3:
            pads = pads + ((0, 0),)
        return np.pad(
            seg, pads, mode="constant", constant_values=self.pad_value_seg
        )

    def apply_coords(self, coords):
        coords = np.asarray(coords, np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def apply_reprojection_mask(self, mask):
        """Zero padded borders of an already padded-size mask.

        Parity: reference transform.py:80-87 — the mask is built from the
        post-augmentation label and only the pad borders are invalidated.
        """
        if not self._any:
            return mask
        keep = np.zeros_like(mask, dtype=bool)
        keep[self.y0:mask.shape[0] - self.y1,
             self.x0:mask.shape[1] - self.x1] = True
        return mask & keep


# ---------------------------------------------------------------------------
# Color jitter (torchvision-functional semantics over uint8 RGB numpy)
# ---------------------------------------------------------------------------


def _blend(img1: np.ndarray, img2: np.ndarray, ratio: float) -> np.ndarray:
    out = ratio * img1.astype(np.float32) + (1.0 - ratio) * img2.astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


def _value_lut(ratio: float, other: float) -> np.ndarray:
    """256-entry uint8 LUT for blend-with-a-scalar: per-VALUE ops, so
    applying the LUT matches the per-pixel f32 blend (bit-identical for
    brightness; contrast's f32 mean can shift boundary values 1 LSB) while
    touching each pixel once (the f32 chain cost ~0.15 s/frame at
    flagship resolution — the mapper hot spot, tools note in
    BENCH_NOTES §Data pipeline)."""
    v = np.arange(256, dtype=np.float32)
    out = ratio * v + (1.0 - ratio) * np.float32(other)
    return np.clip(out, 0, 255).astype(np.uint8)


def _adjust_brightness(img, factor):
    if img.dtype != np.uint8:  # LUT indexing assumes uint8 values
        return np.clip(factor * img.astype(np.float32), 0, 255).astype(
            img.dtype)
    return _value_lut(factor, 0.0)[img]


def _grayscale(img):
    # ITU-R 601-2 luma (torchvision rgb_to_grayscale); f32 like the
    # torchvision tensor path (a python-float multiply on the uint8
    # channel would silently promote the whole pass to float64)
    img = img.astype(np.float32, copy=False)
    g = (np.float32(0.299) * img[..., 0]
         + np.float32(0.587) * img[..., 1]
         + np.float32(0.114) * img[..., 2])
    return g


def _adjust_contrast(img, factor):
    # mean accumulates in f32 (not torchvision's f64) — boundary values can
    # differ from the exact per-pixel blend by 1 LSB
    mean = float(_grayscale(img).mean())
    if img.dtype != np.uint8:  # LUT indexing assumes uint8 values
        return np.clip(
            factor * img.astype(np.float32) + (1.0 - factor) * mean,
            0, 255).astype(img.dtype)
    return _value_lut(factor, mean)[img]


def _adjust_saturation(img, factor):
    # ratio*img + (1-ratio)*gray per pixel; scale gray [H,W] once and
    # broadcast-add instead of materializing a [H,W,3] gray copy
    gray_scaled = (1.0 - factor) * _grayscale(img)
    out = factor * img.astype(np.float32) + gray_scaled[..., None]
    return np.clip(out, 0, 255).astype(np.uint8)


def _adjust_hue(img, factor):
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    # OpenCV uint8 hue range is [0, 180)
    h = hsv[..., 0].astype(np.int32)
    h = (h + int(round(factor * 180))) % 180
    hsv[..., 0] = h.astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


@dataclass
class ColorJitterTransform(Transform):
    """Re-applicable jitter: the same sampled factors/order are used for the
    current and context frames (reference dataset_mapper.py:162-208)."""

    fn_order: Tuple[int, ...] = (0, 1, 2, 3)
    brightness: Optional[float] = None
    contrast: Optional[float] = None
    saturation: Optional[float] = None
    hue: Optional[float] = None

    def apply_image(self, img):
        out = img
        for fn in self.fn_order:
            if fn == 0 and self.brightness is not None:
                out = _adjust_brightness(out, self.brightness)
            elif fn == 1 and self.contrast is not None:
                out = _adjust_contrast(out, self.contrast)
            elif fn == 2 and self.saturation is not None:
                out = _adjust_saturation(out, self.saturation)
            elif fn == 3 and self.hue is not None:
                out = _adjust_hue(out, self.hue)
        return out


def sample_color_jitter(rng: np.random.Generator, brightness=0.2, contrast=0.2,
                        saturation=0.2, hue=0.05) -> ColorJitterTransform:
    def rng_range(v, center=1.0):
        lo, hi = max(0.0, center - v), center + v
        return float(rng.uniform(lo, hi))

    return ColorJitterTransform(
        fn_order=tuple(rng.permutation(4).tolist()),
        brightness=rng_range(brightness) if brightness else None,
        contrast=rng_range(contrast) if contrast else None,
        saturation=rng_range(saturation) if saturation else None,
        hue=float(rng.uniform(-hue, hue)) if hue else None,
    )


def resize_shortest_edge(h: int, w: int, short_sizes: Sequence[int],
                         max_size: int, rng: np.random.Generator
                         ) -> ResizeTransform:
    """Sample a shortest-edge resize ('choice' sampling, max-size cap).

    Parity: reference transform.py:96-119 / detectron2 ResizeShortestEdge.
    """
    size = int(rng.choice(list(short_sizes)))
    if size == 0:
        return ResizeTransform(h, w, h, w)
    scale = size / min(h, w)
    if h < w:
        newh, neww = size, scale * w
    else:
        newh, neww = scale * h, size
    if max(newh, neww) > max_size:
        s = max_size / max(newh, neww)
        newh, neww = newh * s, neww * s
    return ResizeTransform(h, w, int(newh + 0.5), int(neww + 0.5))


def build_train_transform_sampler(cfg):
    """Return fn(rng, image_shape) -> TransformList of geometric transforms.

    Matches the reference augmentation chain order: resize -> random crop ->
    random pad to crop size -> random hflip (dataset_mapper.py:72-90).
    """
    inp = cfg.INPUT
    pixel_mean = tuple(cfg.MODEL.PIXEL_MEAN)

    def sampler(rng: np.random.Generator, shape) -> TransformList:
        h, w = shape[:2]
        tfs: List[Transform] = []
        t = resize_shortest_edge(
            h, w, inp.MIN_SIZE_TRAIN, inp.MAX_SIZE_TRAIN, rng
        )
        tfs.append(t)
        cur_h, cur_w = t.new_h, t.new_w
        if inp.CROP.ENABLED:
            ch, cw = inp.CROP.SIZE
            crop_h, crop_w = min(ch, cur_h), min(cw, cur_w)
            y0 = int(rng.integers(0, cur_h - crop_h + 1))
            x0 = int(rng.integers(0, cur_w - crop_w + 1))
            tfs.append(CropTransform(x0, y0, crop_w, crop_h))
            cur_h, cur_w = crop_h, crop_w
            if inp.CROP.RANDOM_PAD_TO_CROP_SIZE:
                pad_h, pad_w = max(0, ch - cur_h), max(0, cw - cur_w)
                py0 = int(rng.integers(0, pad_h + 1))
                px0 = int(rng.integers(0, pad_w + 1))
                tfs.append(PadTransform(
                    px0, py0, pad_w - px0, pad_h - py0,
                    pad_value=pixel_mean, pad_value_seg=0,
                ))
                cur_h, cur_w = ch, cw
        if cfg.INPUT.RANDOM_FLIP == "horizontal" and rng.random() < 0.5:
            tfs.append(HFlipTransform(cur_w))
        return TransformList(tfs)

    return sampler
