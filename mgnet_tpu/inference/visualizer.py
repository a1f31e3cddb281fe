"""Visualization of panoptic / instance / depth predictions.

Behavioral parity with reference: mgnet/inference/visualizer.py
(MGNetVisualizer: panoptic overlay with category colors, instance offset
direction heatmaps via a cyclic colormap, depth with a plasma-reversed
colormap clipped at 80 m, point-cloud colors). Implemented headless with
PIL/numpy — no matplotlib/open3d windows (TPU hosts are headless).
"""

from __future__ import annotations

import colorsys
from typing import Optional

import numpy as np

__all__ = ["Visualizer"]


def _plasma_r(x: np.ndarray) -> np.ndarray:
    """Approximate plasma_r colormap over x in [0, 1] -> uint8 RGB."""
    x = 1.0 - np.clip(x, 0.0, 1.0)  # reversed
    # piecewise-linear approximation of matplotlib plasma anchor colors
    anchors = np.array([
        [13, 8, 135], [84, 2, 163], [139, 10, 165], [185, 50, 137],
        [219, 92, 104], [244, 136, 73], [254, 188, 43], [240, 249, 33],
    ], np.float32)
    pos = np.linspace(0, 1, len(anchors))
    r = np.interp(x, pos, anchors[:, 0])
    g = np.interp(x, pos, anchors[:, 1])
    b = np.interp(x, pos, anchors[:, 2])
    return np.stack([r, g, b], -1).astype(np.uint8)


def _twilight(angle: np.ndarray) -> np.ndarray:
    """Cyclic colormap for offset directions: angle in [-pi, pi]."""
    h = (angle + np.pi) / (2 * np.pi)
    flat = h.reshape(-1)
    rgb = np.array([colorsys.hsv_to_rgb(v, 0.8, 0.9) for v in flat])
    return (rgb.reshape(h.shape + (3,)) * 255).astype(np.uint8)


class Visualizer:
    def __init__(self, metadata, label_divisor: int = 1000):
        self.meta = metadata
        self.label_divisor = metadata.get("label_divisor", label_divisor) \
            if hasattr(metadata, "get") else label_divisor
        self.colors = {
            c["trainId"]: c["color"] for c in metadata.categories
        }

    def panoptic_rgb(self, panoptic: np.ndarray,
                     image: Optional[np.ndarray] = None,
                     alpha: float = 0.5) -> np.ndarray:
        h, w = panoptic.shape
        if image is not None and image.shape[:2] != (h, w):
            import cv2

            image = cv2.resize(image, (w, h),
                               interpolation=cv2.INTER_LINEAR)
        out = np.zeros((h, w, 3), np.float32)
        rng = np.random.RandomState(42)
        for pid in np.unique(panoptic):
            mask = panoptic == pid
            if pid < 0:
                color = (0, 0, 0)
            else:
                cls = int(pid) // self.label_divisor
                color = np.asarray(self.colors.get(cls, (128, 128, 128)),
                                   np.float32)
                if pid % self.label_divisor > 0:
                    # jitter instance colors like the reference visualizer
                    color = np.clip(color + rng.uniform(-40, 40, 3), 0, 255)
            out[mask] = color
        if image is not None:
            out = alpha * out + (1 - alpha) * image.astype(np.float32)
        return out.astype(np.uint8)

    def instance_heatmap_rgb(self, center: np.ndarray,
                             offset: np.ndarray) -> np.ndarray:
        """Offset-direction hue + center intensity overlay
        (reference draw_instance_heatmaps)."""
        angle = np.arctan2(offset[..., 0], offset[..., 1])
        rgb = _twilight(angle).astype(np.float32)
        mag = np.clip(center, 0, 1)[..., None]
        return (rgb * (0.3 + 0.7 * mag)).astype(np.uint8)

    def depth_rgb(self, depth: np.ndarray, max_depth: float = 80.0
                  ) -> np.ndarray:
        return _plasma_r(np.clip(depth, 0, max_depth) / max_depth)

    # -- file savers --------------------------------------------------------
    def _save(self, path: str, rgb: np.ndarray):
        from PIL import Image

        Image.fromarray(rgb).save(path)

    def save_panoptic(self, path, image, panoptic):
        self._save(path, self.panoptic_rgb(panoptic, image))

    def save_instance_heatmaps(self, path, center, offset):
        self._save(path, self.instance_heatmap_rgb(center, offset))

    def save_depth(self, path, depth):
        self._save(path, self.depth_rgb(depth))
