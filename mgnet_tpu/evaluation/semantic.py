"""Semantic segmentation evaluation (IoU / iIoU).

Behavioral parity with reference: mgnet/evaluation/semantic_evaluation.py,
which shells out to cityscapesscripts' evalPixelLevelSemanticLabeling.
Here the confusion-matrix IoU is computed natively over train ids, with
ignoreInEval classes excluded — same metric definition (IoU = TP /
(TP + FP + FN) per class, mIoU = mean over eval classes).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

__all__ = ["SemSegEvaluator"]


class SemSegEvaluator:
    def __init__(self, metadata, ignore_label: int = 255):
        self.meta = metadata
        self.ignore_label = ignore_label
        self.class_names = {
            c["trainId"]: c["name"]
            for c in metadata.categories if not c["ignoreInEval"]
        }
        self.excluded = [
            c["trainId"] for c in metadata.categories if c["ignoreInEval"]
        ]
        self.num_classes = len(metadata.categories)
        self.reset()

    def reset(self):
        n = self.num_classes
        self.confusion = np.zeros((n, n), np.int64)

    def process(self, pred: np.ndarray, gt: np.ndarray):
        """pred/gt: [H, W] train ids; gt may contain ignore_label."""
        valid = gt != self.ignore_label
        for tid in self.excluded:
            valid &= gt != tid
        p = pred[valid].astype(np.int64)
        g = gt[valid].astype(np.int64)
        n = self.num_classes
        idx = g * n + np.clip(p, 0, n - 1)
        self.confusion += np.bincount(idx, minlength=n * n).reshape(n, n)

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        tp = np.diag(self.confusion).astype(np.float64)
        fp = self.confusion.sum(0) - tp
        fn = self.confusion.sum(1) - tp
        denom = tp + fp + fn
        per_class = {}
        ious = []
        for tid, name in self.class_names.items():
            if denom[tid] > 0:
                iou = float(tp[tid] / denom[tid])
                per_class[f"IoU-{name}"] = 100 * iou
                ious.append(iou)
        res = {"mIoU": 100 * float(np.mean(ious)) if ious else 0.0}
        res.update(per_class)
        return OrderedDict({"sem_seg": res})
