"""Instance segmentation AP evaluation.

The reference enables detectron2's CityscapesInstanceEvaluator (driving
cityscapesscripts' AP script) behind TEST.EVAL_INSTANCE
(reference: tools/train_net.py:65-66). Neither external package is a
dependency here, so mask AP is implemented natively with the standard
COCO-style protocol: per class and IoU threshold, predictions sorted by
score greedily match the best still-unmatched GT instance in their image;
AP is the area under the interpolated precision-recall curve, averaged
over IoU thresholds 0.50:0.05:0.95 (AP) and reported at 0.5 (AP50).
Matching is exact per threshold (each threshold re-runs the greedy match
over stored IoU lists).
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict
from typing import Dict, List

import numpy as np

__all__ = ["InstanceAPEvaluator", "mask_iou"]

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    if inter == 0:
        return 0.0
    union = a.sum() + b.sum() - inter
    return float(inter / union)


class InstanceAPEvaluator:
    def __init__(self, metadata):
        self.meta = metadata
        self.thing_ids = sorted(
            metadata.thing_dataset_id_to_contiguous_id.values()
        )
        self.class_names = {
            c["trainId"]: c["name"] for c in metadata.categories
            if c["isthing"]
        }
        self.reset()

    def reset(self):
        # per class: list of (score, image_idx, [(gt_local_idx, iou), ...])
        self._preds: Dict[int, List] = defaultdict(list)
        # per class: {image_idx: n_gt}
        self._gts: Dict[int, Dict[int, int]] = defaultdict(dict)
        self._n_images = 0

    def process(self, pred_instances: List[Dict],
                gt_instances: List[Dict]):
        """Args:
            pred_instances: dicts with pred_class / score / mask.
            gt_instances: dicts with category_id (train id) / mask.
        """
        img = self._n_images
        self._n_images += 1

        gt_by_class: Dict[int, List[Dict]] = defaultdict(list)
        for g in gt_instances:
            gt_by_class[g["category_id"]].append(g)
        for cid, gts in gt_by_class.items():
            self._gts[cid][img] = len(gts)

        for p in pred_instances:
            cid = p["pred_class"]
            gts = gt_by_class.get(cid, [])
            ious = [
                (j, mask_iou(p["mask"], g["mask"]))
                for j, g in enumerate(gts)
            ]
            ious = [(j, v) for j, v in ious if v > 0]
            self._preds[cid].append((float(p["score"]), img, ious))

    def _pr_for(self, cid: int, thr: float):
        """Exact greedy matching at one IoU threshold."""
        entries = sorted(self._preds.get(cid, []), key=lambda e: -e[0])
        n_gt = sum(self._gts.get(cid, {}).values())
        if n_gt == 0:
            return None
        matched: Dict[int, set] = defaultdict(set)
        tp = np.zeros(len(entries))
        for i, (score, img, ious) in enumerate(entries):
            best_iou, best_j = thr, -1
            for j, v in ious:
                if j in matched[img]:
                    continue
                if v >= best_iou:
                    best_iou, best_j = v, j
            if best_j >= 0:
                matched[img].add(best_j)
                tp[i] = 1.0
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(1.0 - tp)
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
        return recall, precision

    def _ap_for(self, cid: int, thr: float) -> float:
        pr = self._pr_for(cid, thr)
        if pr is None:
            return float("nan")
        recall, precision = pr
        # interpolated AP (precision envelope over recall)
        mrec = np.concatenate([[0.0], recall])
        mpre = np.concatenate([[0.0], precision])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        per_class_ap, per_class_ap50 = {}, {}
        for cid in self.thing_ids:
            if sum(self._gts.get(cid, {}).values()) == 0:
                continue
            aps = [self._ap_for(cid, t) for t in IOU_THRESHOLDS]
            per_class_ap[cid] = float(np.nanmean(aps))
            per_class_ap50[cid] = self._ap_for(cid, 0.5)
        res = OrderedDict()
        if per_class_ap:
            res["AP"] = 100 * float(np.mean(list(per_class_ap.values())))
            res["AP50"] = 100 * float(np.mean(list(per_class_ap50.values())))
            for cid, ap in per_class_ap.items():
                res[f"AP-{self.class_names.get(cid, cid)}"] = 100 * ap
        else:
            res["AP"] = 0.0
            res["AP50"] = 0.0
        return OrderedDict({"instances": res})
