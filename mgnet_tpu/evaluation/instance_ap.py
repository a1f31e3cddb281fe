"""Instance segmentation AP evaluation.

The reference enables detectron2's CityscapesInstanceEvaluator (driving
cityscapesscripts' AP script) behind TEST.EVAL_INSTANCE
(reference: tools/train_net.py:65-66). Neither external package is a
dependency here, so mask AP is implemented natively: per class,
predictions sorted by score are greedily matched to unmatched GT
instances by mask IoU; AP is the area under the interpolated
precision-recall curve, averaged over IoU thresholds 0.50:0.05:0.95 (AP)
and reported at 0.5 (AP50).

Note: matching is performed once (at IoU 0.5) and each prediction's best
IoU is thresholded afterwards — a standard single-pass approximation of
the per-threshold rematch protocol; exact per-threshold matching can be
swapped in later without changing the interface.
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict
from typing import Dict, List, Sequence

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
        # per class: list of (score, iou_with_matched_gt or 0) + gt counts
        self._preds: Dict[int, List] = defaultdict(list)
        self._gt_count: Dict[int, int] = defaultdict(int)

    def process(self, pred_instances: List[Dict],
                gt_instances: List[Dict]):
        """Args:
            pred_instances: dicts with pred_class / score / mask.
            gt_instances: dicts with category_id (train id) / mask.
        """
        gt_by_class: Dict[int, List[Dict]] = defaultdict(list)
        for g in gt_instances:
            gt_by_class[g["category_id"]].append(g)
            self._gt_count[g["category_id"]] += 1

        for cid in self.thing_ids:
            preds = sorted(
                [p for p in pred_instances if p["pred_class"] == cid],
                key=lambda p: -p["score"],
            )
            gts = gt_by_class.get(cid, [])
            matched = np.zeros(len(gts), bool)
            for p in preds:
                best_iou, best_j = 0.0, -1
                for j, g in enumerate(gts):
                    if matched[j]:
                        continue
                    iou = mask_iou(p["mask"], g["mask"])
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                # record best achievable IoU (threshold applied at eval)
                if best_j >= 0 and best_iou >= 0.5:
                    matched[best_j] = True
                self._preds[cid].append((float(p["score"]), best_iou))

    def _ap_for(self, cid: int, thr: float) -> float:
        entries = sorted(self._preds.get(cid, []), key=lambda e: -e[0])
        n_gt = self._gt_count.get(cid, 0)
        if n_gt == 0:
            return float("nan")
        tp = np.array([1.0 if iou >= thr else 0.0 for _, iou in entries])
        fp = 1.0 - tp
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
        # standard interpolated AP (precision envelope)
        mrec = np.concatenate([[0.0], recall, [recall[-1] if len(recall)
                                              else 0.0]])
        mpre = np.concatenate([[0.0], precision, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        per_class_ap, per_class_ap50 = {}, {}
        for cid in self.thing_ids:
            if self._gt_count.get(cid, 0) == 0:
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
