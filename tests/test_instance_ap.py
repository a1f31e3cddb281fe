"""Native instance AP evaluator tests."""

import numpy as np

from mgnet_tpu.data.catalog import Metadata
from mgnet_tpu.data.categories import (
    CITYSCAPES_SCENE_SEG_CATEGORIES,
    build_meta,
)
from mgnet_tpu.evaluation.instance_ap import InstanceAPEvaluator, mask_iou


def _meta():
    return Metadata(name="t").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )


def box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_iou():
    a = box_mask(10, 10, 0, 5, 0, 10)
    b = box_mask(10, 10, 0, 10, 0, 10)
    assert np.isclose(mask_iou(a, b), 0.5)


def test_perfect_predictions():
    ev = InstanceAPEvaluator(_meta())
    m1 = box_mask(32, 32, 0, 10, 0, 10)
    m2 = box_mask(32, 32, 20, 30, 20, 30)
    preds = [dict(pred_class=12, score=0.9, mask=m1),
             dict(pred_class=12, score=0.8, mask=m2)]
    gts = [dict(category_id=12, mask=m1), dict(category_id=12, mask=m2)]
    ev.process(preds, gts)
    res = ev.evaluate()["instances"]
    assert np.isclose(res["AP"], 100.0)
    assert np.isclose(res["AP50"], 100.0)


def test_false_positive_lowers_ap():
    ev = InstanceAPEvaluator(_meta())
    m1 = box_mask(32, 32, 0, 10, 0, 10)
    fp = box_mask(32, 32, 15, 18, 15, 18)
    preds = [dict(pred_class=12, score=0.95, mask=fp),  # FP ranked first
             dict(pred_class=12, score=0.8, mask=m1)]
    ev.process(preds, [dict(category_id=12, mask=m1)])
    res = ev.evaluate()["instances"]
    assert res["AP50"] < 100.0
    assert res["AP50"] >= 45.0  # one TP at precision 1/2


def test_missed_gt():
    ev = InstanceAPEvaluator(_meta())
    m1 = box_mask(32, 32, 0, 10, 0, 10)
    m2 = box_mask(32, 32, 20, 30, 20, 30)
    preds = [dict(pred_class=12, score=0.9, mask=m1)]
    ev.process(preds, [dict(category_id=12, mask=m1),
                       dict(category_id=12, mask=m2)])
    res = ev.evaluate()["instances"]
    assert np.isclose(res["AP50"], 50.0)  # recall capped at 0.5


def test_multi_image_matching():
    """Matching is per image — a pred in image 0 cannot claim image 1's GT."""
    ev = InstanceAPEvaluator(_meta())
    m = box_mask(16, 16, 0, 8, 0, 8)
    # image 0: one pred matching its own gt
    ev.process([dict(pred_class=12, score=0.9, mask=m)],
               [dict(category_id=12, mask=m)])
    # image 1: one gt, no prediction
    ev.process([], [dict(category_id=12, mask=m)])
    res = ev.evaluate()["instances"]
    assert np.isclose(res["AP50"], 50.0)


def test_per_threshold_exactness():
    """A pred with IoU 0.6 counts as TP at thr 0.5/0.55/0.6 only."""
    ev = InstanceAPEvaluator(_meta())
    gt = box_mask(20, 20, 0, 10, 0, 10)       # 100 px
    pred = box_mask(20, 20, 0, 10, 0, 15)     # 150 px, inter 100
    # iou = 100 / 150 = 0.6667
    ev.process([dict(pred_class=12, score=0.9, mask=pred)],
               [dict(category_id=12, mask=gt)])
    assert np.isclose(ev._ap_for(12, 0.5), 1.0)
    assert np.isclose(ev._ap_for(12, 0.65), 1.0)
    assert np.isclose(ev._ap_for(12, 0.70), 0.0)
