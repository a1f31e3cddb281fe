"""Evaluation tests: PQ on hand-built grids, depth metric formulas, IoU."""

import numpy as np

from mgnet_tpu.evaluation import (
    DepthEvaluator,
    PanopticEvaluator,
    SemSegEvaluator,
    PQStat,
    depth_metrics,
    pq_compute_single_image,
    summarize_pq,
)
from mgnet_tpu.data.categories import (
    CITYSCAPES_SCENE_SEG_CATEGORIES,
    build_meta,
)
from mgnet_tpu.data.catalog import Metadata


CATS = {
    1: {"id": 1, "isthing": 0, "name": "stuffA"},
    2: {"id": 2, "isthing": 1, "name": "thingB"},
}


def seg(i, cat, crowd=0):
    return {"id": i, "category_id": cat, "iscrowd": crowd}


class TestPQ:
    def test_perfect_match(self):
        gt = np.ones((10, 10), np.int64) * 10
        pred = gt.copy()
        stat = pq_compute_single_image(
            gt, pred, [seg(10, 1)], [seg(10, 1)], CATS
        )
        res = summarize_pq(stat, CATS)
        # stuffA: PQ=1; thingB absent everywhere -> excluded from the mean
        # (panopticapi semantics)
        assert np.isclose(res["All"]["pq"], 1.0)
        assert np.isclose(res["Stuff"]["pq"], 1.0)
        assert res["All"]["n"] == 1

    def test_half_overlap_no_match(self):
        """IoU = 1/3 < 0.5 -> FN + FP."""
        gt = np.zeros((10, 10), np.int64)
        pred = np.zeros((10, 10), np.int64)
        gt[:, :6] = 20     # area 60
        pred[:, 3:9] = 21  # area 60, overlap 30 -> iou 30/90 = 1/3
        stat = pq_compute_single_image(
            gt, pred, [seg(20, 2)], [seg(21, 2)], CATS
        )
        s = stat.stats[2]
        assert s["tp"] == 0 and s["fn"] == 1 and s["fp"] == 1

    def test_iou_above_half_matches(self):
        gt = np.zeros((10, 10), np.int64)
        pred = np.zeros((10, 10), np.int64)
        gt[:, :8] = 20     # 80
        pred[:, :7] = 21   # 70, inter 70, union 80 -> iou 0.875
        stat = pq_compute_single_image(
            gt, pred, [seg(20, 2)], [seg(21, 2)], CATS
        )
        s = stat.stats[2]
        assert s["tp"] == 1
        assert np.isclose(s["iou"], 70 / 80)

    def test_void_excused_fp(self):
        """Prediction mostly over GT void is not an FP."""
        gt = np.zeros((10, 10), np.int64)  # all void
        pred = np.zeros((10, 10), np.int64)
        pred[:5] = 21
        stat = pq_compute_single_image(gt, pred, [], [seg(21, 2)], CATS)
        assert stat.stats[2]["fp"] == 0

    def test_crowd_not_matched_but_excuses_fp(self):
        gt = np.zeros((10, 10), np.int64)
        gt[:, :] = 30  # crowd thing
        pred = np.zeros((10, 10), np.int64)
        pred[:, :] = 21
        stat = pq_compute_single_image(
            gt, pred, [seg(30, 2, crowd=1)], [seg(21, 2)], CATS
        )
        s = stat.stats[2]
        assert s["tp"] == 0 and s["fp"] == 0 and s["fn"] == 0

    def test_wrong_class_is_fp_and_fn(self):
        gt = np.ones((10, 10), np.int64) * 10
        pred = np.ones((10, 10), np.int64) * 20
        stat = pq_compute_single_image(
            gt, pred, [seg(10, 1)], [seg(20, 2)], CATS
        )
        assert stat.stats[1]["fn"] == 1
        assert stat.stats[2]["fp"] == 1


class TestPanopticEvaluator:
    def _meta(self):
        return Metadata(name="test").set(
            **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
        )

    def test_perfect_prediction(self):
        meta = self._meta()
        ev = PanopticEvaluator(meta)
        pan = np.full((64, 64), 1 * 1000, np.int64)  # road everywhere
        pan[10:30, 10:30] = 12 * 1000 + 1            # one person instance
        ev.process(pan, pan)
        res = ev.evaluate()["panoptic_seg"]
        # only present categories count (panopticapi): perfect -> 100
        assert np.isclose(res["PQ"], 100.0)
        assert np.isclose(res["SQ"], 100.0)

    def test_ego_ignored(self):
        meta = self._meta()
        ev = PanopticEvaluator(meta)
        pan_gt = np.full((32, 32), 1 * 1000, np.int64)
        pan_pred = pan_gt.copy()
        # ego vehicle (trainId 0) region differs but must not matter
        pan_gt[:8] = 0
        pan_pred[:8] = 2 * 1000
        ev.process(pan_pred, pan_gt)
        res = ev.evaluate()["panoptic_seg"]
        # class 1 still matches with iou over non-void region... sidewalk
        # mismatch on void region is excused
        assert res["PQ"] > 0


class TestDepthMetrics:
    def test_perfect(self):
        gt = np.random.RandomState(0).uniform(1, 50, (100,)).astype(np.float32)
        m = depth_metrics(gt, gt)
        assert np.allclose(m[:4], 0)
        assert np.allclose(m[4:], 1)

    def test_formulas(self):
        gt = np.array([10.0, 20.0])
        pred = np.array([12.0, 16.0])
        abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = depth_metrics(pred, gt)
        assert np.isclose(abs_rel, (2 / 10 + 4 / 20) / 2)
        assert np.isclose(rmse, np.sqrt((4 + 16) / 2))
        # thresh = [1.2, 1.25]; 1.25 is not < 1.25 -> a1 = 0.5
        assert np.isclose(a1, 0.5)

    def test_gt_median_scaling(self):
        ev = DepthEvaluator(use_gt_scale=True)

        class FakeMeta(dict):
            pass

        import tempfile, os
        from PIL import Image

        with tempfile.TemporaryDirectory() as d:
            gt = (np.random.RandomState(0).uniform(5, 60, (20, 20))
                  * 256).astype(np.uint16)
            path = os.path.join(d, "d.png")
            Image.fromarray(gt).save(path)
            meta = {"depth_file_name": path}
            gt_m = gt.astype(np.float32) / 256.0
            # prediction = gt / 3 -> after median scaling it's exact
            ev.process(gt_m / 3.0, meta)
        res = ev.evaluate()["depth"]
        assert res["Abs Rel"] < 1e-6
        assert np.isclose(res["scale_ratio_median"], 3.0)


def test_depth_a1_boundary():
    gt = np.array([10.0, 20.0])
    pred = np.array([12.0, 16.0])
    m = depth_metrics(pred, gt)
    assert np.isclose(m[4], 0.5)


class TestSemSeg:
    def test_miou(self):
        meta = Metadata(name="t").set(
            **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
        )
        ev = SemSegEvaluator(meta)
        gt = np.full((10, 10), 1, np.int32)
        gt[:5] = 2
        pred = gt.copy()
        pred[0] = 1  # 10 px of class 2 predicted as 1
        ev.process(pred, gt)
        res = ev.evaluate()["sem_seg"]
        iou_1 = 50 / 60  # tp=50, fp=10
        iou_2 = 40 / 50  # tp=40, fn=10
        assert np.isclose(res["IoU-road"], 100 * iou_1)
        assert np.isclose(res["IoU-sidewalk"], 100 * iou_2)
        assert np.isclose(res["mIoU"], 100 * (iou_1 + iou_2) / 2)

    def test_ignore_label_and_ego(self):
        meta = Metadata(name="t").set(
            **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
        )
        ev = SemSegEvaluator(meta)
        gt = np.full((10, 10), 255, np.int32)
        gt[0, 0] = 0  # ego (ignoreInEval)
        pred = np.zeros((10, 10), np.int32)
        ev.process(pred, gt)
        assert ev.confusion.sum() == 0
