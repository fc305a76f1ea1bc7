"""Detection/classification metrics (pipeline/metrics.py) — hand-computed
golden cases for IoU, greedy matching, 101-point AP, mAP aggregation, and
the classifier confusion/PRF1 report."""

import numpy as np
import pytest

from tpu3dlm.pipeline.metrics import (
    IOU_THRESHOLDS,
    box_iou,
    compute_ap,
    confusion_matrix,
    evaluate_classification,
    evaluate_detections,
    match_predictions,
    matched_pairs,
)


class TestBoxIoU:
    def test_identical_and_disjoint(self):
        a = np.array([[0, 0, 2, 2]], float)
        b = np.array([[0, 0, 2, 2], [10, 10, 12, 12]], float)
        m = box_iou(a, b)
        assert m.shape == (1, 2)
        assert m[0, 0] == pytest.approx(1.0)
        assert m[0, 1] == 0.0

    def test_hand_value(self):
        # inter 4x3 = 12, union 16 + 12 - 12 = 16 → 0.75 exactly
        m = box_iou([[0, 0, 4, 4]], [[0, 1, 4, 4]])
        assert m[0, 0] == pytest.approx(0.75)

    def test_degenerate_boxes_zero(self):
        m = box_iou([[1, 1, 1, 1]], [[0, 0, 2, 2]])
        assert m[0, 0] == 0.0


class TestMatching:
    def test_greedy_highest_iou_wins(self):
        # two preds over one gt: the higher-IoU pred takes it, the other is FP
        gt = np.array([[0, 0, 4, 4]], float)
        preds = np.array([[0, 1, 4, 4], [0, 2, 4, 4]], float)  # IoU .75, .5
        tp = match_predictions(
            box_iou(preds, gt), [0, 0], [0], np.array([0.5])
        )
        assert tp[:, 0].tolist() == [True, False]

    def test_class_mismatch_never_matches(self):
        gt = np.array([[0, 0, 4, 4]], float)
        tp = match_predictions(box_iou(gt, gt), [1], [0], np.array([0.5]))
        assert not tp.any()

    def test_pairs_one_to_one(self):
        gt = np.array([[0, 0, 4, 4], [10, 0, 14, 4]], float)
        preds = np.array([[0, 0, 4, 4], [0, 1, 4, 4], [10, 0, 14, 4]], float)
        pairs = matched_pairs(box_iou(preds, gt), [0, 0, 0], [0, 0], 0.5)
        assert sorted(pairs) == [(0, 0), (2, 1)]

    def test_iou_ladder_thresholds(self):
        # IoU exactly 0.75 → TP at 0.50..0.75 (6 rungs), FP above
        gt = np.array([[0, 0, 4, 4]], float)
        pred = np.array([[0, 1, 4, 4]], float)
        tp = match_predictions(box_iou(pred, gt), [0], [0], IOU_THRESHOLDS)
        assert tp[0].sum() == 6
        assert tp[0, :6].all() and not tp[0, 6:].any()


class TestComputeAP:
    def test_perfect(self):
        assert compute_ap([1.0], [1.0]) == pytest.approx(1.0)

    def test_half_recall_then_fp(self):
        # TP then FP over 2 gt: P=[1,.5], R=[.5,.5] → 51/101 points at p=1
        assert compute_ap([0.5, 0.5], [1.0, 0.5]) == pytest.approx(51 / 101)

    def test_envelope_monotone(self):
        # dip then recovery: envelope lifts the dip to the later max
        ap = compute_ap([0.25, 0.5, 0.75, 1.0], [1.0, 0.4, 0.8, 0.6])
        # r in (0, .25]: 1.0; (.25, .75]: .8; (.75, 1]: .6
        want = (1 + 25 * 1.0 + 50 * 0.8 + 25 * 0.6) / 101
        assert ap == pytest.approx(want)


class TestEvaluateDetections:
    GT = {0: [[0, 0, 4, 4, 1.0, 0]], 1: [[10, 10, 14, 14, 1.0, 1]]}

    def test_perfect_predictions(self):
        preds = {0: [[0, 0, 4, 4, 0.9, 0]], 1: [[10, 10, 14, 14, 0.8, 1]]}
        m = evaluate_detections(preds, self.GT)
        assert m.map50 == pytest.approx(1.0)
        assert m.map50_95 == pytest.approx(1.0)
        assert m.precision == pytest.approx(1.0)
        assert m.recall == pytest.approx(1.0)
        assert m.num_predictions == 2 and m.num_ground_truth == 2

    def test_seven_field_records_accepted(self):
        preds = {0: [[0, 0, 4, 4, 1, 0.9, 0]], 1: [[10, 10, 14, 14, 0, 0.8, 1]]}
        assert evaluate_detections(preds, self.GT).map50 == pytest.approx(1.0)

    def test_missed_frame_counts_as_fn(self):
        preds = {0: [[0, 0, 4, 4, 0.9, 0]]}  # class-1 gt never predicted
        m = evaluate_detections(preds, self.GT)
        assert m.map50 == pytest.approx(0.5)  # class 0 AP 1, class 1 AP 0
        assert m.recall == pytest.approx(0.5)

    def test_duplicate_prediction_is_fp(self):
        preds = {
            0: [[0, 0, 4, 4, 0.9, 0], [0, 1, 4, 4, 0.7, 0]],
            1: [[10, 10, 14, 14, 0.8, 1]],
        }
        m = evaluate_detections(preds, self.GT)
        # class 0: TP@conf .9 then FP → AP = (1 + 100) / 101; class 1 perfect
        assert m.per_class_ap50[0] == pytest.approx(101 / 101, abs=1e-9)
        assert m.precision == pytest.approx(2 / 3)

    def test_localisation_error_degrades_map5095_not_map50(self):
        preds = {0: [[0, 1, 4, 4, 0.9, 0]],  # IoU .75 with gt
                 1: [[10, 10, 14, 14, 0.8, 1]]}
        m = evaluate_detections(preds, self.GT)
        assert m.map50 == pytest.approx(1.0)
        # class 0 TP at 6/10 rungs; class 1 at all 10
        assert m.map50_95 == pytest.approx((0.6 + 1.0) / 2)

    def test_empty_predictions(self):
        m = evaluate_detections({}, self.GT)
        assert m.map50 == 0.0 and m.num_ground_truth == 2

    def test_prediction_for_ghost_class_ignored_in_mean(self):
        # a class with zero gt must not dilute mAP of classes that have gt
        preds = {0: [[0, 0, 4, 4, 0.9, 0]], 1: [[10, 10, 14, 14, 0.8, 1]],
                 2: [[0, 0, 4, 4, 0.5, 7]]}
        m = evaluate_detections(preds, self.GT)
        assert m.map50 == pytest.approx(1.0)
        assert m.per_class_ap50[7] == 0.0

    def test_to_dict_json_safe(self):
        import json

        preds = {0: [[0, 0, 4, 4, 0.9, 0]]}
        json.dumps(evaluate_detections(preds, self.GT).to_dict())


class TestClassification:
    def test_confusion_hand_case(self):
        m = confusion_matrix([0, 0, 1, 1, 1], [0, 1, 1, 1, 0], 2)
        assert m.tolist() == [[1, 1], [1, 2]]

    def test_metrics_hand_case(self):
        r = evaluate_classification([0, 0, 1, 1, 1], [0, 1, 1, 1, 0], 2)
        assert r.accuracy == pytest.approx(3 / 5)
        assert r.per_class_precision[0] == pytest.approx(1 / 2)
        assert r.per_class_recall[1] == pytest.approx(2 / 3)
        assert 0.0 < r.macro_f1 < 1.0

    def test_label_bounds_checked(self):
        with pytest.raises(ValueError):
            confusion_matrix([0, 2], [0, 0], 2)
        with pytest.raises(ValueError):
            confusion_matrix([0], [0, 1], 2)

    def test_perfect(self):
        r = evaluate_classification([0, 1, 1], [0, 1, 1], 2)
        assert r.accuracy == 1.0 and r.macro_f1 == pytest.approx(1.0)


class TestPipelineCheckpointReport:
    def test_report_from_synthetic_pickle(self, tmp_path):
        """End-to-end: a fabricated pipeline checkpoint + gt.json →
        detection + damage report through the CLI entry function."""
        import json
        import pickle

        from tpu3dlm.pipeline.metrics import evaluate_pipeline_checkpoint

        gt = {
            "gt_boxes_2d": {"0": [[0, 0, 4, 4, 1.0, 0], [8, 8, 12, 12, 1.0, 1]]},
            "gt_damage_2d": {"0": [1, 0]},
            "signs": [],
        }
        gt_path = tmp_path / "gt.json"
        gt_path.write_text(json.dumps(gt))
        ckpt = {
            "predictions": {
                0: [[0, 0, 4, 4, 1, 0.9, 0], [8, 8, 12, 12, 0, 0.8, 1]]
            }
        }
        pkl = tmp_path / "ckpt.pkl"
        pkl.write_bytes(pickle.dumps(ckpt))
        report = evaluate_pipeline_checkpoint(str(pkl), str(gt_path))
        assert report["detection"]["map50"] == pytest.approx(1.0)
        assert report["damage"]["accuracy"] == pytest.approx(1.0)
        json.dumps(report)
