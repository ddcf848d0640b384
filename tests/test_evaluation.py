import numpy as np
import pytest

from vehicle_counting_tpu.evaluation import (
    average_precision,
    evaluate_detections,
)


def _img(boxes, classes, scores=None):
    d = {"boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
         "classes": np.asarray(classes, np.int64)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float64)
    return d


def test_perfect_detections():
    gt = [_img([[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1])]
    pred = [_img([[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1], [0.9, 0.8])]
    m = evaluate_detections(pred, gt, num_classes=2)
    assert m["precision"] == 1.0
    assert m["recall"] == 1.0
    assert m["mAP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["mAP50_95"] == pytest.approx(1.0, abs=1e-6)


def test_false_positive_and_miss():
    gt = [_img([[0, 0, 10, 10], [50, 50, 60, 60]], [0, 0])]
    # one perfect hit, one far-off false positive, one gt missed
    pred = [_img([[0, 0, 10, 10], [100, 100, 110, 110]], [0, 0], [0.9, 0.8])]
    m = evaluate_detections(pred, gt, num_classes=1)
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == pytest.approx(0.5)
    # AP: at rank1 tp (P=1, R=0.5), rank2 fp -> AP ~ 0.5
    assert 0.4 < m["mAP50"] < 0.6


def test_localization_quality_affects_map5095():
    gt = [_img([[0, 0, 100, 100]], [0])]
    # IoU ~ 0.6 prediction: counts at 0.5..0.6 thresholds, not above
    pred = [_img([[0, 0, 100, 60]], [0], [0.9])]
    m = evaluate_detections(pred, gt, num_classes=1)
    assert m["mAP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["mAP50_95"] < 0.5


def test_wrong_class_is_fp():
    gt = [_img([[0, 0, 10, 10]], [0])]
    pred = [_img([[0, 0, 10, 10]], [1], [0.9])]
    m = evaluate_detections(pred, gt, num_classes=2)
    assert m["recall"] == 0.0


def test_average_precision_basic():
    # 3 preds: tp, fp, tp over 2 gt
    tp = np.array([True, False, True])
    sc = np.array([0.9, 0.8, 0.7])
    ap = average_precision(tp, sc, n_gt=2)
    # P(R=0.5)=1.0, P(R=1.0)=2/3 -> interpolated ~0.83
    assert 0.75 < ap < 0.9


def test_duplicate_detection_one_tp():
    gt = [_img([[0, 0, 10, 10]], [0])]
    pred = [_img([[0, 0, 10, 10], [0.5, 0.5, 10, 10]], [0, 0], [0.9, 0.85])]
    m = evaluate_detections(pred, gt, num_classes=1)
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == 1.0
