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


def test_evaluation_cli_csv_and_coco(tmp_path):
    """python -m vehicle_counting_tpu.evaluation --pred csv --gt json/csv."""
    import json

    import pandas as pd

    from vehicle_counting_tpu.evaluation import main

    # GT: 2 frames, 2 boxes each; preds: perfect on frame 1, one miss + one
    # false positive on frame 2
    gt_rows = {"frame_id": [], "x1": [], "y1": [], "x2": [], "y2": [], "label": []}
    for fid, boxes in [(1, [(10, 10, 60, 60, 0), (100, 100, 160, 150, 1)]),
                       (2, [(20, 20, 80, 90, 0), (200, 50, 260, 100, 1)])]:
        for x1, y1, x2, y2, c in boxes:
            gt_rows["frame_id"].append(fid)
            gt_rows["x1"].append(x1); gt_rows["y1"].append(y1)
            gt_rows["x2"].append(x2); gt_rows["y2"].append(y2)
            gt_rows["label"].append(c)
    gt_csv = tmp_path / "gt.csv"
    pd.DataFrame(gt_rows).to_csv(gt_csv, index=False)

    pred = pd.DataFrame({
        "frame_id": [1, 1, 2, 2],
        "x1": [10, 100, 20, 300], "y1": [10, 100, 20, 300],
        "x2": [60, 160, 80, 360], "y2": [60, 150, 90, 350],
        "score": [0.9, 0.8, 0.85, 0.7],
        "label": [0, 1, 0, 1],
    })
    pred_csv = tmp_path / "pred.csv"
    pred.to_csv(pred_csv, index=False)

    m = main(["--pred", str(pred_csv), "--gt", str(gt_csv), "--num_classes", "2"])
    assert 0 < m["precision"] < 1 and 0 < m["recall"] < 1
    assert m["mAP50"] > 0.4

    # same GT as COCO json must give identical metrics
    coco = {
        "images": [{"id": 1}, {"id": 2}],
        "annotations": [
            {"image_id": fid, "category_id": c, "bbox": [x1, y1, x2 - x1, y2 - y1]}
            for fid, x1, y1, x2, y2, c in zip(
                gt_rows["frame_id"], gt_rows["x1"], gt_rows["y1"],
                gt_rows["x2"], gt_rows["y2"], gt_rows["label"])
        ],
        "categories": [{"id": 0}, {"id": 1}],
    }
    gt_json = tmp_path / "gt.json"
    gt_json.write_text(json.dumps(coco))
    m2 = main(["--pred", str(pred_csv), "--gt", str(gt_json), "--num_classes", "2"])
    assert m == m2
