"""Differential validation of evaluate_yolov5_v6 against an INDEPENDENT
line-faithful transcription of the upstream v6.0 val harness
(tests/oracle_yolov5_val.py) — the same two-implementation structure the
COCO path has with tests/oracle_cocoeval.py. The egress-day instrument that
will adjudicate /root/reference/README.md:50-53 is no longer single-sourced:
both implementations were written from the upstream source, share no code,
and must agree to 1e-12 on randomized scenarios.

Known held-out degeneracies (documented, excluded by construction here):
confidence ties (evaluation.py pins a stable sort where upstream's default
quicksort order is unspecified) and IoU values within float32 epsilon of a
threshold (upstream rounds matches through torch.Tensor/f32; scores and
boxes here are continuous-random, so both events have probability zero).
"""

import numpy as np
import pytest

from oracle_yolov5_val import ap_per_class, compute_ap, process_batch, yolov5_v6_val
from test_cocoeval_golden import _scenario
from vehicle_counting_tpu.evaluation import evaluate_yolov5_v6


@pytest.mark.parametrize("seed", range(12))
def test_differential_randomized(seed):
    rng = np.random.default_rng(seed)
    preds, gts = _scenario(rng, n_images=7, n_classes=4, max_gt=8, max_pred=14)
    want = yolov5_v6_val(preds, gts)
    got = evaluate_yolov5_v6(preds, gts)
    for k in ("precision", "recall", "mAP50", "mAP50_95"):
        assert got[k] == pytest.approx(want[k], abs=1e-12), (k, seed)


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_differential_sparse_images(seed):
    """Images with zero predictions and images with zero ground truth both
    ride the val.py stats loop's special branches."""
    rng = np.random.default_rng(seed)
    preds, gts = _scenario(rng, n_images=10, n_classes=3, max_gt=3, max_pred=4)
    # force the edge branches deterministically
    empty_p = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0, np.int64),
               "scores": np.zeros(0)}
    empty_g = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0, np.int64)}
    preds[0], preds[3] = dict(empty_p), dict(empty_p)
    gts[1], gts[3] = dict(empty_g), dict(empty_g)
    want = yolov5_v6_val(preds, gts)
    got = evaluate_yolov5_v6(preds, gts)
    for k in ("precision", "recall", "mAP50", "mAP50_95"):
        assert got[k] == pytest.approx(want[k], abs=1e-12), (k, seed)


def test_differential_single_class_crowd():
    """One dominant class (the bench's skew shape): many preds per image."""
    rng = np.random.default_rng(77)
    preds, gts = _scenario(rng, n_images=5, n_classes=1, max_gt=12, max_pred=25)
    want = yolov5_v6_val(preds, gts)
    got = evaluate_yolov5_v6(preds, gts)
    for k in ("precision", "recall", "mAP50", "mAP50_95"):
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_zero_tp_fallback_matches_upstream():
    """All-miss run: upstream skips ap_per_class entirely (stats[0].any()
    gate) and reports zeros; both implementations must agree exactly."""
    g = {"boxes": np.array([[0.0, 0, 10, 10]]), "classes": np.array([0])}
    p = {"boxes": np.array([[50.0, 50, 60, 60]]), "classes": np.array([0]),
         "scores": np.array([0.9])}
    want = yolov5_v6_val([p], [g])
    got = evaluate_yolov5_v6([p], [g])
    assert want == {"precision": 0.0, "recall": 0.0, "mAP50": 0.0,
                    "mAP50_95": 0.0}
    assert got == want


def test_oracle_process_batch_unique_reorder_quirk():
    """The oracle itself exhibits the v6.0 np.unique reorder quirk: the
    lower-IoU, lower-detection-index match wins the label (independent
    confirmation of the quirk the in-framework module reproduces)."""
    # label area 200; det0 IoU 0.55 (index 0), det1 IoU 0.95 (index 1)
    labels = np.array([[0.0, 0, 0, 10, 20]])
    dets = np.array([
        [0.0, 0, 10, 11, 0.9, 0],
        [0.0, 0, 10, 19, 0.8, 0],
    ])
    correct = process_batch(dets, labels)
    assert correct[0, 0] and not correct[1].any()
    # judged by the matched pair's IoU: 0.55 passes thresholds .5 and .55
    assert correct[0].sum() == 2


def test_oracle_compute_ap_closed_form():
    """Perfect single detection: mrec=[0,1,1.01], mpre=[1,1,0] -> AP == 1
    under the trapz/interp quadrature."""
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0, abs=1e-12)


def test_oracle_ap_per_class_absent_class_dropped():
    """A prediction of a class with no GT anywhere contributes nothing."""
    tp = np.array([[True] * 10, [False] * 10])
    conf = np.array([0.9, 0.95])
    pred_cls = np.array([0.0, 3.0])
    target_cls = np.array([0.0])
    p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert list(classes) == [0]
    assert ap.shape == (1, 10)
    assert ap[0, 0] == pytest.approx(1.0, abs=1e-12)
