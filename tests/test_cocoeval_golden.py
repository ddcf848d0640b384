"""evaluation.py cross-validation: COCOeval transcription + golden fixtures.

VERDICT r3 next-3: pycocotools is absent here, so evaluation.py — the
instrument that judges real-weight accuracy parity on egress day — is
validated three ways:
  1. randomized cross-check against tests/oracle_cocoeval.py, a
     line-faithful transcription of pycocotools' evaluateImg/accumulate
     (exact agreement expected, not approximate);
  2. hand-computed golden fixtures with closed-form expected values
     (score ties, the 10-threshold sweep, maxDets truncation, per-class
     averaging over GT-present classes only);
  3. unit pins on the YOLOv5-v6.0 harness semantics (the instrument that
     actually produced /root/reference/README.md:50-53): the
     match-at-0.5/judge-by-IoU rule, the np.unique reorder quirk, and
     clean closed-form AP cases.
"""

import numpy as np
import pytest

from oracle_cocoeval import cocoeval
from vehicle_counting_tpu.evaluation import (
    IOU_RANGE,
    _yolo_process_batch,
    evaluate_detections,
    evaluate_yolov5_v6,
)


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def _scenario(rng, n_images=6, n_classes=3, max_gt=8, max_pred=12):
    """Random images with clustered boxes so IoUs span [0, 1)."""
    preds, gts = [], []
    for _ in range(n_images):
        ng = rng.integers(0, max_gt + 1)
        gb = np.zeros((ng, 4))
        gc = rng.integers(0, n_classes, ng)
        for i in range(ng):
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(8, 30, 2)
            gb[i] = [x, y, x + w, y + h]
        npd = rng.integers(0, max_pred + 1)
        pb = np.zeros((npd, 4))
        pc = rng.integers(0, n_classes, npd)
        ps = rng.uniform(0.05, 1.0, npd)
        for i in range(npd):
            if ng and rng.random() < 0.7:
                # jitter a GT box so realistic partial overlaps appear
                j = rng.integers(0, ng)
                d = rng.uniform(-8, 8, 4)
                pb[i] = gb[j] + d
                pb[i, 2] = max(pb[i, 2], pb[i, 0] + 1)
                pb[i, 3] = max(pb[i, 3], pb[i, 1] + 1)
                if rng.random() < 0.8:
                    pc[i] = gc[j]
            else:
                x, y = rng.uniform(0, 80, 2)
                w, h = rng.uniform(8, 30, 2)
                pb[i] = [x, y, x + w, y + h]
        preds.append({"boxes": pb, "classes": pc, "scores": ps})
        gts.append({"boxes": gb, "classes": gc})
    return preds, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_matches_cocoeval_transcription_randomized(seed):
    rng = np.random.default_rng(seed)
    preds, gts = _scenario(rng)
    want = cocoeval(preds, gts, num_classes=3, max_dets=100)
    got = evaluate_detections(preds, gts, num_classes=3, max_dets=100)
    # same algorithm -> exact to fp noise, not "approximately similar"
    assert got["mAP50"] == pytest.approx(want["mAP50"], abs=1e-12)
    assert got["mAP50_95"] == pytest.approx(want["mAP50_95"], abs=1e-12)


def test_matches_cocoeval_with_score_tie_pileups():
    rng = np.random.default_rng(42)
    preds, gts = _scenario(rng, n_images=4)
    for p in preds:  # quantize scores so cross-image ties are common
        p["scores"] = np.round(p["scores"], 1)
    want = cocoeval(preds, gts, num_classes=3, max_dets=100)
    got = evaluate_detections(preds, gts, num_classes=3, max_dets=100)
    assert got["mAP50"] == pytest.approx(want["mAP50"], abs=1e-12)
    assert got["mAP50_95"] == pytest.approx(want["mAP50_95"], abs=1e-12)


def test_matches_cocoeval_small_maxdets():
    rng = np.random.default_rng(9)
    preds, gts = _scenario(rng, n_images=4, max_pred=15)
    for md in (1, 3, 100):
        want = cocoeval(preds, gts, num_classes=3, max_dets=md)
        got = evaluate_detections(preds, gts, num_classes=3, max_dets=md)
        assert got["mAP50_95"] == pytest.approx(want["mAP50_95"], abs=1e-12), md


# ---------------------------------------------------------------------------
# hand-computed golden fixtures (closed-form expectations)
# ---------------------------------------------------------------------------

def test_golden_two_gt_three_preds():
    """1 image, 1 class, 2 GT; P1 IoU=1.0 (s=.9), P2 IoU=0.625 (s=.8),
    P3 IoU=0 (s=.7).

    t in {.50,.55,.60}: tp=[1,1,0] -> rc=[.5,1,1], pr envelope=[1,1,2/3]
      -> all 101 recall points read precision 1.0 -> AP=1.
    t in {.65..{.95}} (7 thresholds): tp=[1,0,0] -> rc=[.5,.5,.5],
      pr envelope=[1,.5,1/3] -> recall points 0.00..0.50 (51 of them) read
      1.0, the rest 0 -> AP=51/101.
    """
    gt = {"boxes": np.array([_box(0, 0, 10, 10), _box(20, 0, 10, 10)]),
          "classes": np.array([0, 0])}
    pred = {
        "boxes": np.array([
            _box(0, 0, 10, 10),        # IoU 1.0 with GT1
            _box(20, 0, 10, 16),       # inter 100 / union 160 = 0.625 w/ GT2
            _box(50, 50, 10, 10),      # IoU 0
        ]),
        "classes": np.array([0, 0, 0]),
        "scores": np.array([0.9, 0.8, 0.7]),
    }
    got = evaluate_detections([pred], [gt], num_classes=1, max_dets=100)
    assert got["mAP50"] == pytest.approx(1.0, abs=1e-12)
    want = (3 * 1.0 + 7 * (51 / 101)) / 10
    assert got["mAP50_95"] == pytest.approx(want, abs=1e-12)
    # identical under the transcription too
    o = cocoeval([pred], [gt], num_classes=1)
    assert o["mAP50_95"] == pytest.approx(want, abs=1e-12)


def test_golden_cross_image_score_tie_is_stable():
    """Two images, equal scores: pooling must keep image order for ties
    (mergesort). img1's pred is the TP; if tie order flipped, AP halves."""
    g = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0])}
    p_hit = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0]),
             "scores": np.array([0.5])}
    p_miss = {"boxes": np.array([_box(50, 50, 10, 10)]), "classes": np.array([0]),
              "scores": np.array([0.5])}
    got = evaluate_detections([p_hit, p_miss], [g, g], num_classes=1)
    # tp=[1,0] pooled: rc=[.5,.5], pr env=[1,.5]; recall 0.00..0.50 -> 1.0
    assert got["mAP50_95"] == pytest.approx(51 / 101, abs=1e-12)
    o = cocoeval([p_hit, p_miss], [g, g], num_classes=1)
    assert o["mAP50_95"] == pytest.approx(51 / 101, abs=1e-12)


def test_golden_maxdets_truncation_drops_late_hit():
    """maxDets=1 keeps only the highest-score det (a miss): AP=0; without
    the cap the second det is a perfect hit."""
    g = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0])}
    p = {"boxes": np.array([_box(50, 50, 10, 10), _box(0, 0, 10, 10)]),
         "classes": np.array([0, 0]), "scores": np.array([0.9, 0.8])}
    capped = evaluate_detections([p], [g], num_classes=1, max_dets=1)
    assert capped["mAP50_95"] == 0.0
    uncapped = evaluate_detections([p], [g], num_classes=1)
    # tp=[0,1]: rc=[0,1], pr=[0,.5] env=[.5,.5] -> all recall points .5
    assert uncapped["mAP50_95"] == pytest.approx(0.5, abs=1e-12)
    assert cocoeval([p], [g], num_classes=1, max_dets=1)["mAP50_95"] == 0.0


def test_golden_absent_class_excluded_from_mean():
    """Classes with zero GT must not drag the mean down (COCOeval -1 rule)."""
    g = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0])}
    p = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0]),
         "scores": np.array([0.9])}
    for k in (1, 2, 5):
        got = evaluate_detections([p], [g], num_classes=k)
        assert got["mAP50_95"] == pytest.approx(1.0, abs=1e-12), k


# ---------------------------------------------------------------------------
# YOLOv5 v6.0 harness semantics (the reference table's instrument)
# ---------------------------------------------------------------------------

def test_yolo_match_fixed_at_050_judged_by_iou():
    """v6.0 val.py matches ONCE at IoU 0.5 and judges higher thresholds by
    the matched pair's IoU — not by re-matching."""
    pb = np.array([_box(0, 0, 10, 16)])   # IoU 0.625 with the GT
    gb = np.array([_box(0, 0, 10, 10)])
    tp = _yolo_process_batch(pb, np.array([0.9]), np.array([0]), gb, np.array([0]))
    # 0.625 >= {.5,.55,.6}, < {.65..}
    np.testing.assert_array_equal(tp[0], IOU_RANGE <= 0.625)


def test_yolo_unique_reorder_quirk():
    """Two preds on one GT: high-score pred IoU .55, low-score IoU .95.
    v6.0's unique-by-det step reorders by det INDEX before unique-by-gt, so
    the det-index-0 (higher score) pred keeps the GT even though the other
    has higher IoU — transcribed faithfully, quirk and all."""
    gb = np.array([_box(0, 0, 10, 20)])
    # pred0: IoU = 11/20 = 0.55 won't... use exact fractions:
    # gt area 200. pred0 [0,0,10,11]: inter 110, union 200 -> wait
    # inter=110, union=200+110-110=200 -> IoU=0.55 exactly.
    pb = np.array([_box(0, 0, 10, 11), _box(0, 0, 10, 19)])
    # pred1: inter 190, union 200 -> IoU 0.95
    tp = _yolo_process_batch(
        pb, np.array([0.9, 0.8]), np.array([0, 0]), gb, np.array([0, 0][:1])
    )
    assert tp[0, 0] and not tp[1].any()      # pred0 won the GT
    # pred0's IoU 0.55 passes t=.5 and t=.55 only (within fp eps of arange)
    np.testing.assert_array_equal(tp[0], IOU_RANGE <= 0.5500001)


def test_yolo_perfect_detection_all_ones():
    g = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0])}
    p = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0]),
         "scores": np.array([0.9])}
    got = evaluate_yolov5_v6([p], [g])
    for k in ("precision", "recall", "mAP50", "mAP50_95"):
        assert got[k] == pytest.approx(1.0, abs=1e-9), k


def test_yolo_half_case_closed_form():
    """2 images, 1 GT each; one perfect hit (s=.9), one clean miss (s=.8).

    tp=[1,0], npig=2: recall=[.5,.5], precision=[1,.5]. compute_ap knots:
    mrec=[0,.5,.5,.51], mpre(enveloped)=[1,1,.5,0]. The hand-derived curve
    is fed to the same np.interp/np.trapz quadrature the upstream uses
    (their numerics ARE the spec); matching/cumsum/envelope are hand-done.
    """
    g = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0])}
    p_hit = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0]),
             "scores": np.array([0.9])}
    p_miss = {"boxes": np.array([_box(50, 50, 10, 10)]), "classes": np.array([0]),
              "scores": np.array([0.8])}
    got = evaluate_yolov5_v6([p_hit, p_miss], [g, g])
    x = np.linspace(0, 1, 101)
    trapz = getattr(np, "trapezoid", None) or np.trapz
    want_ap = float(trapz(np.interp(x, [0, .5, .5, .51], [1, 1, .5, 0]), x))
    assert got["mAP50"] == pytest.approx(want_ap, abs=1e-12)
    assert got["mAP50_95"] == pytest.approx(want_ap, abs=1e-12)
    # best mean-F1 threshold sits at the grid point just under conf .9
    # where recall=.5 and precision ~1 (upstream's P/R curves interpolate
    # LINEARLY in confidence on a 1000-point grid, so the value is the
    # interp at px=0.8998998..., a hair under 1 — that IS the upstream
    # number, not a bug here)
    assert got["recall"] == pytest.approx(0.5, abs=1e-6)
    assert got["precision"] == pytest.approx(1.0, abs=2e-3)
    assert got["precision"] < 1.0


def test_yolo_preds_of_absent_class_are_dropped():
    """v6.0 iterates np.unique(target_cls): predictions whose class has no
    GT anywhere contribute nothing (not even FP) — unlike COCO."""
    g = {"boxes": np.array([_box(0, 0, 10, 10)]), "classes": np.array([0])}
    p = {"boxes": np.array([_box(0, 0, 10, 10), _box(50, 50, 10, 10)]),
         "classes": np.array([0, 3]), "scores": np.array([0.9, 0.95])}
    got = evaluate_yolov5_v6([p], [g])
    assert got["mAP50_95"] == pytest.approx(1.0, abs=1e-9)
    assert got["precision"] == pytest.approx(1.0, abs=1e-6)


def test_yolo_regression_pin_randomized():
    """HARD-CODED values on a fixed randomized scenario: any future edit to
    the v6.0 transcription that changes semantics fails loudly here. The
    expected numbers were computed once and frozen (and independently
    reproduced by tests/oracle_yolov5_val.py — see
    tests/test_yolov5_val_oracle.py for the randomized differential)."""
    rng = np.random.default_rng(7)
    preds, gts = _scenario(rng, n_images=5)
    got = evaluate_yolov5_v6(preds, gts)
    want = {
        "precision": 0.16837437033438193,
        "recall": 0.14907407407407405,
        "mAP50": 0.05376068376068376,
        "mAP50_95": 0.014108262108262107,
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k
