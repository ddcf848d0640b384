"""Line-faithful transcription of the upstream YOLOv5 v6.0 val harness.

Independent test oracle for vehicle_counting_tpu/evaluation.py's
`evaluate_yolov5_v6` — the instrument that will adjudicate the reference's
published table (/root/reference/README.md:50-53, produced by upstream
val.py at the v6.0 tag, NOT by pycocotools) on egress day. This file is
written directly from the upstream v6.0 sources (ultralytics/yolov5 tag
v6.0: val.py `process_batch` + the per-image stats loop; utils/metrics.py
`box_iou`, `ap_per_class`, `compute_ap`) and deliberately shares NO code
with evaluation.py, so randomized differential agreement between the two
is evidence about the algorithm, not about one implementation agreeing
with itself.

Transcription notes (upstream structure kept even where it looks odd —
the quirks ARE the spec):
  * `iouv = linspace(0.5, 0.95, 10)` (upstream uses torch.linspace; the
    in-framework module uses np.arange(0.5, 1.0, 0.05) — the two grids
    differ only in final-ulp rounding of the thresholds, indistinguishable
    except for IoU values within ~1e-16 of a threshold);
  * process_batch casts the matches array through torch.Tensor (float32)
    before the `>= iouv` judgment — reproduced with an astype(np.float32)
    (visible only for IoUs within f32 epsilon of a threshold);
  * the unique-by-detection step reorders matches by detection index
    (np.unique first-occurrence), and the second IoU re-sort is commented
    out at v6.0, so unique-by-label then keeps each label's first match in
    DETECTION-INDEX order, not best-IoU order;
  * ap_per_class iterates np.unique(target_cls): predictions whose class
    has no ground truth anywhere are dropped entirely (never FP);
  * val.py computes metrics only `if len(stats) and stats[0].any()` — a
    run with zero true positives reports all-zero metrics without ever
    entering ap_per_class.
"""

from __future__ import annotations

import numpy as np

_trapz = getattr(np, "trapezoid", None) or np.trapz

# val.py: iouv = torch.linspace(0.5, 0.95, 10)
IOUV = np.linspace(0.5, 0.95, 10)


def box_iou(box1: np.ndarray, box2: np.ndarray) -> np.ndarray:
    """utils/metrics.py::box_iou (v6.0) — note: no epsilon in the union."""

    def box_area(box):
        # box = 4xn
        return (box[2] - box[0]) * (box[3] - box[1])

    area1 = box_area(box1.T)
    area2 = box_area(box2.T)
    inter = np.clip(
        np.minimum(box1[:, None, 2:], box2[None, :, 2:])
        - np.maximum(box1[:, None, :2], box2[None, :, :2]),
        0,
        None,
    ).prod(2)
    return inter / (area1[:, None] + area2[None, :] - inter)


def process_batch(detections: np.ndarray, labels: np.ndarray,
                  iouv: np.ndarray = IOUV) -> np.ndarray:
    """val.py::process_batch (v6.0).

    detections [N, 6] = (x1, y1, x2, y2, conf, class);
    labels     [M, 5] = (class, x1, y1, x2, y2).
    Returns correct [N, len(iouv)] bool.
    """
    correct = np.zeros((detections.shape[0], iouv.shape[0]), dtype=bool)
    iou = box_iou(labels[:, 1:], detections[:, :4])
    x = np.where((iou >= iouv[0]) & (labels[:, 0:1] == detections[None, :, 5]))
    if x[0].shape[0]:
        matches = np.concatenate(
            (np.stack(x, 1), iou[x[0], x[1]][:, None]), 1
        )  # [label, detection, iou]
        if x[0].shape[0] > 1:
            matches = matches[matches[:, 2].argsort()[::-1]]
            matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
            # matches = matches[matches[:, 2].argsort()[::-1]]   (commented out upstream at v6.0)
            matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
        matches = matches.astype(np.float32)  # torch.Tensor(matches) is f32
        correct[matches[:, 1].astype(np.int64)] = (
            matches[:, 2:3] >= iouv.astype(np.float32)
        )
    return correct


def compute_ap(recall, precision):
    """utils/metrics.py::compute_ap (v6.0, method='interp')."""
    # Append sentinel values to beginning and end
    mrec = np.concatenate(([0.0], recall, [recall[-1] + 0.01]))
    mpre = np.concatenate(([1.0], precision, [0.0]))

    # Compute the precision envelope
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))

    # Integrate area under curve (method == 'interp')
    x = np.linspace(0, 1, 101)  # 101-point interp (COCO)
    ap = _trapz(np.interp(x, mrec, mpre), x)  # integrate
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls):
    """utils/metrics.py::ap_per_class (v6.0), plotting stripped.

    Returns (p[:, i], r[:, i], ap, f1[:, i], unique_classes) with i the
    best-mean-F1 index on the 1000-point confidence grid.
    """
    # Sort by objectness
    i = np.argsort(-conf)
    tp, conf, pred_cls = tp[i], conf[i], pred_cls[i]

    # Find unique classes
    unique_classes = np.unique(target_cls)
    nc = unique_classes.shape[0]  # number of classes

    # Create Precision-Recall curve and compute AP for each class
    px = np.linspace(0, 1, 1000)
    ap = np.zeros((nc, tp.shape[1]))
    p = np.zeros((nc, 1000))
    r = np.zeros((nc, 1000))
    for ci, c in enumerate(unique_classes):
        i = pred_cls == c
        n_l = (target_cls == c).sum()  # number of labels
        n_p = i.sum()  # number of predictions
        if n_p == 0 or n_l == 0:
            continue
        # Accumulate FPs and TPs
        fpc = (1 - tp[i]).cumsum(0)
        tpc = tp[i].cumsum(0)

        # Recall
        recall = tpc / (n_l + 1e-16)  # recall curve
        r[ci] = np.interp(-px, -conf[i], recall[:, 0], left=0)

        # Precision
        precision = tpc / (tpc + fpc)  # precision curve
        p[ci] = np.interp(-px, -conf[i], precision[:, 0], left=1)

        # AP from recall-precision curve
        for j in range(tp.shape[1]):
            ap[ci, j], _, _ = compute_ap(recall[:, j], precision[:, j])

    # Compute F1 (harmonic mean of precision and recall)
    f1 = 2 * p * r / (p + r + 1e-16)
    i = f1.mean(0).argmax()  # max F1 index
    return p[:, i], r[:, i], ap, f1[:, i], unique_classes.astype("int32")


def yolov5_v6_val(predictions, ground_truths):
    """The val.py statistics loop + summary (v6.0), same input contract as
    evaluation.py: per-image dicts with 'boxes' xyxy / 'classes' /
    (preds) 'scores'. Returns the published metric set."""
    stats = []
    for pred, gt in zip(predictions, ground_truths):
        pb = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        ps = np.asarray(pred["scores"], np.float64).reshape(-1)
        pc = np.asarray(pred["classes"], np.float64).reshape(-1)
        gb = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        gc = np.asarray(gt["classes"], np.float64).reshape(-1)
        nl = len(gc)
        tcls = gc.tolist() if nl else []
        if len(pb) == 0:
            if nl:
                stats.append(
                    (np.zeros((0, len(IOUV)), bool), np.zeros(0), np.zeros(0), tcls)
                )
            continue
        detections = np.concatenate([pb, ps[:, None], pc[:, None]], 1)
        if nl:
            labelsn = np.concatenate([gc[:, None], gb], 1)
            correct = process_batch(detections, labelsn, IOUV)
        else:
            correct = np.zeros((len(pb), len(IOUV)), bool)
        stats.append((correct, ps, pc, tcls))

    stats = [np.concatenate(x, 0) for x in zip(*stats)] if stats else []
    if len(stats) and stats[0].any():
        p, r, ap, f1, ap_class = ap_per_class(*stats)
        ap50, ap = ap[:, 0], ap.mean(1)  # AP@0.5, AP@0.5:0.95
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap.mean()
    else:
        mp = mr = map50 = map_ = 0.0
    return {
        "precision": float(mp),
        "recall": float(mr),
        "mAP50": float(map50),
        "mAP50_95": float(map_),
    }
