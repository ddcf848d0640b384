"""Line-faithful transcription of pycocotools COCOeval (bbox, no crowd).

pycocotools is not installed in this environment (VERDICT r3 next-3), so
this module transcribes the official algorithm (pycocotools/cocoeval.py,
`evaluateImg` + `accumulate` + `summarize`) for the case the framework
needs: bbox IoU, a single category set, no iscrowd/ignore regions, one
area range, one maxDets value. Used as the oracle for
vehicle_counting_tpu/evaluation.py's COCO-style path.

Transcribed semantics (each maps to a block below):
  * per-image detections sorted by -score, kind='mergesort', truncated to
    maxDets BEFORE matching;
  * greedy matching in that score order: each det takes the unmatched GT
    with the highest IoU, requiring IoU >= min(t, 1-1e-10); equal-IoU ties
    go to the earlier GT (the `< iou: continue` rule);
  * accumulate: per category, dt matches/scores concatenated across images,
    re-sorted by -score mergesort; cumsum TP/FP; precision envelope applied
    BACKWARD (pr[i-1] = max(pr[i-1], pr[i])); 101 recall thresholds read
    off with searchsorted(side='left'), zero past the last recall;
  * categories with zero GT are excluded from the means (precision -1).
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


def iou_xyxy(d, g):
    """Plain bbox IoU (pycocotools maskUtils.iou on xywh, no +1)."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    return inter / np.maximum(area_d[:, None] + area_g[None, :] - inter, 1e-12)


def evaluate_img(dt_boxes, dt_scores, gt_boxes, max_dets):
    """COCOeval.evaluateImg: (dtm [T, D] bool, sorted scores [D])."""
    dtind = np.argsort(-dt_scores, kind="mergesort")[:max_dets]
    db = dt_boxes[dtind]
    ds = dt_scores[dtind]
    ious = iou_xyxy(db, gt_boxes)
    T, D, G = len(IOU_THRS), len(db), len(gt_boxes)
    gtm = np.zeros((T, G), np.int64)
    dtm = np.zeros((T, D), np.int64)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0:
                    continue
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
    return dtm > 0, ds


def cocoeval(predictions, ground_truths, num_classes, max_dets=100):
    """Full pipeline; returns {'mAP50', 'mAP50_95', 'precision_tk'}.

    predictions/ground_truths use evaluation.py's contract (per-image dicts
    with 'boxes' xyxy / 'classes' / 'scores'). precision_tk is the raw
    [T, R, K] COCOeval precision array (-1 where undefined).
    """
    T, R, K = len(IOU_THRS), len(REC_THRS), num_classes
    precision = -np.ones((T, R, K))
    for k in range(K):
        per_img = []
        npig = 0
        for pred, gt in zip(predictions, ground_truths):
            pm = np.asarray(pred["classes"]) == k
            gm = np.asarray(gt["classes"]) == k
            db = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)[pm]
            ds = np.asarray(pred["scores"], np.float64)[pm]
            gb = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[gm]
            npig += len(gb)
            per_img.append(evaluate_img(db, ds, gb, max_dets))
        if npig == 0:
            continue
        dt_scores = np.concatenate([s for _, s in per_img])
        inds = np.argsort(-dt_scores, kind="mergesort")
        tps = np.concatenate([m for m, _ in per_img], axis=1)[:, inds]
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(~tps, axis=1).astype(np.float64)
        for t in range(T):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros(R)
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds2 = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(inds2):
                if pi >= nd:
                    break
                q[ri] = pr[pi]
            precision[t, :, k] = q
    valid = precision > -1
    map_all = float(precision[valid].mean()) if valid.any() else 0.0
    v50 = precision[0][valid[0]]
    map50 = float(v50.mean()) if v50.size else 0.0
    return {"mAP50": map50, "mAP50_95": map_all, "precision_tk": precision}
