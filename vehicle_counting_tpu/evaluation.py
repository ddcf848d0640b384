"""Detection metrics: precision / recall / mAP@0.5 / mAP@0.5:0.95.

The reference publishes these four numbers per model (README.md:50-53,
BASELINE.md) but computed them with the upstream YOLOv5 val harness — this
module is the in-framework equivalent so accuracy parity can be measured
against real checkpoints. Standard COCO-style evaluation: greedy matching of
score-sorted predictions to ground truth per class per image at each IoU
threshold, 101-point interpolated AP.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

IOU_RANGE = np.arange(0.5, 1.0, 0.05)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def _match_image(pred_boxes, pred_scores, gt_boxes, iou_thr: float):
    """Greedy score-order matching; returns tp flags aligned to score order."""
    order = np.argsort(-pred_scores, kind="stable")
    iou = _iou_matrix(pred_boxes[order], gt_boxes)
    taken = np.zeros(len(gt_boxes), bool)
    tp = np.zeros(len(order), bool)
    for r in range(len(order)):
        if len(gt_boxes) == 0:
            break
        cand = np.where(~taken & (iou[r] >= iou_thr))[0]
        if len(cand):
            g = cand[np.argmax(iou[r][cand])]
            taken[g] = True
            tp[r] = True
    return tp, pred_scores[order]


def average_precision(tp: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
    """101-point interpolated AP from pooled (tp, score) pairs."""
    if n_gt == 0:
        return float("nan")
    if len(tp) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    r_pts = np.linspace(0, 1, 101)
    p_interp = np.zeros_like(r_pts)
    for i, r in enumerate(r_pts):
        idx = np.searchsorted(recall, r, side="left")
        p_interp[i] = precision[idx] if idx < len(precision) else 0.0
    return float(p_interp.mean())


def evaluate_detections(
    predictions: Sequence[Dict],
    ground_truths: Sequence[Dict],
    num_classes: int,
    conf_for_pr: float = 0.25,
) -> Dict[str, float]:
    """COCO-style detection metrics.

    predictions / ground_truths: one dict per image with
      'boxes' [N, 4] xyxy, 'classes' [N], and (preds only) 'scores' [N].

    Returns {'precision', 'recall', 'mAP50', 'mAP50_95'} — the reference's
    published metric set (README.md:50-53).
    """
    aps = {t: [] for t in IOU_RANGE}
    tp_at_conf = fp_at_conf = fn_at_conf = 0

    for c in range(num_classes):
        pooled = {t: ([], []) for t in IOU_RANGE}  # (tp list, score list)
        n_gt = 0
        for pred, gt in zip(predictions, ground_truths):
            pm = np.asarray(pred["classes"]) == c
            gm = np.asarray(gt["classes"]) == c
            pb = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)[pm]
            ps = np.asarray(pred["scores"], np.float64)[pm]
            gb = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[gm]
            n_gt += len(gb)
            for t in IOU_RANGE:
                tp, sc = _match_image(pb, ps, gb, t)
                pooled[t][0].append(tp)
                pooled[t][1].append(sc)
            # P/R at the reporting confidence and IoU 0.5
            keep = ps >= conf_for_pr
            tp50, _ = _match_image(pb[keep], ps[keep], gb, 0.5)
            tp_at_conf += int(tp50.sum())
            fp_at_conf += int((~tp50).sum())
            fn_at_conf += len(gb) - int(tp50.sum())
        for t in IOU_RANGE:
            tp_all = np.concatenate(pooled[t][0]) if pooled[t][0] else np.zeros(0, bool)
            sc_all = np.concatenate(pooled[t][1]) if pooled[t][1] else np.zeros(0)
            ap = average_precision(tp_all, sc_all, n_gt)
            if not np.isnan(ap):
                aps[t].append(ap)

    map50 = float(np.mean(aps[IOU_RANGE[0]])) if aps[IOU_RANGE[0]] else 0.0
    map_all = float(np.mean([np.mean(aps[t]) for t in IOU_RANGE if aps[t]])) if aps[IOU_RANGE[0]] else 0.0
    precision = tp_at_conf / max(tp_at_conf + fp_at_conf, 1)
    recall = tp_at_conf / max(tp_at_conf + fn_at_conf, 1)
    return {
        "precision": float(precision),
        "recall": float(recall),
        "mAP50": map50,
        "mAP50_95": map_all,
    }


# ---------------------------------------------------------------------------
# CLI: score a detections CSV (run.py --detect_only output) against ground
# truth, producing the reference's published metric set (README.md:50-53).
# ---------------------------------------------------------------------------

def _load_pred_csv(path: str) -> Dict[int, Dict]:
    """{frame_id: {'boxes','classes','scores'}} from the detect-only CSV
    (columns: frame_id, x1, y1, x2, y2, score, label)."""
    import pandas as pd

    df = pd.read_csv(path)
    out: Dict[int, Dict] = {}
    for fid, g in df.groupby("frame_id"):
        out[int(fid)] = {
            "boxes": g[["x1", "y1", "x2", "y2"]].to_numpy(np.float64),
            "classes": g["label"].to_numpy(np.int64),
            "scores": (
                g["score"].to_numpy(np.float64)
                if "score" in g
                else np.ones(len(g))
            ),
        }
    return out


def _load_gt(path: str) -> Dict[int, Dict]:
    """Ground truth from COCO json (image id keyed, xywh bboxes) or from a
    CSV with the same columns as the detections file (score optional)."""
    if path.endswith(".json"):
        import json

        with open(path) as f:
            coco = json.load(f)
        out = {int(img["id"]): {"boxes": [], "classes": []} for img in coco["images"]}
        for ann in coco["annotations"]:
            x, y, w, h = ann["bbox"]
            rec = out[int(ann["image_id"])]
            rec["boxes"].append([x, y, x + w, y + h])
            rec["classes"].append(int(ann["category_id"]))
        return {
            k: {
                "boxes": np.asarray(v["boxes"], np.float64).reshape(-1, 4),
                "classes": np.asarray(v["classes"], np.int64),
            }
            for k, v in out.items()
        }
    return _load_pred_csv(path)


def main(argv=None) -> Dict[str, float]:
    import argparse
    import json as _json

    ap = argparse.ArgumentParser(
        description="P/R/mAP50/mAP50:95 for a detections CSV vs ground truth"
    )
    ap.add_argument("--pred", required=True, help="detections CSV (run.py --detect_only)")
    ap.add_argument("--gt", required=True, help="ground truth: COCO json or CSV")
    ap.add_argument("--num_classes", type=int, default=4)
    ap.add_argument("--conf", type=float, default=0.25, help="P/R reporting confidence")
    args = ap.parse_args(argv)

    preds = _load_pred_csv(args.pred)
    gts = _load_gt(args.gt)
    empty_p = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0, np.int64),
               "scores": np.zeros(0)}
    empty_g = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0, np.int64)}
    frame_ids = sorted(set(preds) | set(gts))
    metrics = evaluate_detections(
        [preds.get(f, empty_p) for f in frame_ids],
        [gts.get(f, empty_g) for f in frame_ids],
        num_classes=args.num_classes,
        conf_for_pr=args.conf,
    )
    print(_json.dumps({k: round(v, 5) for k, v in metrics.items()}))
    return metrics


if __name__ == "__main__":
    main()
