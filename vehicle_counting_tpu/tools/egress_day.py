#!/usr/bin/env python
"""Egress-day validation — EGRESS_RUNBOOK.md as ONE executable command.

    python -m vehicle_counting_tpu.tools.egress_day \
        --yolo_pt .cache/yolov5s.pt --reid_t7 .cache/ckpt.t7 \
        --workdir out_egress \
        [--val_video cam.mp4 --gt val.json]           # step 2: accuracy \
        [--parity_video cam_04.mp4 --ref_csv ref_out/cam_04.csv]  # step 3 \
        [--config configs.yaml --cam_config cam_configs.yaml] \
        [--map50_min 0.85] [--strict]

Runs the runbook's steps in order and exits NONZERO if any executed step
fails its binary pass criterion:

  1. convert  — .pt/.t7 -> state-dict .npz; the npz must load IDENTICALLY
                to the torch original (bit-equal pytrees).
  2. val      — run.py --detect_only semantics on --val_video, scored with
                the upstream v6.0 val-harness semantics
                (evaluation.evaluate_yolov5_v6, the instrument behind
                /root/reference/README.md:50-53); PASS iff
                mAP@0.5 >= --map50_min.
  3. parity   — full counting pipeline on --parity_video; the produced CSV
                must field-equal --ref_csv (the torch reference's output on
                the same video+weights) on all columns except the by-design
                random `color` (SURVEY.md §7).

Steps whose inputs are absent are SKIPPED (reported; `--strict` turns any
skip into a failure). Dry-runnable today with the byte-faithful fake
checkpoints from tests/test_real_weights_path.py — tests/test_egress_day.py
drives exactly that and pins the exit codes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types
from typing import Dict, List, Optional, Tuple

import numpy as np


def _tree_equal(a, b) -> bool:
    import jax

    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    if ta != tb:
        return False
    return all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def step_convert(yolo_pt: str, reid_t7: Optional[str], workdir: str) -> Dict:
    """Runbook step 1: convert to torch-free .npz and verify load equality."""
    from vehicle_counting_tpu.models.convert import load_yolov5_weights
    from vehicle_counting_tpu.tools import convert_weights as cw

    os.makedirs(workdir, exist_ok=True)
    out: Dict = {"step": "convert", "ok": True, "detail": {}}

    ynpz = os.path.join(workdir, "yolo.npz")
    argv = sys.argv
    try:
        sys.argv = ["convert_weights", "--kind", "yolov5",
                    "--input", yolo_pt, "--output", ynpz]
        cw.main()
    finally:
        sys.argv = argv
    same = _tree_equal(load_yolov5_weights(ynpz), load_yolov5_weights(yolo_pt))
    out["detail"]["yolo_npz"] = ynpz
    out["detail"]["yolo_npz_equals_pt"] = bool(same)
    out["ok"] &= same

    if reid_t7:
        from vehicle_counting_tpu.models.reid import load_reid_weights

        rnpz = os.path.join(workdir, "reid.npz")
        try:
            sys.argv = ["convert_weights", "--kind", "reid",
                        "--input", reid_t7, "--output", rnpz]
            cw.main()
        finally:
            sys.argv = argv
        same = _tree_equal(load_reid_weights(rnpz), load_reid_weights(reid_t7))
        out["detail"]["reid_npz"] = rnpz
        out["detail"]["reid_npz_equals_t7"] = bool(same)
        out["ok"] &= same
    return out


def _make_pipeline(args, workdir: str, detect_only: bool = False):
    from vehicle_counting_tpu.configs import Config, default_cam_config, default_config

    config = Config(args.config) if args.config else default_config()
    cam_config = Config(args.cam_config) if args.cam_config else default_cam_config()
    if args.reid_t7:
        cam_config.checkpoint = args.reid_t7
    ns = types.SimpleNamespace(
        weight=args.yolo_pt,
        input_path="__resolved_per_step__",
        output_path=workdir,
        mapping_dict=None,
        debug=False,
        profile=None,
        check_numerics=False,
    )
    from vehicle_counting_tpu.pipeline import CountingPipeline

    return CountingPipeline(ns, config, cam_config)


def step_val(args, workdir: str) -> Dict:
    """Runbook step 2: detect-only CSV on the val video, scored with the
    upstream v6.0 harness semantics vs --gt."""
    from vehicle_counting_tpu.evaluation import _load_gt, _load_pred_csv, evaluate_yolov5_v6

    out: Dict = {"step": "val", "ok": True, "detail": {}}
    pipe = _make_pipeline(args, os.path.join(workdir, "val"))
    res = pipe.run_video_detect_only(args.val_video)
    out["detail"]["csv"] = res["csv"]
    out["detail"]["frames"] = res["frames"]

    preds = _load_pred_csv(res["csv"])
    gts = _load_gt(args.gt)
    empty_p = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0, np.int64),
               "scores": np.zeros(0)}
    empty_g = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0, np.int64)}
    frame_ids = sorted(set(preds) | set(gts))
    metrics = evaluate_yolov5_v6(
        [preds.get(f, empty_p) for f in frame_ids],
        [gts.get(f, empty_g) for f in frame_ids],
    )
    out["detail"]["metrics"] = {k: round(v, 5) for k, v in metrics.items()}
    out["detail"]["map50_min"] = args.map50_min
    out["ok"] = metrics["mAP50"] >= args.map50_min
    return out


def csv_parity(ref_csv: str, tpu_csv: str) -> Tuple[bool, Dict]:
    """Field-by-field diff of two 10-column tracking CSVs; `color` excluded
    (random per track by design). Returns (ok, detail)."""
    import pandas as pd

    a = pd.read_csv(ref_csv)
    b = pd.read_csv(tpu_csv)
    key = ["track_id", "frame_id"]
    m = a.merge(b, on=key, suffixes=("_ref", "_tpu"), how="outer",
                indicator=True)
    orphans = int((m["_merge"] != "both").sum())
    detail: Dict = {"rows_ref": len(a), "rows_tpu": len(b), "orphans": orphans}
    mismatches = {}
    for col in ("box", "label", "direction", "fpoint", "lpoint", "fframe",
                "lframe"):
        ca, cb = f"{col}_ref", f"{col}_tpu"
        if ca not in m or cb not in m:
            mismatches[col] = -1
            continue
        both = m[m["_merge"] == "both"]
        mismatches[col] = int((both[ca].astype(str) != both[cb].astype(str)).sum())
    detail["mismatches"] = mismatches
    ok = orphans == 0 and all(v == 0 for v in mismatches.values())
    return ok, detail


def step_parity(args, workdir: str) -> Dict:
    """Runbook step 3: full pipeline on the parity video; CSV must
    field-equal the torch reference's CSV (9 non-color columns)."""
    out: Dict = {"step": "parity", "ok": True, "detail": {}}
    pipe = _make_pipeline(args, os.path.join(workdir, "parity"))
    res = pipe.run_video(args.parity_video, visualize=False)
    out["detail"]["csv"] = res["csv"]
    ok, detail = csv_parity(args.ref_csv, res["csv"])
    out["detail"].update(detail)
    out["ok"] = ok
    return out


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        description="EGRESS_RUNBOOK.md as one command (nonzero exit on any "
                    "failed pass criterion)")
    p.add_argument("--yolo_pt", required=True, help="real yolov5 .pt (or .npz)")
    p.add_argument("--reid_t7", default=None, help="real ReID ckpt.t7 (or .npz)")
    p.add_argument("--workdir", required=True)
    p.add_argument("--val_video", default=None, help="step 2: validation video")
    p.add_argument("--gt", default=None,
                   help="step 2: ground truth (COCO json keyed by frame id, "
                        "or detections-schema CSV)")
    p.add_argument("--map50_min", type=float, default=0.85,
                   help="step 2 pass bar on mAP@0.5 (BASELINE.md: 0.91797 "
                        "for the published finetuned yolov5s@640; the "
                        "default leaves headroom because those checkpoints "
                        "were lost and COCO weights underperform the table)")
    p.add_argument("--parity_video", default=None, help="step 3: shared video")
    p.add_argument("--ref_csv", default=None,
                   help="step 3: the torch reference's CSV on the same "
                        "video+weights")
    p.add_argument("--config", default=None, help="configs.yaml override")
    p.add_argument("--cam_config", default=None, help="cam_configs.yaml override")
    p.add_argument("--strict", action="store_true",
                   help="treat skipped steps as failures")
    args = p.parse_args(argv)

    results: List[Dict] = []
    results.append(step_convert(args.yolo_pt, args.reid_t7, args.workdir))

    if args.val_video and args.gt:
        results.append(step_val(args, args.workdir))
    else:
        results.append({"step": "val", "ok": None,
                        "detail": {"skipped": "need --val_video and --gt"}})

    if args.parity_video and args.ref_csv:
        results.append(step_parity(args, args.workdir))
    else:
        results.append({"step": "parity", "ok": None,
                        "detail": {"skipped": "need --parity_video and --ref_csv"}})

    failed = 0
    for r in results:
        status = ("SKIP" if r["ok"] is None else ("PASS" if r["ok"] else "FAIL"))
        if r["ok"] is False or (args.strict and r["ok"] is None):
            failed += 1
        print(f"[egress] {r['step']:8s} {status}  {json.dumps(r['detail'])}")
    summary = {"steps": len(results), "failed": failed,
               "ok": failed == 0}
    print(json.dumps(summary))
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
