"""Dry-run of tools/egress_day.py — EGRESS_RUNBOOK.md as one executable
command — on the byte-faithful FAKE checkpoints (no egress here; the real
checkpoints follow the identical path on egress day).

Drives all three runbook steps end-to-end and pins the exit-code contract:
  * convert: .pt/.t7 -> .npz with bit-equal load-back;
  * val: detect-only CSV scored by the v6.0 harness against a GT that is
    the same pipeline's own detections (self-GT; NOT exactly 1.0 — the fake
    weights emit near-duplicate overlapping boxes and the v6.0 unique-dedup
    quirk demotes duplicate matches to FPs, measured mAP@0.5 ~= 0.83);
  * parity: full pipeline CSV field-equal to a "reference" CSV produced by
    the same deterministic run (color excluded by design);
  * failure paths: a corrupted reference CSV and --strict skips both exit
    nonzero.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))
from test_real_weights_path import fake_weights, static_video  # noqa: F401 (fixtures)

from vehicle_counting_tpu.tools import egress_day


def _write_configs(tmp_path, zone_dir, reid_t7):
    cfg = {
        "settings": {
            "detect_batch": 8,
            "max_tracks_per_class": 16,
            "image_size": [192, 192],
            "model_name": "yolov5n",
            "min_conf": 1e-4,
            "max_det": 8,
            "compute_dtype": "float32",
        }
    }
    cam = {
        "settings": {
            "zone_path": zone_dir,
            "checkpoint": reid_t7,
            "cam": {
                "cam_rw": {
                    "tracking_config": {
                        "MIN_CONFIDENCE": 0.0, "N_INIT": 2, "MAX_AGE": 5,
                    }
                }
            },
        }
    }
    cfg_path = str(tmp_path / "configs.yaml")
    cam_path = str(tmp_path / "cam_configs.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    with open(cam_path, "w") as f:
        yaml.safe_dump(cam, f)
    return cfg_path, cam_path


@pytest.mark.slow
def test_egress_day_dry_run_all_steps_pass(fake_weights, static_video, tmp_path):  # noqa: F811
    yolo_pt, reid_t7 = fake_weights
    video_path, zone_dir = static_video
    cfg_path, cam_path = _write_configs(tmp_path, zone_dir, reid_t7)

    # produce the self-GT detections CSV and the "reference" tracking CSV
    # with the same deterministic pipeline the tool will run
    args = egress_day.argparse.Namespace(
        yolo_pt=yolo_pt, reid_t7=reid_t7, config=cfg_path, cam_config=cam_path)
    pre = egress_day._make_pipeline(args, str(tmp_path / "pre"))
    gt_csv = pre.run_video_detect_only(video_path)["csv"]
    assert len(pd.read_csv(gt_csv)) > 0
    ref_csv = pre.run_video(video_path, visualize=False)["csv"]
    assert len(pd.read_csv(ref_csv)) > 0

    rc = egress_day.main([
        "--yolo_pt", yolo_pt, "--reid_t7", reid_t7,
        "--workdir", str(tmp_path / "work"),
        "--val_video", video_path, "--gt", gt_csv, "--map50_min", "0.5",
        "--parity_video", video_path, "--ref_csv", ref_csv,
        "--config", cfg_path, "--cam_config", cam_path,
    ])
    assert rc == 0


@pytest.mark.slow
def test_egress_day_fails_on_csv_mismatch(fake_weights, static_video, tmp_path):  # noqa: F811
    yolo_pt, reid_t7 = fake_weights
    video_path, zone_dir = static_video
    cfg_path, cam_path = _write_configs(tmp_path, zone_dir, reid_t7)

    args = egress_day.argparse.Namespace(
        yolo_pt=yolo_pt, reid_t7=reid_t7, config=cfg_path, cam_config=cam_path)
    pre = egress_day._make_pipeline(args, str(tmp_path / "pre"))
    ref_csv = pre.run_video(video_path, visualize=False)["csv"]
    df = pd.read_csv(ref_csv)
    assert len(df) > 0
    # corrupt one field the parity diff must catch
    df.loc[0, "label"] = 99
    bad_csv = str(tmp_path / "bad_ref.csv")
    df.to_csv(bad_csv, index=False)

    rc = egress_day.main([
        "--yolo_pt", yolo_pt, "--reid_t7", reid_t7,
        "--workdir", str(tmp_path / "work"),
        "--parity_video", video_path, "--ref_csv", bad_csv,
        "--config", cfg_path, "--cam_config", cam_path,
    ])
    assert rc == 1


def test_egress_day_strict_skips_fail(fake_weights, tmp_path):  # noqa: F811
    yolo_pt, reid_t7 = fake_weights
    rc = egress_day.main([
        "--yolo_pt", yolo_pt, "--reid_t7", reid_t7,
        "--workdir", str(tmp_path / "work"),
    ])
    assert rc == 0  # convert passes; val/parity skipped (non-strict)
    rc = egress_day.main([
        "--yolo_pt", yolo_pt, "--reid_t7", reid_t7,
        "--workdir", str(tmp_path / "work2"), "--strict",
    ])
    assert rc == 1


def test_csv_parity_helper_detects_orphans(tmp_path):
    a = pd.DataFrame({
        "track_id": [1, 2], "frame_id": [1, 1],
        "box": ["[0, 0, 2, 2]", "[1, 1, 3, 3]"], "color": ["a", "b"],
        "label": [0, 1], "direction": [1, 1],
        "fpoint": ["(0, 0)", "(1, 1)"], "lpoint": ["(2, 2)", "(3, 3)"],
        "fframe": [1, 1], "lframe": [2, 2],
    })
    b = a[a.track_id == 1]  # drop a row -> orphan
    pa, pb = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    a.to_csv(pa, index=False)
    b.to_csv(pb, index=False)
    ok, detail = egress_day.csv_parity(pa, pb)
    assert not ok and detail["orphans"] == 1
    ok, detail = egress_day.csv_parity(pa, pa)
    assert ok and detail["orphans"] == 0
