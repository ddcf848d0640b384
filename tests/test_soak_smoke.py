"""Functional smoke of benchmarks/soak.py (the >=10k-frame on-chip soak
harness) at tiny scale on CPU: video generation, the sampling thread, the
all-classes LUT fold, CSV sanity checks, and the report contract."""

import importlib.util
import json
import os
import sys

import pytest


def _load_soak():
    spec = importlib.util.spec_from_file_location(
        "vct_soak", os.path.join(os.path.dirname(__file__), "..",
                                 "benchmarks", "soak.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_soak_harness_smoke(tmp_path):
    soak = _load_soak()
    out = str(tmp_path / "soak")
    argv = sys.argv
    try:
        sys.argv = ["soak.py", "--frames", "48", "--batch", "8",
                    "--variant", "yolov5n", "--image_size", "192",
                    "--out", out, "--sample_s", "2"]
        rc = soak.main()
    finally:
        sys.argv = argv
    assert rc == 0
    report = json.load(open(os.path.join(out, "soak_report.json")))
    assert report["ok"] and report["frames"] == 48
    assert report["csv_rows"] > 0
    assert report["rss_end_mb"] > 0
    assert all(report["checks"].values())


def test_soak_video_generator(tmp_path):
    import cv2

    soak = _load_soak()
    path = str(tmp_path / "v.mp4")
    soak.make_video(path, 12, h=120, w=160)
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    ok1, f1 = cap.read()
    ok2, f2 = cap.read()
    cap.release()
    assert ok1 and ok2
    # blobs move: consecutive frames differ
    assert (f1 != f2).any()
