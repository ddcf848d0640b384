"""Full run.py path on CONVERTED checkpoints (VERDICT r3 next-2).

No egress exists here, so real COCO yolov5 `.pt` / ReID `ckpt.t7` files
cannot be downloaded. This test instead drives the COMPLETE pipeline —
weight conversion (stub-unpickler + BN-fold for the .pt, name-map for the
.t7), detect (autoshape letterbox geometry, thin content-row I420 upload),
ReID embed, per-class DeepSORT, zone counting, the 10-column CSV, and the
annotated-MP4 second pass — with byte-faithful FAKE checkpoints built the
way the real ones are shaped (fp16 pickled DetectionModel hub dict;
`{net_dict: ...}` t7). Every line a real checkpoint will touch on egress
day runs here; EGRESS_RUNBOOK.md holds the exact real-weights commands.

Reference call path being mirrored: run.py:33-48 -> CountingPipeline.run
(modules/__init__.py:28-101) with networks/yolo.py:58 (torch.hub load) and
networks/deepsort/deep/feature_extractor.py:13-14 (t7 load) replaced by the
converters.
"""

import json
import os
import sys
import types

import cv2
import numpy as np
import pandas as pd
import pytest
import torch

import jax

sys.path.insert(0, os.path.dirname(__file__))
from test_convert_ultralytics import _build_fake_checkpoint
from test_reid import TorchReidNet

from vehicle_counting_tpu.configs import Config, config_from_dict, default_cam_config, default_config
from vehicle_counting_tpu.pipeline import CountingPipeline

H, W, N_FRAMES = 240, 320, 16


@pytest.fixture(scope="module")
def fake_weights(tmp_path_factory):
    """(yolo .pt path, reid .t7 path) — both shaped like the real downloads."""
    tmp = tmp_path_factory.mktemp("weights")
    yolo_pt, _ = _build_fake_checkpoint(tmp, np.random.default_rng(1702))

    torch.manual_seed(7)
    net = TorchReidNet()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    reid_t7 = str(tmp / "ckpt.t7")
    # the reference trainer saves {net_dict, acc, epoch} (deep/train.py:144-156)
    torch.save({"net_dict": net.state_dict(), "acc": 0.5, "epoch": 3}, reid_t7)
    return yolo_pt, reid_t7


@pytest.fixture(scope="module")
def static_video(tmp_path_factory):
    """A textured STATIC video: identical frames -> identical detections ->
    IoU-1 associations -> confirmed tracks, even with fake weights."""
    tmp = tmp_path_factory.mktemp("video")
    path = str(tmp / "cam_rw.mp4")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 3)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (W, H))
    for _ in range(N_FRAMES):
        writer.write(img)
    writer.release()

    zone = {
        "shapes": [
            # margin past the frame: fake-weight boxes clip to the full frame
            # and the corner-in-polygon rule needs corners strictly inside
            {"label": "zone", "points": [[-5, -5], [W + 5, -5], [W + 5, H + 5], [-5, H + 5]]},
            {"label": "direction01", "points": [[0, H // 2], [W, H // 2]]},
            {"label": "direction02", "points": [[W, H // 2], [0, H // 2]]},
        ]
    }
    (tmp / "zones").mkdir()
    (tmp / "zones" / "cam_rw.json").write_text(json.dumps(zone))
    return path, str(tmp / "zones")


def _build_pipeline(fake_weights, static_video, tmp_path):
    yolo_pt, reid_t7 = fake_weights
    video_path, zone_dir = static_video
    cfg = config_from_dict(default_config(), {
        "detect_batch": 8, "max_tracks_per_class": 16, "image_size": [192, 192],
        "model_name": "yolov5n", "min_conf": 1e-4, "max_det": 8,
        "compute_dtype": "float32",
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zone_dir
    cam_cfg_dict["checkpoint"] = reid_t7
    cam_cfg_dict.setdefault("cam", {})["cam_rw"] = {
        "tracking_config": {"MIN_CONFIDENCE": 0.0, "N_INIT": 2, "MAX_AGE": 5}
    }
    cam_cfg = Config(_settings=cam_cfg_dict)
    args = types.SimpleNamespace(
        weight=yolo_pt, input_path=video_path, output_path=str(tmp_path / "out"),
        debug=False,
    )
    return CountingPipeline(args, cfg, cam_cfg), video_path


def test_converted_weights_are_what_runs(fake_weights, static_video, tmp_path):
    """The pipeline's params ARE the converted trees (no silent random init)."""
    from vehicle_counting_tpu.models.convert import load_yolov5_weights
    from vehicle_counting_tpu.models.reid import load_reid_weights

    pipe, _ = _build_pipeline(fake_weights, static_video, tmp_path)
    yolo_pt, reid_t7 = fake_weights

    want_yolo = load_yolov5_weights(yolo_pt)
    np.testing.assert_array_equal(
        np.asarray(pipe.yolo_params["0"]["w"]), np.asarray(want_yolo["0"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(pipe.yolo_params["24"]["m"][0]["b"]),
        np.asarray(want_yolo["24"]["m"][0]["b"]),
    )
    want_reid, want_stats = load_reid_weights(reid_t7)
    np.testing.assert_array_equal(
        np.asarray(pipe.reid_params["stem"]["w"]), np.asarray(want_reid["stem"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(pipe.reid_stats["layer4_1"]["bn2"]["var"]),
        np.asarray(want_stats["layer4_1"]["bn2"]["var"]),
    )
    # fake ckpt has nc=4 (<= 8): identity lut, no COCO mapping
    assert pipe.num_classes == 4


def test_convert_weights_cli_npz_equals_pt(fake_weights, tmp_path):
    """tools.convert_weights writes a state-dict .npz that loads IDENTICALLY
    to the original torch file — the torch-free serving-host path of
    EGRESS_RUNBOOK.md step 2."""
    from vehicle_counting_tpu.models.convert import load_yolov5_weights
    from vehicle_counting_tpu.models.reid import load_reid_weights
    from vehicle_counting_tpu.tools import convert_weights as cw

    yolo_pt, reid_t7 = fake_weights
    ynpz = str(tmp_path / "y.npz")
    rnpz = str(tmp_path / "r.npz")
    import sys as _sys

    argv = _sys.argv
    try:
        _sys.argv = ["convert_weights", "--kind", "yolov5", "--input", yolo_pt, "--output", ynpz]
        cw.main()
        _sys.argv = ["convert_weights", "--kind", "reid", "--input", reid_t7, "--output", rnpz]
        cw.main()
    finally:
        _sys.argv = argv

    a, b = load_yolov5_weights(ynpz), load_yolov5_weights(yolo_pt)
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    (pa, sa), (pb, sb) = load_reid_weights(rnpz), load_reid_weights(reid_t7)
    for got, want in ((pa, pb), (sa, sb)):
        lg, tg = jax.tree.flatten(got)
        lw, tw = jax.tree.flatten(want)
        assert tg == tw
        for x, y in zip(lg, lw):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_full_pipeline_with_converted_weights(fake_weights, static_video, tmp_path):
    """run_video end-to-end: detect (converted .pt) -> ReID (converted .t7)
    -> track -> count -> CSV + annotated MP4. Static frames make fake-weight
    detections repeat exactly, so tracks confirm and the CSV has rows."""
    pipe, video_path = _build_pipeline(fake_weights, static_video, tmp_path)
    # autoshape geometry in the real path: 240x320 @ 192 -> scale 0.6 ->
    # (144, 192) -> ceil to stride 32 -> (160, 192)
    assert pipe.net_hw((H, W)) == (160, 192)

    result = pipe.run_video(video_path, visualize=True)

    df = pd.read_csv(result["csv"])
    assert list(df.columns) == [
        "track_id", "frame_id", "box", "color", "label", "direction",
        "fpoint", "lpoint", "fframe", "lframe",
    ]
    # identical frames -> identical detections -> at least one confirmed track
    assert len(df) > 0
    assert df.frame_id.between(1, N_FRAMES).all()

    mp4 = os.path.join(str(tmp_path / "out"), "cam_rw.mp4")
    assert os.path.exists(mp4)
    cap = cv2.VideoCapture(mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == N_FRAMES
    cap.release()


@pytest.mark.slow
def test_detect_only_with_converted_weights(fake_weights, static_video, tmp_path):
    """run_video_detect_only (BASELINE config 1) on the converted .pt: same
    overlap/prefetch structure as run_video, detections CSV in source px."""
    pipe, video_path = _build_pipeline(fake_weights, static_video, tmp_path)
    result = pipe.run_video_detect_only(video_path)
    assert result["frames"] == N_FRAMES
    df = pd.read_csv(result["csv"])
    assert list(df.columns) == ["frame_id", "x1", "y1", "x2", "y2", "score", "label"]
    assert len(df) > 0
    assert (df.x2 <= W).all() and (df.y2 <= H).all()
    assert (df.x1 >= 0).all() and (df.y1 >= 0).all()
    # static video: every frame's detection set is identical
    per_frame = df.groupby("frame_id").size()
    assert per_frame.nunique() == 1
