"""End-to-end pipeline integration on a synthetic video.

A white vehicle-sized rectangle drives across a zone; the detector is
replaced by a bright-region finder (SURVEY.md §4(d): counting integration
driven by a fake detector) while tracking, counting, CSV, and the annotated
second pass all run for real through CountingPipeline.run_video.
"""

import json
import os
import types

import cv2
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

import vehicle_counting_tpu.pipeline.step as step_mod
from vehicle_counting_tpu.configs import config_from_dict, default_cam_config, default_config, Config
from vehicle_counting_tpu.pipeline import CountingPipeline
from vehicle_counting_tpu.tracking.deepsort import deepsort_frame
from vehicle_counting_tpu.tracking.tracker import TrackerOutputs

W, H, N_FRAMES = 320, 240, 40


@pytest.fixture
def synthetic_video(tmp_path):
    path = str(tmp_path / "cam_t1.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 20.0, (W, H))
    for t in range(N_FRAMES):
        img = np.zeros((H, W, 3), np.uint8)
        x = 10 + t * 7
        cv2.rectangle(img, (x, 100), (x + 40, 130), (255, 255, 255), -1)
        writer.write(img)
    writer.release()

    zone = {
        "shapes": [
            {"label": "zone", "points": [[60, 60], [260, 60], [260, 180], [60, 180]]},
            {"label": "direction01", "points": [[60, 115], [260, 115]]},
            {"label": "direction02", "points": [[260, 115], [60, 115]]},
        ]
    }
    (tmp_path / "zones").mkdir()
    (tmp_path / "zones" / "cam_t1.json").write_text(json.dumps(zone))
    return path, str(tmp_path / "zones")


def fake_pipeline_batch_step(yolo_params, reid_params, reid_stats, states, frames,
                             frame_valid, class_lut, *, ycfg, hp, image_size, src_hw,
                             conf_thres, iou_thres, max_det, dtype, frames_format="raw_rgb"):
    """Bright-region 'detector' + the real jitted tracking stack."""
    f = np.asarray(frames)
    fv = np.asarray(frame_valid)
    b = f.shape[0]
    k = hp.tracker.capacity
    det_boxes = np.zeros((b, max_det, 4), np.float32)
    det_scores = np.zeros((b, max_det), np.float32)
    det_classes = np.full((b, max_det), -1, np.int32)
    det_valid = np.zeros((b, max_det), bool)
    outs = []
    for i in range(b):
        if fv[i]:
            ys, xs = np.where(f[i, :, :, 0] > 200)
            if len(xs) > 10:
                det_boxes[i, 0] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
                det_scores[i, 0] = 0.9
                det_classes[i, 0] = 1  # "car"
                det_valid[i, 0] = True
        n = max_det
        states, out = deepsort_frame(
            states, jnp.asarray(f[i]), jnp.asarray(det_boxes[i]),
            jnp.asarray(det_scores[i]), jnp.asarray(det_classes[i]),
            jnp.asarray(det_valid[i]), reid_params, reid_stats, hp,
        )
        outs.append(jax.tree.map(np.asarray, out))
    stacked = TrackerOutputs(
        boxes=jnp.asarray(np.stack([o.boxes for o in outs])),
        ids=jnp.asarray(np.stack([o.ids for o in outs])),
        scores=jnp.asarray(np.stack([o.scores for o in outs])),
        mask=jnp.asarray(np.stack([o.mask for o in outs])),
    )
    det = {
        "boxes": jnp.asarray(det_boxes),
        "scores": jnp.asarray(det_scores),
        "classes": jnp.asarray(det_classes),
        "valid": jnp.asarray(det_valid),
    }
    return states, det, stacked


def test_pipeline_end_to_end(synthetic_video, tmp_path, monkeypatch):
    video_path, zone_dir = synthetic_video
    monkeypatch.setattr(step_mod, "pipeline_batch_step", fake_pipeline_batch_step)

    out_dir = str(tmp_path / "out")
    cfg = config_from_dict(default_config(), {
        "detect_batch": 8, "max_tracks_per_class": 16, "image_size": [160, 160],
        "model_name": "yolov5n", "thin_upload": False,
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zone_dir
    cam_cfg = Config(_settings=cam_cfg_dict)

    args = types.SimpleNamespace(
        weight=None, input_path=video_path, output_path=out_dir,
        mapping_dict={0: 0, 1: 0, 2: 1, 3: 0, 5: 2, 7: 3}, debug=False,
    )
    pipe = CountingPipeline(args, cfg, cam_cfg)
    result = pipe.run_video(video_path, visualize=True)

    # CSV artifact with the exact schema
    assert os.path.exists(result["csv"])
    df = pd.read_csv(result["csv"])
    assert list(df.columns) == [
        "track_id", "frame_id", "box", "color", "label", "direction",
        "fpoint", "lpoint", "fframe", "lframe",
    ]
    assert len(df) > 10
    assert (df.track_id == 1).all()          # a single continuous track
    assert (df.label == 1).all()             # class 'car'
    assert df.frame_id.is_monotonic_increasing

    # the vehicle moved east -> direction01; counted exactly once
    counts = result["counts"]
    assert counts.get("01") is not None
    assert counts["01"][1] == 1
    assert sum(sum(v) for v in counts.values()) == 1

    # annotated MP4 second pass exists and has the right frame count
    mp4 = os.path.join(out_dir, "cam_t1.mp4")
    assert os.path.exists(mp4)
    cap = cv2.VideoCapture(mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == N_FRAMES
    cap.release()


def test_video_reader_batching(synthetic_video):
    from vehicle_counting_tpu.data import VideoReader

    video_path, _ = synthetic_video
    reader = VideoReader(video_path, batch_size=16)
    assert reader.video_info["width"] == W
    assert reader.video_info["num_frames"] == N_FRAMES
    total, batches = 0, 0
    last_valid = None
    for frames, ids, valid in reader.batches():
        assert frames.shape == (16, H, W, 3)
        total += int(valid.sum())
        batches += 1
        if valid.all():
            assert ids[0] == total - 16 + 1  # 1-based contiguous ids
        last_valid = valid
    assert total == N_FRAMES
    assert batches == 3
    assert last_valid[: N_FRAMES % 16].all() and not last_valid[N_FRAMES % 16 :].any()
    reader.release()


def test_observability_stage_timer_and_debug(synthetic_video, tmp_path, monkeypatch, capsys):
    """--debug wiring (VERDICT weak-2): StageTimer populates every pipeline
    stage and the per-stage table is printed; --check_numerics passes clean."""
    video_path, zone_dir = synthetic_video
    monkeypatch.setattr(step_mod, "pipeline_batch_step", fake_pipeline_batch_step)

    cfg = config_from_dict(default_config(), {
        "detect_batch": 8, "max_tracks_per_class": 16, "image_size": [160, 160],
        "model_name": "yolov5n", "thin_upload": False,
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zone_dir
    cam_cfg = Config(_settings=cam_cfg_dict)

    args = types.SimpleNamespace(
        weight=None, input_path=video_path, output_path=str(tmp_path / "out"),
        mapping_dict={0: 0, 1: 0, 2: 1, 3: 0, 5: 2, 7: 3},
        debug=True, check_numerics=True,
    )
    pipe = CountingPipeline(args, cfg, cam_cfg)
    try:
        result = pipe.run_video(video_path, visualize=True)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert os.path.exists(result["csv"])

    timer = pipe.last_timer
    assert timer is not None
    for stage in ("decode", "upload", "dispatch", "readback", "count", "visualize"):
        assert timer.counts.get(stage, 0) > 0, f"stage '{stage}' never timed"
    assert timer.totals["decode"] > 0

    out = capsys.readouterr().out
    assert "per-stage timing" in out
    assert "dispatch" in out


def test_profile_flag_writes_trace(synthetic_video, tmp_path, monkeypatch):
    """--profile captures a jax.profiler trace directory."""
    video_path, zone_dir = synthetic_video
    monkeypatch.setattr(step_mod, "pipeline_batch_step", fake_pipeline_batch_step)

    cfg = config_from_dict(default_config(), {
        "detect_batch": 8, "max_tracks_per_class": 16, "image_size": [160, 160],
        "model_name": "yolov5n", "thin_upload": False,
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zone_dir
    cam_cfg = Config(_settings=cam_cfg_dict)

    trace_dir = str(tmp_path / "trace")
    args = types.SimpleNamespace(
        weight=None, input_path=video_path, output_path=str(tmp_path / "out"),
        mapping_dict={0: 0, 1: 0, 2: 1, 3: 0, 5: 2, 7: 3},
        profile=trace_dir,
    )
    pipe = CountingPipeline(args, cfg, cam_cfg)
    pipe.run_video(video_path, visualize=False)
    # jax writes plugins/profile/<ts>/ under the log dir
    found = [p for p, _, files in os.walk(trace_dir) for f in files]
    assert found, "profiler trace produced no files"
