"""Frame-parallel single-camera step (parallel/frames.py) on the CPU mesh.

The detect+embed front is frame-independent, so sharding the batch over a
mesh 'frame' axis and running the recurrent tracker scan on the gathered
results must match the single-device fused step run at detect_batch = B/n
with states chained: discrete outputs (classes, valid, track IDs, masks)
EQUAL, floats to elementwise-fusion ULPs (XLA fuses the decode/restore
tails differently across program boundaries — measured ~1e-5 — and convs
are additionally not bitwise across batch EXTENTS, the same dials as
changing detect_batch on one device; see parallel/frames.py docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import init_reid
from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
from vehicle_counting_tpu.parallel import make_framedp_step, make_mesh
from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

H = W = 96
KW = dict(image_size=(96, 96), src_hw=(H, W), max_det=16, conf_thres=0.0,
          dtype=jnp.float32)


def _setup(rng, n_batches=2, b=8):
    ycfg = YoloConfig(variant="yolov5n", num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(0), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=8, budget=4, max_age=4, n_init=2),
        num_classes=2,
        min_confidence=0.0,  # random weights: admit whatever decodes
    )
    # fold all 80 detector classes onto the 2 tracked classes so the random
    # weights actually exercise the tracker (a 2-of-80 lut drops ~97% of dets)
    lut = jnp.arange(80, dtype=jnp.int32) % 2
    frames = jnp.asarray(
        rng.integers(0, 255, size=(n_batches, b, H, W, 3), dtype=np.uint8)
    )
    return ycfg, yolo_params, reid_params, reid_stats, hp, lut, frames


def _tree_equal(a, b):
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def _tree_close(a, b, atol):
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        xa, xb = np.asarray(xa), np.asarray(xb)
        if xa.dtype.kind in "fc":
            np.testing.assert_allclose(xa, xb, atol=atol, rtol=0)
        else:
            np.testing.assert_array_equal(xa, xb)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_framedp_matches_chained_small_batches(rng, n_dev):
    """framedp(n shards of B/n) == single-device step at batch B/n, chained:
    discrete outputs equal, floats to fusion ULPs — including carried
    tracker state and masked tail frames."""
    ycfg, yolo_params, reid_params, reid_stats, hp, lut, frames = _setup(rng)
    b = frames.shape[1]
    bl = b // n_dev
    mesh = make_mesh(n_dev, axis_names=("frame",))
    step = make_framedp_step(
        mesh, ycfg=ycfg, hp=hp, iou_thres=0.45, **KW
    )

    # masked tail frames in the second batch (last batch of a video)
    valids = [jnp.ones((b,), bool), jnp.arange(b) < b - 3]

    st_ref = init_states(hp)
    st_fp = init_states(hp)
    for i in range(frames.shape[0]):
        # reference: the same frames through the single-device step at the
        # per-shard batch size, states chained across sub-batches
        det_parts, touts_parts = [], []
        for j in range(n_dev):
            st_ref, det_j, touts_j = pipeline_batch_step(
                yolo_params, reid_params, reid_stats, st_ref,
                frames[i, j * bl:(j + 1) * bl], valids[i][j * bl:(j + 1) * bl],
                lut, ycfg=ycfg, hp=hp, iou_thres=0.45, **KW
            )
            det_parts.append(det_j)
            touts_parts.append(touts_j)
        det_ref = {
            k: jnp.concatenate([d[k] for d in det_parts]) for k in det_parts[0]
        }
        touts_ref = jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *touts_parts
        )

        st_fp, det_fp, touts_fp = step(
            yolo_params, reid_params, reid_stats, lut, st_fp, frames[i],
            valids[i],
        )
        _tree_close(det_ref, det_fp, atol=1e-4)
        _tree_close(touts_ref, touts_fp, atol=1e-3)
        _tree_close(st_ref, st_fp, atol=1e-3)
    # the run produced actual tracks (not a vacuous all-empty comparison)
    assert np.asarray(touts_ref.mask).sum() > 0 or np.asarray(st_ref.next_id).max() > 1


def test_framedp_close_to_full_batch_single_device(rng):
    """Versus the FULL-batch single-device step the difference is conv
    batch-extent ULPs only (same dial as changing detect_batch)."""
    ycfg, yolo_params, reid_params, reid_stats, hp, lut, frames = _setup(
        rng, n_batches=1
    )
    b = frames.shape[1]
    valid = jnp.ones((b,), bool)
    mesh = make_mesh(4, axis_names=("frame",))
    step = make_framedp_step(mesh, ycfg=ycfg, hp=hp, iou_thres=0.45, **KW)
    st_ref, det_ref, _ = pipeline_batch_step(
        yolo_params, reid_params, reid_stats, init_states(hp), frames[0],
        valid, lut, ycfg=ycfg, hp=hp, iou_thres=0.45, **KW
    )
    st_fp, det_fp, _ = step(
        yolo_params, reid_params, reid_stats, lut, init_states(hp), frames[0],
        valid,
    )
    _tree_close(det_ref, det_fp, atol=1e-4)


def test_frame_parallel_pipeline_csv_matches_serial(rng, tmp_path):
    """CountingPipeline with config frame_parallel=True (frames sharded over
    the 8-device CPU mesh) writes a CSV field-equal to the serial single-
    device run (color excluded — random per track by design)."""
    import json
    import os
    import types

    import cv2
    import pandas as pd

    from vehicle_counting_tpu.configs import (
        Config,
        config_from_dict,
        default_cam_config,
        default_config,
    )
    from vehicle_counting_tpu.pipeline import CountingPipeline

    vids = tmp_path / "vids"
    zones = tmp_path / "zones"
    vids.mkdir()
    zones.mkdir()
    # static textured frames -> identical per-frame detections per run
    img = cv2.GaussianBlur(
        rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8), (5, 5), 2
    )
    writer = cv2.VideoWriter(
        str(vids / "cam_f1.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (W, H)
    )
    for _ in range(12):  # 2 batches at detect_batch=8, masked tail
        writer.write(img)
    writer.release()
    zone = {"shapes": [
        {"label": "zone",
         "points": [[-5, -5], [W + 5, -5], [W + 5, H + 5], [-5, H + 5]]},
        {"label": "direction01", "points": [[10, 48], [86, 48]]},
    ]}
    (zones / "cam_f1.json").write_text(json.dumps(zone))

    def run(out, frame_parallel):
        cfg = config_from_dict(default_config(), {
            "detect_batch": 8, "max_tracks_per_class": 8,
            "image_size": [96, 96], "model_name": "yolov5n",
            "thin_upload": False, "min_conf": 0.05,
            # f32: bf16 batch-extent reassociation (~1e-3) flips marginal
            # random-weight detections between programs; f32 deltas are ~1e-7
            "compute_dtype": "float32",
            "frame_parallel": frame_parallel,
        })
        cam_cfg_dict = default_cam_config().to_dict()
        cam_cfg_dict["zone_path"] = str(zones)
        args = types.SimpleNamespace(
            weight=None, input_path=str(vids), output_path=out,
            mapping_dict=None, debug=False,
        )
        res = CountingPipeline(args, cfg, Config(_settings=cam_cfg_dict)).run(
            visualize=False
        )
        assert res[0].get("csv"), res
        return pd.read_csv(res[0]["csv"])

    a = run(str(tmp_path / "serial"), False)
    b = run(str(tmp_path / "framedp"), True)
    cols = [c for c in a.columns if c != "color"]
    pd.testing.assert_frame_equal(a[cols], b[cols])
    assert len(a) > 0  # non-vacuous


def test_frame_parallel_detect_only_csv(rng, tmp_path):
    """run_video_detect_only with frame_parallel: same detections as serial
    (discrete columns equal; float columns to conv batch-extent ULPs)."""
    import json
    import types

    import cv2
    import pandas as pd

    from vehicle_counting_tpu.configs import (
        Config,
        config_from_dict,
        default_cam_config,
        default_config,
    )
    from vehicle_counting_tpu.pipeline import CountingPipeline

    vids = tmp_path / "vids"
    vids.mkdir()
    img = cv2.GaussianBlur(
        rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8), (5, 5), 2
    )
    writer = cv2.VideoWriter(
        str(vids / "cam_d1.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (W, H)
    )
    for _ in range(12):
        writer.write(img)
    writer.release()

    def run(out, frame_parallel):
        cfg = config_from_dict(default_config(), {
            "detect_batch": 8, "max_tracks_per_class": 8,
            "image_size": [96, 96], "model_name": "yolov5n",
            "thin_upload": False, "min_conf": 0.05,
            # f32: bf16 batch-extent reassociation (~1e-3) flips marginal
            # random-weight detections between programs; f32 deltas are ~1e-7
            "compute_dtype": "float32",
            "frame_parallel": frame_parallel,
        })
        cam_cfg_dict = default_cam_config().to_dict()
        cam_cfg_dict["zone_path"] = str(tmp_path)
        args = types.SimpleNamespace(
            weight=None, input_path=str(vids), output_path=out,
            mapping_dict=None, debug=False,
        )
        pipe = CountingPipeline(args, cfg, Config(_settings=cam_cfg_dict))
        res = pipe.run_video_detect_only(str(vids / "cam_d1.mp4"))
        return pd.read_csv(res["csv"])

    a = run(str(tmp_path / "serial"), False)
    b = run(str(tmp_path / "framedp"), True)
    assert len(a) == len(b) > 0
    for col in ("frame_id", "label"):
        np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy())
    for col in ("x1", "y1", "x2", "y2", "score"):
        np.testing.assert_allclose(
            a[col].to_numpy(), b[col].to_numpy(), atol=1e-3, rtol=0
        )


def test_framedp_rejects_indivisible_batch(rng):
    ycfg, yolo_params, reid_params, reid_stats, hp, lut, frames = _setup(
        rng, n_batches=1, b=6
    )
    mesh = make_mesh(4, axis_names=("frame",))
    step = make_framedp_step(mesh, ycfg=ycfg, hp=hp, **KW)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        step(yolo_params, reid_params, reid_stats, lut, init_states(hp),
             frames[0], jnp.ones((6,), bool))
