"""MultiCamCountingPipeline over the 8-device CPU mesh with 2 synthetic videos."""

import json
import os
import types

import cv2
import numpy as np
import pytest

from vehicle_counting_tpu.configs import Config, config_from_dict, default_cam_config, default_config
from vehicle_counting_tpu.parallel.mesh import make_mesh
from vehicle_counting_tpu.pipeline.multicam import MultiCamCountingPipeline

W, H, N = 128, 96, 12


def _make_video(path, seed):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (W, H))
    rng = np.random.default_rng(seed)
    for t in range(N):
        img = rng.integers(0, 80, size=(H, W, 3), dtype=np.uint8)
        writer.write(img)
    writer.release()


@pytest.fixture
def two_cams(tmp_path):
    vids = tmp_path / "vids"
    zones = tmp_path / "zones"
    vids.mkdir()
    zones.mkdir()
    for name, seed in [("cam_a1", 0), ("cam_a2", 1)]:
        _make_video(str(vids / f"{name}.mp4"), seed)
        zone = {
            "shapes": [
                {"label": "zone", "points": [[5, 5], [120, 5], [120, 90], [5, 90]]},
                {"label": "direction01", "points": [[10, 48], [110, 48]]},
            ]
        }
        (zones / f"{name}.json").write_text(json.dumps(zone))
    return str(vids), str(zones)


def _make_static_video(path, seed, n=N):
    """Identical textured frames -> identical per-frame detections, so the
    serial-vs-multicam comparison is not perturbed by decode jitter."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 2)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (W, H))
    for _ in range(n):
        writer.write(img)
    writer.release()


def _zone_json():
    return {
        "shapes": [
            # margin past the frame: fake-weight boxes clip to the frame
            # and the corner-in-polygon rule wants corners strictly inside
            {"label": "zone",
             "points": [[-5, -5], [W + 5, -5], [W + 5, H + 5], [-5, H + 5]]},
            {"label": "direction01", "points": [[10, 48], [110, 48]]},
        ]
    }


@pytest.fixture
def two_static_cams(tmp_path):
    vids = tmp_path / "vids"
    zones = tmp_path / "zones"
    vids.mkdir()
    zones.mkdir()
    for name, seed in [("cam_s1", 10), ("cam_s2", 11)]:
        _make_static_video(str(vids / f"{name}.mp4"), seed)
        (zones / f"{name}.json").write_text(json.dumps(_zone_json()))
    return str(vids), str(zones)


@pytest.fixture
def three_ragged_cams(tmp_path):
    """Three cameras with DIFFERENT lengths (and 3 cams on a 2-device mesh
    forces camera padding): exhausted cameras ride along masked."""
    vids = tmp_path / "vids"
    zones = tmp_path / "zones"
    vids.mkdir()
    zones.mkdir()
    for name, seed, n in [("cam_r1", 20, 8), ("cam_r2", 21, 12), ("cam_r3", 22, 20)]:
        _make_static_video(str(vids / f"{name}.mp4"), seed, n=n)
        (zones / f"{name}.json").write_text(json.dumps(_zone_json()))
    return str(vids), str(zones)


def test_multicam_pipeline_runs(two_cams, tmp_path):
    vids, zones = two_cams
    out = str(tmp_path / "out")
    cfg = config_from_dict(default_config(), {
        "detect_batch": 4, "max_tracks_per_class": 8, "image_size": [96, 96],
        "model_name": "yolov5n", "thin_upload": False, "min_conf": 0.9,
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zones
    args = types.SimpleNamespace(weight=None, input_path=vids, output_path=out,
                                 mapping_dict=None, debug=False)
    pipe = MultiCamCountingPipeline(args, cfg, Config(_settings=cam_cfg_dict),
                                    mesh=make_mesh(2, axis_names=("cam",)))
    results = pipe.run(visualize=False)
    assert len(results) == 2
    for r in results:
        assert os.path.exists(r["csv"])
        assert r["camera"].startswith("cam_a")


def test_multicam_per_camera_fault_isolation(two_cams, tmp_path):
    """One camera's missing zone file fails THAT camera only (serial loop's
    per-video isolation contract, SURVEY.md §5)."""
    vids, zones = two_cams
    os.remove(os.path.join(zones, "cam_a1.json"))
    # a third, unopenable video: fails alone at open time
    with open(os.path.join(vids, "cam_a3.mp4"), "wb"):
        pass
    out = str(tmp_path / "out")
    cfg = config_from_dict(default_config(), {
        "detect_batch": 4, "max_tracks_per_class": 8, "image_size": [96, 96],
        "model_name": "yolov5n", "thin_upload": False, "min_conf": 0.9,
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zones
    args = types.SimpleNamespace(weight=None, input_path=vids, output_path=out,
                                 mapping_dict=None, debug=False)
    pipe = MultiCamCountingPipeline(args, cfg, Config(_settings=cam_cfg_dict),
                                    mesh=make_mesh(2, axis_names=("cam",)))
    results = pipe.run(visualize=False)
    assert len(results) == 3
    by_cam = {r["camera"]: r for r in results}
    assert by_cam["cam_a1"]["csv"] is None and by_cam["cam_a1"].get("error")
    assert by_cam["cam_a3"]["csv"] is None and by_cam["cam_a3"].get("error")
    assert os.path.exists(by_cam["cam_a2"]["csv"])


def _pipeline_cfg(zones):
    cfg = config_from_dict(default_config(), {
        "detect_batch": 4, "max_tracks_per_class": 8, "image_size": [96, 96],
        "model_name": "yolov5n", "thin_upload": False, "min_conf": 0.05,
    })
    cam_cfg_dict = default_cam_config().to_dict()
    cam_cfg_dict["zone_path"] = zones
    return cfg, Config(_settings=cam_cfg_dict)


def test_multicam_matches_serial_csv(two_static_cams, tmp_path):
    """The camera-sharded path writes the SAME artifacts as the reference-
    shaped serial loop: per-camera CSVs field-equal (color excluded — random
    per track by design, SURVEY.md §7)."""
    import pandas as pd

    from vehicle_counting_tpu.pipeline import CountingPipeline

    vids, zones = two_static_cams
    out_s = str(tmp_path / "serial")
    out_m = str(tmp_path / "multicam")
    cfg, cam_cfg = _pipeline_cfg(zones)

    args_s = types.SimpleNamespace(weight=None, input_path=vids, output_path=out_s,
                                   mapping_dict=None, debug=False)
    serial = CountingPipeline(args_s, cfg, cam_cfg)
    res_s = serial.run(visualize=False)
    assert all(r.get("csv") for r in res_s)

    args_m = types.SimpleNamespace(weight=None, input_path=vids, output_path=out_m,
                                   mapping_dict=None, debug=False)
    pipe = MultiCamCountingPipeline(args_m, cfg, cam_cfg,
                                    mesh=make_mesh(2, axis_names=("cam",)))
    res_m = pipe.run(visualize=False)
    assert len(res_m) == len(res_s) == 2

    compared_rows = 0
    for cam in ("cam_s1", "cam_s2"):
        a = pd.read_csv(os.path.join(out_s, cam + ".csv"))
        b = pd.read_csv(os.path.join(out_m, cam + ".csv"))
        cols = [c for c in a.columns if c != "color"]
        pd.testing.assert_frame_equal(a[cols], b[cols])
        compared_rows += len(a)
    # random-init yolov5n at min_conf 0.05 on textured static frames must
    # produce tracks, or this test compared empty files
    assert compared_rows > 0


def test_multicam_ragged_lengths_match_serial(three_ragged_cams, tmp_path):
    """Unequal video lengths + cameras not a multiple of the mesh size:
    per-camera CSVs still field-equal to the serial loop."""
    import pandas as pd

    from vehicle_counting_tpu.pipeline import CountingPipeline

    vids, zones = three_ragged_cams
    out_s = str(tmp_path / "serial")
    out_m = str(tmp_path / "multicam")
    cfg, cam_cfg = _pipeline_cfg(zones)

    args_s = types.SimpleNamespace(weight=None, input_path=vids, output_path=out_s,
                                   mapping_dict=None, debug=False)
    res_s = CountingPipeline(args_s, cfg, cam_cfg).run(visualize=False)
    assert all(r.get("csv") for r in res_s)

    args_m = types.SimpleNamespace(weight=None, input_path=vids, output_path=out_m,
                                   mapping_dict=None, debug=False)
    pipe = MultiCamCountingPipeline(args_m, cfg, cam_cfg,
                                    mesh=make_mesh(2, axis_names=("cam",)))
    res_m = pipe.run(visualize=False)
    assert len(res_m) == len(res_s) == 3

    compared_rows = 0
    for cam in ("cam_r1", "cam_r2", "cam_r3"):
        a = pd.read_csv(os.path.join(out_s, cam + ".csv"))
        b = pd.read_csv(os.path.join(out_m, cam + ".csv"))
        cols = [c for c in a.columns if c != "color"]
        pd.testing.assert_frame_equal(a[cols], b[cols])
        compared_rows += len(a)
    assert compared_rows > 0
    # the short camera must not gain rows past its own last frame
    short = pd.read_csv(os.path.join(out_m, "cam_r1.csv"))
    if len(short):
        assert short["frame_id"].max() <= 8


def test_multicam_per_camera_params_match_serial(two_static_cams, tmp_path):
    """Cameras with DIFFERENT tracking_config (the reference's per-video
    DeepSORT params) group into separate compiled programs; each camera's CSV
    still field-equal to the serial loop that honors its own params."""
    import pandas as pd

    from vehicle_counting_tpu.pipeline import CountingPipeline

    vids, zones = two_static_cams
    out_s = str(tmp_path / "serial")
    out_m = str(tmp_path / "multicam")
    cfg, cam_cfg = _pipeline_cfg(zones)
    # diverge the two cameras' params: N_INIT changes when tracks confirm
    # (rows appear), MAX_IOU_DISTANCE changes gating
    cam_dict = cam_cfg.to_dict()
    base_tc = dict(cam_dict["cam"]["default"]["tracking_config"])
    tc1 = dict(base_tc, N_INIT=1)
    tc2 = dict(base_tc, N_INIT=4, MAX_IOU_DISTANCE=0.9)
    cam_dict["cam"]["cam_s1"] = {"tracking_config": tc1}
    cam_dict["cam"]["cam_s2"] = {"tracking_config": tc2}
    cam_cfg = Config(_settings=cam_dict)

    args_s = types.SimpleNamespace(weight=None, input_path=vids, output_path=out_s,
                                   mapping_dict=None, debug=False)
    CountingPipeline(args_s, cfg, cam_cfg).run(visualize=False)

    args_m = types.SimpleNamespace(weight=None, input_path=vids, output_path=out_m,
                                   mapping_dict=None, debug=False)
    pipe = MultiCamCountingPipeline(args_m, cfg, cam_cfg,
                                    mesh=make_mesh(2, axis_names=("cam",)))
    res_m = pipe.run(visualize=False)
    assert len(res_m) == 2

    compared_rows = 0
    for cam in ("cam_s1", "cam_s2"):
        a = pd.read_csv(os.path.join(out_s, cam + ".csv"))
        b = pd.read_csv(os.path.join(out_m, cam + ".csv"))
        cols = [c for c in a.columns if c != "color"]
        pd.testing.assert_frame_equal(a[cols], b[cols])
        compared_rows += len(a)
    assert compared_rows > 0


def test_multicam_mixed_geometry_groups(tmp_path):
    """Videos with different frame sizes split into per-geometry groups and
    all produce artifacts (one compiled program per group)."""
    vids = tmp_path / "vids"
    zones = tmp_path / "zones"
    vids.mkdir()
    zones.mkdir()
    # one camera at (W,H), one at a smaller geometry
    _make_static_video(str(vids / "cam_g1.mp4"), 30)
    small = cv2.VideoWriter(str(vids / "cam_g2.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (96, 64))
    rng = np.random.default_rng(31)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8), (5, 5), 2)
    for _ in range(8):
        small.write(img)
    small.release()
    for name in ("cam_g1", "cam_g2"):
        (zones / f"{name}.json").write_text(json.dumps(_zone_json()))
    out = str(tmp_path / "out")
    cfg, cam_cfg = _pipeline_cfg(str(zones))
    args = types.SimpleNamespace(weight=None, input_path=str(vids), output_path=out,
                                 mapping_dict=None, debug=False)
    pipe = MultiCamCountingPipeline(args, cfg, cam_cfg,
                                    mesh=make_mesh(2, axis_names=("cam",)))
    results = pipe.run(visualize=False)
    assert len(results) == 2
    for r in results:
        assert r.get("csv") and os.path.exists(r["csv"]), r


def test_run_cli_multicam(two_cams, tmp_path, monkeypatch):
    """run.py --multicam end-to-end through main()."""
    import importlib.util

    vids, zones = two_cams
    out = str(tmp_path / "cli_out")
    cfg, cam_cfg = _pipeline_cfg(zones)
    # config files are resolved by main()'s caller; pass objects directly
    spec = importlib.util.spec_from_file_location(
        "vct_run_cli", os.path.join(os.path.dirname(__file__), "..", "run.py"))
    run_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_mod)
    args = run_mod.parser.parse_args(
        ["--input_path", vids, "--output_path", out, "--multicam", "--no_visualize"])
    results = run_mod.main(args, cfg, cam_cfg)
    assert len(results) == 2
    for r in results:
        assert os.path.exists(r["csv"])


def _load_run_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vct_run_cli_flags", os.path.join(os.path.dirname(__file__), "..", "run.py"))
    run_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_mod)
    return run_mod


def test_run_cli_multicam_detect_only_rejected(tmp_path):
    """--multicam with --detect_only must fail LOUDLY (it used to fall
    silently through to the serial detect-only loop)."""
    run_mod = _load_run_module()
    args = run_mod.parser.parse_args(
        ["--input_path", str(tmp_path), "--output_path", str(tmp_path),
         "--multicam", "--detect_only"])
    with pytest.raises(SystemExit, match="incompatible"):
        run_mod.main(args, default_config(), default_cam_config())


def test_run_cli_frame_parallel_batch_divisibility_enforced(tmp_path):
    """--frame_parallel errors early when detect_batch is not divisible by
    the device count (8-device CPU mesh here, detect_batch=6)."""
    run_mod = _load_run_module()
    cfg = config_from_dict(default_config(), {"detect_batch": 6})
    args = run_mod.parser.parse_args(
        ["--input_path", str(tmp_path), "--output_path", str(tmp_path),
         "--frame_parallel"])
    with pytest.raises(SystemExit, match="divisible"):
        run_mod.main(args, cfg, default_cam_config())
