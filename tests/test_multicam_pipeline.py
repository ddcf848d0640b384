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
