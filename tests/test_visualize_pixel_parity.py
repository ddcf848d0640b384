"""Pixel parity of the annotated second pass vs the reference's renderer.

Feeds the SAME counting CSV and the SAME source frames through our
counting/visualize.visualize_merged and the reference's visualize_merged
(utilities/counting/utils.py:299-331, imported from its read-only mount) and
requires byte-identical frames. Per-track colors are data in the shared CSV
(deterministic in our counter), so they carry through both renderers.
"""

import os
import sys

import cv2
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "utilities", "counting", "utils.py")),
    reason="reference repo not mounted",
)

sys.path.insert(0, os.path.dirname(__file__))
from test_reference_videocounting_parity import ref_video_counting  # noqa: F401 (fixture)

H, W, N_FRAMES = 720, 1280, 8


class _FakeReader:
    def __init__(self, frames_rgb):
        self.frames = frames_rgb

    def batches(self):
        ids = np.arange(1, len(self.frames) + 1)
        yield self.frames, ids, np.ones(len(self.frames), bool)


class _Collect:
    def __init__(self):
        self.frames = []

    def write_bgr(self, img):  # our writer surface
        self.frames.append(img.copy())

    def write(self, img):      # reference outvid surface
        self.frames.append(img.copy())


def _scenario_csv(tmp_path):
    from vehicle_counting_tpu.counting import VehicleCounter

    import json

    zone = {
        "shapes": [
            {"label": "zone", "points": [[100, 100], [1100, 100], [1100, 600], [100, 600]]},
            {"label": "direction01", "points": [[150, 350], [1050, 350]]},
            {"label": "direction02", "points": [[1050, 350], [150, 350]]},
        ]
    }
    zp = tmp_path / "camv.json"
    zp.write_text(json.dumps(zone))

    frames, tracks, labels, boxes = [], [], [], []
    # 3 tracks: two rightward (classes 0/1) ending at different frames, one
    # leftward; staggered lifetimes exercise the lframe counting rule and the
    # one-frame-delayed text
    specs = [
        (1, 0, 150, 300, 90, 0, 1, 6),
        (2, 1, 900, 420, -80, -10, 2, 8),
        (3, 0, 300, 200, 70, 20, 3, 7),
    ]
    for tid, label, x0, y0, vx, vy, f0, f1 in specs:
        for t, fid in enumerate(range(f0, f1 + 1)):
            x, y = x0 + vx * t, y0 + vy * t
            frames.append(fid)
            tracks.append(tid)
            labels.append(label)
            boxes.append([x, y, x + 90, y + 60])

    counter = VehicleCounter(["car", "truck"], str(zp))
    csv_path = str(tmp_path / "camv.csv")
    counter.run(frames, tracks, labels, np.asarray(boxes, np.float64), output_path=csv_path)
    return csv_path, counter


def test_second_pass_pixels_match_reference(ref_video_counting, tmp_path, rng):
    from vehicle_counting_tpu.counting.visualize import visualize_merged

    ref_utils = sys.modules["utilities.counting"]

    csv_path, counter = _scenario_csv(tmp_path)
    frames_rgb = rng.integers(0, 255, (N_FRAMES, H, W, 3), np.uint8)

    ours = _Collect()
    visualize_merged(_FakeReader(frames_rgb), csv_path, counter.directions,
                     counter.polygons, 2, ours)

    # reference: same canvases (it draws on whatever channel order it gets)
    ref_batches = [{
        "ori_imgs": [cv2.cvtColor(f, cv2.COLOR_RGB2BGR) for f in frames_rgb],
        "frames": list(range(1, N_FRAMES + 1)),
    }]
    theirs = _Collect()
    ref_utils.visualize_merged(ref_batches, csv_path, counter.directions,
                               counter.polygons, 2, theirs)

    assert len(ours.frames) == len(theirs.frames) == N_FRAMES
    for i, (a, b) in enumerate(zip(ours.frames, theirs.frames)):
        if not np.array_equal(a, b):
            diff = np.argwhere(a != b)
            pytest.fail(
                f"frame {i + 1}: {len(diff)} differing pixels, first at "
                f"{diff[0].tolist()} ours={a[tuple(diff[0])]} ref={b[tuple(diff[0])]}"
            )


def test_count_dict_matches_reference_semantics(ref_video_counting, tmp_path, rng):
    """Our returned count dict == reference's (int keys, lframe rule)."""
    from vehicle_counting_tpu.counting.visualize import visualize_merged

    ref_utils = sys.modules["utilities.counting"]
    csv_path, counter = _scenario_csv(tmp_path)
    frames_rgb = rng.integers(0, 255, (N_FRAMES, H, W, 3), np.uint8)

    got = visualize_merged(_FakeReader(frames_rgb), csv_path, counter.directions,
                           counter.polygons, 2, _Collect())

    import pandas as pd

    df = pd.read_csv(csv_path)
    want = {int(d): {c: 0 for c in range(2)} for d in counter.directions}
    for _, row in df[df.lframe == df.frame_id].iterrows():
        want[int(row.direction)][int(row.label)] += 1
    assert got == want
    assert sum(sum(v.values()) for v in got.values()) == 3  # all tracks counted
