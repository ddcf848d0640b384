import json

import numpy as np
import pandas as pd
import pytest

from vehicle_counting_tpu.counting import (
    CSV_COLUMNS,
    VehicleCounter,
    assign_directions,
    count_directions,
    find_best_match_direction,
    load_zone_anno,
    save_tracking_to_csv,
)


@pytest.fixture
def zone_json(tmp_path):
    anno = {
        "version": "4.5.4",
        "shapes": [
            {"label": "zone", "points": [[0, 0], [100, 0], [100, 100], [0, 100]]},
            {"label": "direction01", "points": [[0, 50], [100, 50]]},   # east
            {"label": "direction02", "points": [[50, 0], [50, 100]]},   # south (+y)
        ],
    }
    p = tmp_path / "cam_test.json"
    p.write_text(json.dumps(anno))
    return str(p)


def test_load_zone_anno(zone_json):
    zone, directions = load_zone_anno(zone_json)
    assert zone == [[0, 0], [100, 0], [100, 100], [0, 100]]
    assert set(directions) == {"01", "02"}
    assert directions["01"] == [[0, 50], [100, 50]]


def test_find_best_match_direction(zone_json):
    _, directions = load_zone_anno(zone_json)
    # moving east -> direction01
    assert find_best_match_direction(((0, 0), (10, 0)), directions) == "01"
    # moving down (+y) -> direction02
    assert find_best_match_direction(((0, 0), (0, 10)), directions) == "02"
    # moving west: all scores <= 0 -> first key wins (reference default rule)
    assert find_best_match_direction(((10, 0), (0, 0)), directions) == "01"


def test_assign_directions_batch(zone_json):
    _, directions = load_zone_anno(zone_json)
    vecs = np.array([[10, 0], [0, 10], [-10, 0], [7, 7]])
    got = assign_directions(vecs, directions)
    assert got == ["01", "02", "01", "01"]  # diagonal ties -> first key by strict >


def test_counter_end_to_end(zone_json, tmp_path):
    counter = VehicleCounter(["car", "truck"], zone_json)
    # track 1 (car) crosses zone west->east; track 2 (truck) moves north->south;
    # track 3 (car) entirely outside the zone -> dropped.
    frames, tracks, labels, boxes = [], [], [], []
    for i, x in enumerate([10, 30, 50, 70, 90]):
        frames.append(i + 1)
        tracks.append(1)
        labels.append(0)
        boxes.append([x, 40, x + 10, 60])
    for i, y in enumerate([10, 40, 80]):
        frames.append(i + 1)
        tracks.append(2)
        labels.append(1)
        boxes.append([45, y, 55, y + 10])
    for i in range(3):
        frames.append(i + 1)
        tracks.append(3)
        labels.append(0)
        boxes.append([200 + i, 200, 210 + i, 210])

    out_csv = str(tmp_path / "out.csv")
    track_dict = counter.run(frames, tracks, labels, boxes, out_csv)

    assert set(track_dict[0].keys()) == {1}
    assert set(track_dict[1].keys()) == {2}
    assert track_dict[0][1]["direction"] == "01"
    assert track_dict[1][2]["direction"] == "02"

    df = pd.read_csv(out_csv)
    assert list(df.columns) == CSV_COLUMNS
    assert len(df) == 5 + 3  # zone-filtered rows only
    car = df[df.track_id == 1]
    assert car.frame_id.tolist() == [1, 2, 3, 4, 5]
    assert (car.fframe == 1).all() and (car.lframe == 5).all()
    # fpoint/lpoint are first/last box centers
    assert car.fpoint.iloc[0] == "(15.0, 50.0)"
    assert car.lpoint.iloc[0] == "(95.0, 50.0)"

    counts = count_directions(df, num_classes=2)
    assert counts["01"].tolist() == [1, 0]
    assert counts["02"].tolist() == [0, 1]


def test_save_tracking_schema_direct(tmp_path):
    td = [
        {
            7: {
                "boxes": [np.array([0, 0, 10, 10]), np.array([10, 10, 20, 20])],
                "frames": [3, 4],
                "color": (1, 2, 3),
                "direction": "01",
            }
        }
    ]
    df = save_tracking_to_csv(td, str(tmp_path / "t.csv"))
    assert list(df.columns) == CSV_COLUMNS
    assert df.box.iloc[0] == [0, 0, 10, 10]
    assert df.fframe.tolist() == [3, 3]
    assert df.lframe.tolist() == [4, 4]
