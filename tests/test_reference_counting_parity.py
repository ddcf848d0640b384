"""Counting/geometry parity against the ACTUAL reference implementation.

Imports utilities/counting from the read-only reference mount and compares
point-in-polygon, bbox-corner intersection, cosine direction matching, and
the CSV writer against this framework's vectorized versions on randomized
inputs. Skipped when the reference isn't mounted.
"""

import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "utilities", "counting")),
    reason="reference repo not mounted",
)


@pytest.fixture(scope="module")
def ref_counting():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, path in [
        ("utilities", os.path.join(REF, "utilities")),
        ("utilities.counting", os.path.join(REF, "utilities", "counting")),
    ]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    import utilities.counting.bb_polygon as bb
    import utilities.counting.utils as cutils

    return bb, cutils


def _rand_polygon(rng, n_pts):
    # star-convex random polygon (valid, possibly non-convex)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
    radii = rng.uniform(30, 100, n_pts)
    cx, cy = rng.uniform(100, 200, 2)
    return [[float(cx + r * np.cos(a)), float(cy + r * np.sin(a))] for a, r in zip(angles, radii)]


def test_point_in_polygon_matches_reference(ref_counting, rng):
    bb, _ = ref_counting
    from vehicle_counting_tpu.counting import points_in_polygon

    mismatches = 0
    total = 0
    for trial in range(10):
        poly = _rand_polygon(rng, int(rng.integers(3, 9)))
        pts = rng.uniform(0, 320, size=(50, 2))
        ours = points_in_polygon(poly, pts)
        for p, o in zip(pts, ours):
            want = bb.is_point_in_polygon(poly, [float(p[0]), float(p[1])])
            total += 1
            if bool(o) != bool(want):
                mismatches += 1
    # float-degenerate ray/vertex grazings can differ; must be ~never on
    # random continuous points
    assert mismatches == 0, f"{mismatches}/{total} disagreements"


def test_bbox_intersect_matches_reference(ref_counting, rng):
    bb, _ = ref_counting
    from vehicle_counting_tpu.counting import check_bbox_intersect_polygon

    for trial in range(10):
        poly = _rand_polygon(rng, int(rng.integers(3, 8)))
        for _ in range(20):
            x1, y1 = rng.uniform(0, 300, 2)
            w, h = rng.uniform(5, 120, 2)
            box = (float(x1), float(y1), float(x1 + w), float(y1 + h))
            want = bb.check_bbox_intersect_polygon(poly, box)
            got = check_bbox_intersect_polygon(poly, box)
            assert got == want, f"box {box} poly {poly}"


def test_cosine_similarity_matches_reference(ref_counting, rng):
    bb, _ = ref_counting
    from vehicle_counting_tpu.counting import cosin_similarity

    for _ in range(50):
        a = tuple(map(tuple, rng.uniform(0, 100, (2, 2))))
        b = tuple(map(tuple, rng.uniform(0, 100, (2, 2))))
        assert cosin_similarity(a, b) == pytest.approx(bb.cosin_similarity(a, b), rel=1e-9)


def test_direction_matcher_matches_reference(ref_counting, rng):
    _, cutils = ref_counting
    from vehicle_counting_tpu.counting import find_best_match_direction

    for _ in range(30):
        paths = {
            f"{i:02d}": rng.uniform(0, 500, (2, 2)).tolist() for i in range(1, 5)
        }
        vec = tuple(map(tuple, rng.uniform(0, 500, (2, 2))))
        assert find_best_match_direction(vec, paths) == cutils.find_best_match_direction(vec, paths)


def test_csv_writer_matches_reference(ref_counting, tmp_path, rng):
    _, cutils = ref_counting
    from vehicle_counting_tpu.counting import save_tracking_to_csv

    track_dict = [dict(), dict()]
    for label in range(2):
        for tid in range(1, 4):
            n = int(rng.integers(2, 6))
            boxes = [np.array(rng.integers(0, 500, 4)) for _ in range(n)]
            frames = sorted(rng.choice(np.arange(1, 50), size=n, replace=False).tolist())
            track_dict[label][tid] = {
                "boxes": boxes,
                "frames": frames,
                "color": (10, 20, 30),
                "direction": "01",
            }
    ours_p = str(tmp_path / "ours.csv")
    refs_p = str(tmp_path / "ref.csv")
    save_tracking_to_csv([dict(d) for d in track_dict], ours_p)
    cutils.save_tracking_to_csv(track_dict, refs_p)
    ours = pd.read_csv(ours_p)
    refs = pd.read_csv(refs_p)
    assert list(ours.columns) == list(refs.columns)
    for col in ["track_id", "frame_id", "label", "direction", "fframe", "lframe", "box"]:
        assert ours[col].tolist() == refs[col].tolist(), col
    # fpoint/lpoint numeric equality. Under numpy 2 the reference emits reprs
    # like "(np.float64(12.5), ...)" (it predates numpy 2) — parse tolerantly.
    import ast

    def parse(v):
        try:
            return ast.literal_eval(v)
        except ValueError:
            return eval(v, {"np": np})  # noqa: S307 - test-only, known content

    for col in ["fpoint", "lpoint"]:
        a = [parse(v) for v in ours[col]]
        b = [parse(v) for v in refs[col]]
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float))
