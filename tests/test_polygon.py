import numpy as np
import pytest

from vehicle_counting_tpu.counting import (
    boxes_intersect_polygon,
    check_bbox_intersect_polygon,
    cosin_similarity,
    cosine_similarity_batch,
    is_point_in_polygon,
    points_in_polygon,
)

SQUARE = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
# Non-convex "L" shape
ELL = [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]]


def test_square_truth_table():
    pts = np.array(
        [
            [5, 5],      # interior
            [-1, 5],     # outside left
            [11, 5],     # outside right
            [5, -1],     # outside below
            [5, 11],     # outside above
            [0, 5],      # on left edge -> inside
            [10, 5],     # on right edge -> inside
            [5, 0],      # on bottom edge -> inside
            [0, 0],      # vertex -> inside
            [9.999, 9.999],  # interior near corner
        ]
    )
    expect = [True, False, False, False, False, True, True, True, True, True]
    assert points_in_polygon(SQUARE, pts).tolist() == expect


def test_nonconvex_ell():
    pts = np.array(
        [
            [2, 2],   # in the thick part
            [7, 2],   # in the arm
            [7, 7],   # in the notch -> outside
            [2, 7],   # in the vertical arm
            [4, 4],   # reflex vertex -> inside (on boundary)
            [5, 4],   # on notch edge -> inside
            [5, 4.001],  # just above notch edge -> outside
        ]
    )
    expect = [True, True, False, True, True, True, False]
    assert points_in_polygon(ELL, pts).tolist() == expect


def test_scalar_wrapper_matches_vector():
    assert is_point_in_polygon(SQUARE, (5, 5)) is True
    assert is_point_in_polygon(SQUARE, (15, 5)) is False


def test_vertex_ray_no_double_count():
    # A point directly below a vertex: the upward ray passes through the
    # vertex; the half-open rule must count exactly one crossing per side.
    diamond = [[5, 0], [10, 5], [5, 10], [0, 5]]
    assert is_point_in_polygon(diamond, (5, 5)) is True  # interior below top vertex
    assert is_point_in_polygon(diamond, (5, -1)) is False  # outside below bottom vertex


def test_boxes_intersect_polygon():
    boxes = np.array(
        [
            [2, 2, 4, 4],      # fully inside
            [8, 8, 12, 12],    # corner inside
            [12, 12, 14, 14],  # fully outside
            [-2, -2, -1, -1],  # fully outside
            [-1, -1, 1, 1],    # one corner inside
        ]
    )
    expect = [True, True, False, False, True]
    assert boxes_intersect_polygon(SQUARE, boxes).tolist() == expect
    for b, e in zip(boxes, expect):
        assert check_bbox_intersect_polygon(SQUARE, b) == e


def test_corner_only_rule_reproduced():
    # Reference quirk: a box strictly containing the polygon (all 4 corners
    # outside) does NOT intersect under the corner rule (bb_polygon.py:96-114).
    assert check_bbox_intersect_polygon(SQUARE, [-5, -5, 15, 15]) is False


def test_cosine_similarity_segments():
    a = ((0, 0), (1, 0))
    assert cosin_similarity(a, ((0, 0), (2, 0))) == pytest.approx(1.0)
    assert cosin_similarity(a, ((0, 0), (0, 3))) == pytest.approx(0.0)
    assert cosin_similarity(a, ((0, 0), (-1, 0))) == pytest.approx(-1.0)
    assert cosin_similarity(a, ((1, 1), (2, 2))) == pytest.approx(np.sqrt(2) / 2)


def test_cosine_batch_matches_scalar(rng):
    vecs = rng.normal(size=(6, 2))
    dirs = rng.normal(size=(3, 2))
    got = cosine_similarity_batch(vecs, dirs)
    for i in range(6):
        for j in range(3):
            want = cosin_similarity(((0, 0), tuple(vecs[i])), ((0, 0), tuple(dirs[j])))
            assert got[i, j] == pytest.approx(want)


def test_cosine_batch_zero_vector_never_wins():
    got = cosine_similarity_batch(np.zeros((1, 2)), np.array([[1.0, 0.0]]))
    assert got[0, 0] == -np.inf
