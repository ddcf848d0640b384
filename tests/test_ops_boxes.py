import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_counting_tpu.ops import (
    clip_boxes,
    cxcywh_to_xyxy,
    iou_matrix,
    sort_overlap_matrix,
    tlwh_to_xyxy,
    xyah_to_tlwh,
    xyxy_to_cxcywh,
    xyxy_to_tlwh,
)
from vehicle_counting_tpu.ops.boxes import tlwh_to_xyah


def test_roundtrips(rng):
    xy = rng.uniform(0, 100, size=(16, 2))
    wh = rng.uniform(1, 50, size=(16, 2))
    xyxy = np.concatenate([xy, xy + wh], axis=1)
    x = jnp.asarray(xyxy)
    np.testing.assert_allclose(tlwh_to_xyxy(xyxy_to_tlwh(x)), x, rtol=1e-6)
    np.testing.assert_allclose(cxcywh_to_xyxy(xyxy_to_cxcywh(x)), x, rtol=1e-5, atol=1e-4)
    tlwh = xyxy_to_tlwh(x)
    np.testing.assert_allclose(xyah_to_tlwh(tlwh_to_xyah(tlwh)), tlwh, rtol=1e-5, atol=1e-4)


def test_xyah_semantics():
    # tlwh (10, 20, 30, 60) -> center (25, 50), aspect 0.5, h 60
    got = np.asarray(tlwh_to_xyah(jnp.array([[10.0, 20.0, 30.0, 60.0]])))[0]
    np.testing.assert_allclose(got, [25.0, 50.0, 0.5, 60.0])


def test_clip():
    b = jnp.array([[-5.0, -5.0, 200.0, 50.0]])
    np.testing.assert_allclose(np.asarray(clip_boxes(b, 100, 150))[0], [0, 0, 150, 50])


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    got = np.asarray(iou_matrix(a, b))[0]
    np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0], rtol=1e-6)


def test_sort_overlap_plus_one_convention():
    # two identical tlwh boxes: inter=(w+1)(h+1), area_j the same -> overlap 1
    t = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    ov = np.asarray(sort_overlap_matrix(t))
    np.testing.assert_allclose(ov, np.ones((2, 2)), rtol=1e-6)
    # half-size box inside a big one: overlap[big, small] = inter/area_small = 1
    t2 = jnp.array([[0.0, 0.0, 20.0, 20.0], [0.0, 0.0, 10.0, 10.0]])
    ov2 = np.asarray(sort_overlap_matrix(t2))
    assert ov2[0, 1] == pytest.approx(1.0)
    assert ov2[1, 0] == pytest.approx((11 * 11) / (21 * 21))
