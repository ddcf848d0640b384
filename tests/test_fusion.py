import numpy as np
import pytest

from vehicle_counting_tpu.ops.fusion import filter_area, weighted_boxes_fusion


def test_wbf_fuses_overlapping_same_class():
    b1 = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    b2 = np.array([[1, 1, 11, 11]], float)
    boxes, scores, labels = weighted_boxes_fusion(
        [b1, b2], [np.array([0.8, 0.9]), np.array([0.6])], [np.array([0, 0]), np.array([0])],
        iou_thr=0.5,
    )
    assert len(boxes) == 2
    # the fused box is a weighted average between [0,0,10,10] and [1,1,11,11]
    fused = boxes[np.argmin(boxes[:, 0] > 5)] if boxes[0, 0] > 5 else boxes[np.argmax(boxes[:, 0] < 5)]
    fi = int(np.argmin(boxes[:, 0]))
    f = boxes[fi]
    assert 0 < f[0] < 1 and 10 < f[2] < 11
    # lone box: score rescaled by 1/n_models
    lone = scores[[i for i in range(2) if i != fi][0]]
    assert lone == pytest.approx(0.9 / 2)


def test_wbf_keeps_classes_separate():
    b = np.array([[0, 0, 10, 10]], float)
    boxes, scores, labels = weighted_boxes_fusion(
        [b, b], [np.array([0.9]), np.array([0.8])], [np.array([0]), np.array([1])],
        iou_thr=0.5,
    )
    assert len(boxes) == 2
    assert set(labels.tolist()) == {0, 1}


def test_wbf_full_agreement_keeps_score():
    b = np.array([[0, 0, 10, 10]], float)
    boxes, scores, labels = weighted_boxes_fusion(
        [b, b], [np.array([0.8]), np.array([0.6])], [np.array([0]), np.array([0])],
    )
    assert len(boxes) == 1
    assert scores[0] == pytest.approx(0.7)  # mean, no down-weighting


def test_wbf_empty():
    boxes, scores, labels = weighted_boxes_fusion([np.zeros((0, 4))], [np.zeros(0)], [np.zeros(0)])
    assert len(boxes) == 0


def test_filter_area():
    boxes = np.array([[0, 0, 1, 1], [0, 0, 50, 50], [0, 0, 9000, 10]], float)
    mask = filter_area(boxes, min_wh=2, max_wh=4096)
    assert mask.tolist() == [False, True, False]


def test_registry():
    from vehicle_counting_tpu.utils.registry import get_instance, register

    @register("adder")
    def make_adder(a, b):
        return a + b

    assert get_instance({"name": "adder", "args": {"a": 1, "b": 2}}) == 3
    with pytest.raises(KeyError):
        get_instance({"name": "nope"})
