"""fused_detect_tail must be BIT-identical to decode_predictions+batched_nms.

The fused tail (models/detector.py) defers box decode and the class argmax
until after the pre-NMS top-k; this is a pure re-scheduling, so every output
(boxes, scores, classes, valid) must match the staged reference path
exactly — same floats, same tie-breaks, same padding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.models import YoloConfig, decode_predictions, init_yolov5, yolov5_forward
from vehicle_counting_tpu.models.detector import fused_detect_tail
from vehicle_counting_tpu.ops.nms import batched_nms


def _random_heads(rng, cfg, b, size, dtype):
    heads = []
    for s in cfg.strides:
        h, w = size[0] // s, size[1] // s
        # logit scale that yields a realistic spread of scores incl. ties
        raw = rng.standard_normal((b, h, w, cfg.na * cfg.no)).astype(np.float32) * 2.0
        heads.append(jnp.asarray(raw).astype(dtype))
    return heads


def _staged(heads, cfg, conf, iou, max_det, topk):
    dec = decode_predictions(heads, cfg)
    return batched_nms(
        dec["boxes"], dec["scores"], dec["classes"],
        iou_threshold=iou, score_threshold=conf, max_det=max_det,
        pre_nms_topk=topk,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("size,nc", [((320, 320), 80), ((256, 192), 7)])
def test_fused_tail_bitwise_equal(dtype, size, nc):
    cfg = YoloConfig(variant="yolov5n", num_classes=nc)
    rng = np.random.default_rng(0 if dtype == jnp.float32 else 1)
    heads = _random_heads(rng, cfg, 3, size, dtype)
    kw = dict(conf=0.25, iou=0.45, max_det=64, topk=128)
    ref = _staged(heads, cfg, kw["conf"], kw["iou"], kw["max_det"], kw["topk"])
    got = fused_detect_tail(
        heads, cfg,
        conf_thres=kw["conf"], iou_thres=kw["iou"],
        max_det=kw["max_det"], pre_nms_topk=kw["topk"],
    )
    assert np.array_equal(np.asarray(ref["valid"]), np.asarray(got["valid"]))
    assert np.array_equal(np.asarray(ref["classes"]), np.asarray(got["classes"]))
    assert np.array_equal(np.asarray(ref["scores"]), np.asarray(got["scores"]))
    assert np.array_equal(np.asarray(ref["boxes"]), np.asarray(got["boxes"]))


def test_fused_tail_high_threshold_empty():
    cfg = YoloConfig(variant="yolov5n", num_classes=4)
    rng = np.random.default_rng(2)
    heads = _random_heads(rng, cfg, 2, (160, 160), jnp.float32)
    got = fused_detect_tail(
        heads, cfg, conf_thres=0.999999, iou_thres=0.45, max_det=16,
    )
    assert not np.asarray(got["valid"]).any()
    assert (np.asarray(got["classes"]) == -1).all()
    assert (np.asarray(got["boxes"]) == 0).all()


def test_fused_tail_through_forward():
    """End-to-end through a real (random-weight) forward, both dtypes."""
    cfg = YoloConfig(variant="yolov5n", num_classes=80)
    import jax

    params = init_yolov5(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((2, 192, 192, 3), np.float32))
    heads = yolov5_forward(params, imgs, cfg, dtype=jnp.float32)
    ref = _staged(heads, cfg, 0.01, 0.45, 32, 256)
    got = fused_detect_tail(
        heads, cfg, conf_thres=0.01, iou_thres=0.45, max_det=32,
        pre_nms_topk=256,
    )
    for k in ("valid", "classes", "scores", "boxes"):
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_packed_rows_modes_bitwise_equal(dtype):
    """The packed candidate extraction (lane slices + full-map argmax) is
    bitwise-identical to the wide-row gather path: same xywh logits, same
    class argmax ties (first max either way), same scores/merge."""
    import vehicle_counting_tpu.models.detector as det_mod

    rng = np.random.default_rng(11)
    cfg = YoloConfig(variant="yolov5n", num_classes=13)
    heads = _random_heads(rng, cfg, 2, (96, 160), dtype)
    kw = dict(conf_thres=0.01, iou_thres=0.45, max_det=32, pre_nms_topk=64)
    prev = det_mod.TAIL_ROWS_MODE
    try:
        det_mod.TAIL_ROWS_MODE = "packed"
        a = fused_detect_tail(heads, cfg, **kw)
        det_mod.TAIL_ROWS_MODE = "rows"
        b = fused_detect_tail(heads, cfg, **kw)
    finally:
        det_mod.TAIL_ROWS_MODE = prev
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
