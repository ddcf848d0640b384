"""exact_topk == lax.top_k (values AND tie-broken indices), all group counts.

The detect tail's two-phase top-k (models/detector.py::exact_topk) must be
indistinguishable from lax.top_k: the NMS priority order and downstream
track identities depend on its index tie-breaking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.models.detector import exact_topk


def _check(scores, k, groups):
    ref_v, ref_i = jax.lax.top_k(scores, k)
    out_v, out_i = exact_topk(scores, k, groups=groups)
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(ref_i))


@pytest.mark.parametrize("groups", [2, 3, 7, 8])
@pytest.mark.parametrize("a", [1000, 4096, 25200])
def test_random_with_heavy_ties(groups, a):
    rng = np.random.default_rng(groups * 1000 + a)
    # quantize to force many exact ties, plus a detect-tail-like -1 floor
    s = rng.choice([-1.0, 0.1, 0.25, 0.5, 0.5, 0.9], size=(4, a)).astype(
        np.float32
    )
    _check(jnp.asarray(s), min(512, -(-a // groups)), groups)


def test_all_equal_and_all_floor():
    s = jnp.full((2, 2048), 0.5, jnp.float32)
    _check(s, 256, 4)
    s = jnp.full((2, 2048), -1.0, jnp.float32)
    _check(s, 256, 4)


def test_unpadded_vs_padded_lengths():
    rng = np.random.default_rng(0)
    for a in (25200, 25201, 25199):  # non-divisible lengths exercise the pad
        s = jnp.asarray(rng.random((2, a), np.float32))
        _check(s, 512, 8)


def test_groups_one_is_plain_topk():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.random((3, 1024), np.float32))
    _check(s, 128, 1)


def test_k_beyond_slice_width_falls_back():
    rng = np.random.default_rng(9)
    s = jnp.asarray(rng.random((2, 100), np.float32))
    _check(s, 60, 2)  # k > ceil(A/G): must silently equal plain top_k


def test_headwise_tail_small_pre_nms_topk():
    """The head-wise merge stays exact when pre_nms_topk exceeds a head.

    With pre_nms_topk > the smallest head's anchor count the per-head
    candidate lists are -inf padded before the phase-2 merge; outputs must
    still match the reference tail (the full-suite bit-exactness is in
    tests/test_detect_tail.py — this exercises the padding branch).
    """
    from vehicle_counting_tpu.models import detector as det
    from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5, yolov5_forward

    cfg = YoloConfig(variant="yolov5n", num_classes=80)
    params = init_yolov5(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    heads = yolov5_forward(params, imgs, cfg)
    # 64x64 input -> heads 8x8/4x4/2x2 -> two heads have fewer anchors
    # (48, 12) than pre_nms_topk=64, so their candidate lists are padded
    from vehicle_counting_tpu.models import decode_predictions
    from vehicle_counting_tpu.ops.nms import batched_nms

    dec = decode_predictions(heads, cfg)
    want = batched_nms(
        dec["boxes"], dec["scores"], dec["classes"],
        iou_threshold=0.45, score_threshold=0.001, max_det=100,
        pre_nms_topk=64,
    )
    got = det.fused_detect_tail(
        heads, cfg, conf_thres=0.001, iou_thres=0.45, max_det=100,
        pre_nms_topk=64,
    )
    for name in want:
        np.testing.assert_array_equal(
            np.asarray(got[name]), np.asarray(want[name]), err_msg=name
        )
