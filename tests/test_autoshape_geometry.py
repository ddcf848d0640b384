"""AutoShape letterbox-geometry parity (VERDICT r3 lead item).

The reference runs inference with NO size argument
(/root/reference/networks/yolo.py:70 `self.model(inputs)`), so ultralytics
AutoShape — not the config's square image_size — decides the network input:

    AutoShape.forward (ultralytics yolov5 v6.0, models/common.py):
        g = size / max(s)                       # per image, s = (h, w)
        shape1 = [y * g for y in s]
        shape1 = [make_divisible(x, stride)     # ceil to stride multiple
                  for x in np.array(shape1).max(0)]
        letterbox(im, shape1, auto=False)       # min-gain + half/half pad

    utils/augmentations.letterbox:
        r = min(new[0]/shape[0], new[1]/shape[1])
        new_unpad = round(shape[1]*r), round(shape[0]*r)
        dw, dh = (new[1]-new_unpad[0]) / 2, (new[0]-new_unpad[1]) / 2
        top, bottom = round(dh - 0.1), round(dh + 0.1)   (ditto left/right)

These tests replicate that float math INDEPENDENTLY (numpy float64, the
formulas above transcribed directly) and assert ops/letterbox agrees over a
matrix of source geometries — the repo-side implementation must match the
contract, not vice versa.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_counting_tpu.ops.letterbox import (
    autoshape_hw,
    content_upload_exact,
    letterbox,
    letterbox_params,
    restore_boxes,
)

# (src_h, src_w) matrix: 16:9 landscape/portrait, 4:3, square, odd sizes,
# smaller-than-target (scaleup), and very elongated aspect ratios
SRC_SIZES = [
    (720, 1280),
    (1080, 1920),
    (1280, 720),
    (480, 640),
    (640, 640),
    (707, 1000),
    (700, 1000),
    (360, 480),
    (2160, 3840),
    (100, 1000),
    (1000, 100),
    (541, 961),
]


def oracle_shape1(src_hw, size=640, stride=32):
    """Transcription of AutoShape.forward's shape math (see module docstring)."""
    s = np.array(src_hw, dtype=np.float64)
    g = size / s.max()
    shape1 = s * g
    return tuple(int(math.ceil(x / stride) * stride) for x in shape1)


def oracle_letterbox_geom(src_hw, new_shape):
    """Transcription of utils/augmentations.letterbox's geometry."""
    r = min(new_shape[0] / src_hw[0], new_shape[1] / src_hw[1])
    new_unpad = (int(round(src_hw[1] * r)), int(round(src_hw[0] * r)))  # (w, h)
    dw = (new_shape[1] - new_unpad[0]) / 2
    dh = (new_shape[0] - new_unpad[1]) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    return r, new_unpad, top, left


@pytest.mark.parametrize("src", SRC_SIZES)
def test_autoshape_hw_matches_contract(src):
    assert autoshape_hw(src, 640) == oracle_shape1(src, 640)


@pytest.mark.parametrize("src", SRC_SIZES)
def test_autoshape_hw_1024(src):
    assert autoshape_hw(src, 1024) == oracle_shape1(src, 1024)


def test_autoshape_hw_headline_geometries():
    # the headline cases VERDICT verified by hand
    assert autoshape_hw((720, 1280), 640) == (384, 640)   # 24 gray rows, not 280
    assert autoshape_hw((1080, 1920), 1024) == (576, 1024)
    assert autoshape_hw((640, 640), 640) == (640, 640)     # square unchanged
    assert autoshape_hw((720, 1280), [640, 640]) == (384, 640)  # config pair


@pytest.mark.parametrize("src", SRC_SIZES)
def test_letterbox_params_match_autoshape_letterbox(src):
    dst = autoshape_hw(src, 640)
    r, new_unpad, top, left = oracle_letterbox_geom(src, dst)
    gain, pad_x, pad_y, new_w, new_h = letterbox_params(src, dst)
    assert gain == pytest.approx(r)
    assert (new_w, new_h) == new_unpad
    assert int(round(pad_y - 0.1)) == top
    assert int(round(pad_x - 0.1)) == left


def test_content_pixels_identical_square_vs_autoshape(rng):
    """The minimal pad changes ONLY the gray rows: content pixels equal."""
    img = rng.integers(0, 255, size=(1, 720, 1280, 3), dtype=np.uint8)
    sq = np.asarray(letterbox(jnp.asarray(img), (640, 640)))
    mn = np.asarray(letterbox(jnp.asarray(img), (384, 640)))
    # square pad: content rows 140..500; minimal pad: rows 12..372
    np.testing.assert_array_equal(sq[:, 140:500], mn[:, 12:372])
    np.testing.assert_allclose(mn[:, :12], 114.0 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(mn[:, 372:], 114.0 / 255.0, rtol=1e-6)


def test_restore_boxes_roundtrip_autoshape_geometry():
    src, dst = (720, 1280), autoshape_hw((720, 1280), 640)
    gain, pad_x, pad_y, _, _ = letterbox_params(src, dst)
    src_boxes = np.array([[100.0, 100.0, 300.0, 200.0], [0.0, 0.0, 1280.0, 720.0]])
    lb = src_boxes * gain
    lb[:, [0, 2]] += pad_x
    lb[:, [1, 3]] += pad_y
    got = np.asarray(restore_boxes(jnp.asarray(lb), src, dst))
    np.testing.assert_allclose(got, src_boxes, atol=1e-4)


def test_content_upload_still_exact_at_autoshape_geometry():
    # 720p -> 384x640: top pad = 12 (even), content height 360 (even) — the
    # bit-exact content-row I420 upload holds at the minimal-pad geometry too
    assert content_upload_exact((720, 1280), autoshape_hw((720, 1280), 640))
    assert content_upload_exact((1080, 1920), autoshape_hw((1080, 1920), 1024))
    assert content_upload_exact((1080, 1920), autoshape_hw((1080, 1920), 640))


def test_pipeline_net_hw_selection():
    """CountingPipeline/Detector pick the AutoShape shape (square on opt-in)."""
    from vehicle_counting_tpu.configs import default_config
    from vehicle_counting_tpu.models.detector import Detector

    cfg = default_config()
    det = Detector(cfg, num_classes=8)
    assert det.net_hw((720, 1280)) == (384, 640)
    assert det.net_hw((640, 640)) == (640, 640)
    det.square_letterbox = True
    assert det.net_hw((720, 1280)) == (640, 640)
