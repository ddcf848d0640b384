import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_counting_tpu.ops import letterbox, letterbox_params, restore_boxes


def test_letterbox_params_wide_source():
    # 1280x720 -> 640x640: gain 0.5, resized 640x360, pad_y 140 each side
    gain, pad_x, pad_y, new_w, new_h = letterbox_params((720, 1280), (640, 640))
    assert gain == 0.5
    assert (new_w, new_h) == (640, 360)
    assert pad_x == 0 and pad_y == 140


def test_letterbox_output(rng):
    img = rng.integers(0, 255, size=(2, 720, 1280, 3), dtype=np.uint8)
    out = np.asarray(letterbox(jnp.asarray(img), (640, 640)))
    assert out.shape == (2, 640, 640, 3)
    assert out.dtype == np.float32
    # padding rows are the 114-gray fill
    np.testing.assert_allclose(out[:, :140, :, :], 114.0 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(out[:, -140:, :, :], 114.0 / 255.0, rtol=1e-6)
    # content region is in [0, 1]
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_restore_boxes_inverts_letterbox():
    src, dst = (720, 1280), (640, 640)
    # a box at source pixels (100, 100, 300, 200) maps to letterboxed coords
    gain, pad_x, pad_y, _, _ = letterbox_params(src, dst)
    lb = jnp.array([[100 * gain + pad_x, 100 * gain + pad_y, 300 * gain + pad_x, 200 * gain + pad_y]])
    got = np.asarray(restore_boxes(lb, src, dst))[0]
    np.testing.assert_allclose(got, [100, 100, 300, 200], atol=1e-4)


def test_restore_boxes_clips_to_source():
    src, dst = (720, 1280), (640, 640)
    lb = jnp.array([[-50.0, 0.0, 10000.0, 10000.0]])
    got = np.asarray(restore_boxes(lb, src, dst))[0]
    assert got[0] >= 0 and got[1] >= 0
    assert got[2] <= 1280 and got[3] <= 720


def test_letterbox_upscales_small_source():
    # smaller-than-target sources are scaled UP (ultralytics scaleup=True path)
    gain, pad_x, pad_y, new_w, new_h = letterbox_params((320, 320), (640, 640))
    assert gain == 2.0 and (new_w, new_h) == (640, 640)
