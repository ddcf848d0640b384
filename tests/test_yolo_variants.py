"""Variant/shape coverage: yolov5m @ 1024 (BASELINE config 3 geometry) and
width/depth scaling across the family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models import VARIANTS, YoloConfig, decode_predictions, init_yolov5, yolov5_forward


def test_variant_channel_scaling():
    cfgs = {v: YoloConfig(variant=v, num_classes=4) for v in VARIANTS}
    assert cfgs["yolov5s"].width(64) == 32
    assert cfgs["yolov5m"].width(64) == 48
    assert cfgs["yolov5l"].width(64) == 64
    assert cfgs["yolov5s"].depth(9) == 3
    assert cfgs["yolov5m"].depth(9) == 6
    assert cfgs["yolov5x"].depth(3) == 4


@pytest.mark.parametrize("variant,size", [("yolov5m", 256), ("yolov5l", 128)])
def test_variant_forward_shapes(variant, size):
    cfg = YoloConfig(variant=variant, num_classes=4)
    params = init_yolov5(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    heads = yolov5_forward(params, x, cfg, dtype=jnp.float32)
    assert [h.shape[1] for h in heads] == [size // 8, size // 16, size // 32]
    dec = decode_predictions(heads, cfg)
    a = sum((size // s) ** 2 * 3 for s in (8, 16, 32))
    assert dec["boxes"].shape == (1, a, 4)
    # decode bound: wh <= (2*sigmoid)^2 * anchor <= 4 * 373 around cells in-grid
    assert float(jnp.max(dec["boxes"][..., 2])) < size + 2 * 4 * 373
    assert bool(jnp.isfinite(dec["boxes"]).all())


def test_yolov5m_1024_param_shapes():
    """BASELINE config 3 geometry: yolov5m at 1024 — structure only (full
    forward at 1024 is exercised on TPU; CPU test checks the param tree)."""
    cfg = YoloConfig(variant="yolov5m", num_classes=80)
    params = init_yolov5(jax.random.PRNGKey(0), cfg)
    assert params["0"]["w"].shape == (6, 6, 3, 48)
    assert params["9"]["cv2"]["w"].shape[-1] == cfg.width(1024)
    assert len(params["4"]["m"]) == cfg.depth(6) == 4
    assert params["24"]["m"][0]["w"].shape == (1, 1, cfg.width(256), 3 * 85)
