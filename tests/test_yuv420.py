"""YUV420 thin-upload round-trip parity vs cv2."""

import cv2
import numpy as np

import jax.numpy as jnp

from vehicle_counting_tpu.ops.letterbox import (
    host_letterbox,
    host_letterbox_yuv420,
    yuv420_to_rgb,
)


def test_yuv_roundtrip_close_to_rgb(rng):
    # smooth gradient content (natural video is chroma-smooth; pixel-level
    # random chroma is unrepresentable under 4:2:0 by construction)
    yy, xx = np.mgrid[0:180, 0:320]
    frames = np.stack(
        [
            np.stack([(xx * 255 / 320), (yy * 255 / 180), ((xx + yy) % 256)], axis=-1)
            for _ in range(2)
        ]
    ).astype(np.uint8)
    rgb_lb = host_letterbox(frames, (160, 160)).astype(np.float32)
    yuv = host_letterbox_yuv420(frames, (160, 160))
    assert yuv.shape == (2, 240, 160)
    rec = np.asarray(yuv420_to_rgb(jnp.asarray(yuv)))
    assert rec.shape == (2, 160, 160, 3)
    # chroma subsampling + nearest upsample: small error on natural-ish data
    err = np.abs(rec - rgb_lb).mean()
    assert err < 8.0, f"mean abs err {err}"
    # luma-dominant content should be near-exact
    gray = np.full((1, 100, 100, 3), 128, np.uint8)
    yuv_g = host_letterbox_yuv420(gray, (96, 96))
    rec_g = np.asarray(yuv420_to_rgb(jnp.asarray(yuv_g)))
    rgb_g = host_letterbox(gray, (96, 96)).astype(np.float32)
    assert np.abs(rec_g - rgb_g).max() < 3.0


def test_yuv_matches_cv2_inverse(rng):
    frames = rng.integers(0, 255, size=(1, 64, 64, 3), dtype=np.uint8)
    yuv = host_letterbox_yuv420(frames, (64, 64))
    rec_cv = cv2.cvtColor(yuv[0], cv2.COLOR_YUV2RGB_I420).astype(np.float32)
    rec_j = np.asarray(yuv420_to_rgb(jnp.asarray(yuv)))[0]
    # cv2 does bilinear-ish chroma upsampling; ours is nearest -> tolerance
    assert np.abs(rec_cv - rec_j).mean() < 6.0
