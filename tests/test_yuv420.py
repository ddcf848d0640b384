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


def test_content_only_upload_bit_exact(rng):
    """Content-row upload + device gray re-insertion == full-frame I420 path,
    byte for byte, for the standard 16:9 -> square geometries."""
    from vehicle_counting_tpu.ops.letterbox import (
        content_upload_exact,
        yuv420_content_to_full,
    )

    # odd content-row offset -> the exactness probe must reject it (the
    # pipeline falls back to full-frame uploads there)
    from vehicle_counting_tpu.ops.letterbox import content_upload_exact as _exact

    assert not _exact((90, 160), (96, 96))

    for (sh, sw), dst in [((720, 1280), (640, 640)), ((1080, 1920), (1024, 1024)),
                          ((80, 160), (96, 96))]:
        assert content_upload_exact((sh, sw), dst), (sh, sw, dst)
        frames = rng.integers(0, 255, (2, sh, sw, 3), np.uint8)
        full = host_letterbox_yuv420(frames, dst)
        content = host_letterbox_yuv420(frames, dst, content_only=True)
        assert content.shape[1] < full.shape[1]
        rebuilt = np.asarray(yuv420_content_to_full(jnp.asarray(content), (sh, sw), dst))
        np.testing.assert_array_equal(rebuilt, full, err_msg=f"{(sh, sw)} -> {dst}")


def test_pipeline_step_accepts_content_upload(rng):
    """pipeline_batch_step auto-detects content-only frames and produces the
    same detections/tracks as the full-frame upload."""
    import jax

    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

    ycfg = YoloConfig(variant="yolov5n", num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(0), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    hp = DeepSortParams(tracker=TrackerParams(capacity=8, budget=4, max_age=4, n_init=2),
                        num_classes=2)
    sh, sw = 80, 160
    frames = rng.integers(0, 255, (2, sh, sw, 3), np.uint8)
    lut = jnp.concatenate([jnp.arange(2, dtype=jnp.int32), jnp.full((78,), -1, jnp.int32)])
    kw = dict(ycfg=ycfg, hp=hp, image_size=(96, 96), src_hw=(sh, sw), max_det=16,
              conf_thres=0.0, frames_format="letterboxed_yuv420")
    valid = jnp.ones((2,), bool)

    full = host_letterbox_yuv420(frames, (96, 96))
    content = host_letterbox_yuv420(frames, (96, 96), content_only=True)

    s0 = init_states(hp)
    _, det_a, touts_a = pipeline_batch_step(
        yolo_params, reid_params, reid_stats, s0, jnp.asarray(full), valid, lut, **kw)
    _, det_b, touts_b = pipeline_batch_step(
        yolo_params, reid_params, reid_stats, s0, jnp.asarray(content), valid, lut, **kw)

    np.testing.assert_array_equal(np.asarray(det_a["valid"]), np.asarray(det_b["valid"]))
    np.testing.assert_array_equal(np.asarray(det_a["boxes"]), np.asarray(det_b["boxes"]))
    np.testing.assert_array_equal(np.asarray(touts_a.mask), np.asarray(touts_b.mask))
    np.testing.assert_array_equal(np.asarray(touts_a.ids), np.asarray(touts_b.ids))


def test_planar_u8_matches_interleaved(rng):
    """yuv420_to_rgb_u8_planar == transpose(yuv420_to_rgb_u8) exactly."""
    from vehicle_counting_tpu.ops.letterbox import (
        yuv420_to_rgb_u8,
        yuv420_to_rgb_u8_planar,
    )

    frames = rng.integers(0, 255, (2, 80, 160, 3), np.uint8)
    yuv = host_letterbox_yuv420(frames, (96, 96))
    a = np.asarray(yuv420_to_rgb_u8(jnp.asarray(yuv)))
    b = np.asarray(yuv420_to_rgb_u8_planar(jnp.asarray(yuv)))
    np.testing.assert_array_equal(a.transpose(0, 3, 1, 2), b)


def test_pipeline_step_planar_pixels_identical(rng, monkeypatch):
    """The VCT_PLANAR_PIXELS pixel path (planar u8 crop source, transposed
    detector view, planar-aware embed) produces bit-identical detections and
    track outputs to the interleaved default."""
    import jax

    import vehicle_counting_tpu.pipeline.step as step_mod
    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

    ycfg = YoloConfig(variant="yolov5n", num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(0), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=8, budget=4, max_age=4, n_init=2),
        num_classes=2,
    )
    sh, sw = 80, 160
    frames = rng.integers(0, 255, (2, sh, sw, 3), np.uint8)
    lut = jnp.concatenate(
        [jnp.arange(2, dtype=jnp.int32), jnp.full((78,), -1, jnp.int32)]
    )
    kw = dict(ycfg=ycfg, hp=hp, image_size=(96, 96), src_hw=(sh, sw), max_det=16,
              conf_thres=0.0, frames_format="letterboxed_yuv420")
    valid = jnp.ones((2,), bool)
    yuv = jnp.asarray(host_letterbox_yuv420(frames, (96, 96)))

    step = step_mod.pipeline_batch_step.__wrapped__  # unjitted: the flag is
    s0 = init_states(hp)                             # read at trace time

    monkeypatch.setattr(step_mod, "_PLANAR_PIXELS", False)
    _, det_a, touts_a = step(
        yolo_params, reid_params, reid_stats, s0, yuv, valid, lut, **kw)
    monkeypatch.setattr(step_mod, "_PLANAR_PIXELS", True)
    _, det_b, touts_b = step(
        yolo_params, reid_params, reid_stats, s0, yuv, valid, lut, **kw)

    for k in ("valid", "boxes", "scores", "classes"):
        np.testing.assert_array_equal(np.asarray(det_a[k]), np.asarray(det_b[k]))
    np.testing.assert_array_equal(np.asarray(touts_a.mask), np.asarray(touts_b.mask))
    np.testing.assert_array_equal(np.asarray(touts_a.ids), np.asarray(touts_b.ids))
    np.testing.assert_array_equal(np.asarray(touts_a.boxes), np.asarray(touts_b.boxes))
