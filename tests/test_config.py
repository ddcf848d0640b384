import os

from vehicle_counting_tpu.configs import (
    Config,
    config_from_dict,
    default_cam_config,
    default_config,
)


def test_default_config_surface():
    cfg = default_config()
    assert cfg.model_name == "yolov5s"
    assert cfg.min_iou == 0.45
    assert cfg.min_conf == 0.25
    assert cfg.max_det == 300
    assert cfg.image_size == [640, 640]
    assert cfg.keep_ratio is True


def test_missing_attribute_is_none():
    cfg = default_config()
    assert cfg.not_a_real_key is None


def test_cam_config_tracking_params():
    cam = default_cam_config()
    tc = cam.cam["cam_04"]["tracking_config"]
    assert tc["MAX_DIST"] == 0.2
    assert tc["MIN_CONFIDENCE"] == 0.25
    assert tc["NMS_MAX_OVERLAP"] == 0.5
    assert tc["MAX_IOU_DISTANCE"] == 0.6
    assert tc["MAX_AGE"] == 30
    assert tc["N_INIT"] == 3
    assert tc["NN_BUDGET"] == 60


def test_config_from_dict_override():
    cfg = default_config()
    cfg2 = config_from_dict(cfg, {"min_conf": 0.5, "new_key": 7})
    assert cfg2.min_conf == 0.5
    assert cfg2.new_key == 7
    assert cfg.min_conf == 0.25  # original untouched


def test_config_from_yaml_file(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("settings:\n  a: 1\n  b: [2, 3]\n")
    cfg = Config(str(p))
    assert cfg.a == 1 and cfg.b == [2, 3]
