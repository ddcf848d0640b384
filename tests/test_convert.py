import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

from vehicle_counting_tpu.models.convert import (
    checkpoint_anchors,
    extract_state_dict,
    load_torch_checkpoint,
)


def _make_fake_package_model():
    """Define a module class inside a throwaway package (like ultralytics)."""
    pkg = types.ModuleType("fakepkg")
    mod = types.ModuleType("fakepkg.models")

    class TinyNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, padding=1)
            self.bn = nn.BatchNorm2d(8)

    TinyNet.__module__ = "fakepkg.models"
    TinyNet.__qualname__ = "TinyNet"
    mod.TinyNet = TinyNet
    pkg.models = mod
    sys.modules["fakepkg"] = pkg
    sys.modules["fakepkg.models"] = mod
    return TinyNet


def test_load_checkpoint_with_missing_package(tmp_path):
    TinyNet = _make_fake_package_model()
    net = TinyNet()
    with torch.no_grad():
        net.bn.running_mean.fill_(0.5)
    want = net.conv.weight.detach().numpy().copy()
    path = str(tmp_path / "m.pt")
    torch.save({"model": net, "epoch": 3}, path)

    # simulate the source package not being installed (hub ckpt scenario)
    del sys.modules["fakepkg"]
    del sys.modules["fakepkg.models"]

    ckpt = load_torch_checkpoint(path)
    sd = extract_state_dict(ckpt)
    assert "conv.weight" in sd
    np.testing.assert_allclose(sd["conv.weight"], want)
    np.testing.assert_allclose(sd["bn.running_mean"], np.full(8, 0.5, np.float32))


def test_extract_plain_state_dicts(tmp_path):
    sd_t = {"a.weight": torch.ones(3), "b.bias": torch.zeros(2)}
    got = extract_state_dict({"net_dict": sd_t})
    assert set(got) == {"a.weight", "b.bias"}
    got2 = extract_state_dict(sd_t)
    assert set(got2) == {"a.weight", "b.bias"}


def test_checkpoint_anchors_roundtrip():
    anchors_grid_units = np.array(
        [
            [[10, 13], [16, 30], [33, 23]],
            [[30, 61], [62, 45], [59, 119]],
            [[116, 90], [156, 198], [373, 326]],
        ],
        dtype=np.float32,
    )
    sd = {"model.24.anchors": anchors_grid_units / np.array([8, 16, 32], np.float32)[:, None, None]}
    # needs at least the index-pattern keys to strip; fake one layer key
    sd["model.24.m.0.weight"] = np.zeros((27, 16, 1, 1), np.float32)
    got = checkpoint_anchors(sd)
    np.testing.assert_allclose(np.asarray(got), anchors_grid_units, rtol=1e-6)


def test_detector_facade_smoke(rng):
    from vehicle_counting_tpu.configs import default_config, config_from_dict
    from vehicle_counting_tpu.models import Detector, COCO_VEHICLE_MAPPING

    cfg = config_from_dict(default_config(), {"image_size": [160, 160], "model_name": "yolov5n"})
    det = Detector(cfg, mapping_dict=COCO_VEHICLE_MAPPING, num_classes=80)
    frames = rng.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)
    outs = det.run(frames)
    assert len(outs) == 2
    for o in outs:
        assert set(o) == {"bboxes", "classes", "scores"}
        if len(o["classes"]):
            assert o["classes"].max() <= 3  # mapped vehicle ids
            assert (o["bboxes"][:, 2:] >= 0).all()  # tlwh sizes non-negative
