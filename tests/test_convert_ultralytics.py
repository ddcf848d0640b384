"""Converter proof on an ultralytics-SHAPED checkpoint (VERDICT next-3).

No egress exists here, so a genuine yolov5 .pt can't be downloaded; instead
this builds a byte-faithful fake: a pickled `models.yolo.DetectionModel`
module tree (nested `models.common.Conv/C3/SPPF/Bottleneck` class paths, the
`model.model.{0..24}` Sequential indexing, fp16 tensors, the `anchors`
buffer and `stride` attribute, the full hub dict wrapper with epoch/ema/
optimizer keys — mirroring /root/reference's consumed checkpoints, see
networks/yolo.py:58 and utilities/utils.py:204-209) — saved with torch.save,
then loaded WITHOUT the source package so the tolerant stub-unpickler,
module-tree walk, name map, OIHW->HWIO transpose, and f64 BN-fold all run
exactly as they would on a real download.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_yolo import CFG, NC, make_state_dict, torch_forward

from vehicle_counting_tpu.models.convert import (
    checkpoint_anchors,
    extract_state_dict,
    load_torch_checkpoint,
    load_yolov5_weights,
    yolov5_state_dict_to_pytree,
)

V6_ANCHORS = np.array(
    [
        [[10, 13], [16, 30], [33, 23]],
        [[30, 61], [62, 45], [59, 119]],
        [[116, 90], [156, 198], [373, 326]],
    ],
    np.float32,
)
STRIDES = np.array([8.0, 16.0, 32.0], np.float32)


def _install_fake_ultralytics():
    """Register models.yolo / models.common with v6.0-named module classes."""
    mpkg = types.ModuleType("models")
    myolo = types.ModuleType("models.yolo")
    mcommon = types.ModuleType("models.common")
    mpkg.__path__ = []

    class Conv(nn.Module):
        def __init__(self, cin, cout, k, s=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(cout)
            self.act = nn.SiLU()

    class Bottleneck(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.cv1 = Conv(c, c, 1)
            self.cv2 = Conv(c, c, 3)

    class C3(nn.Module):
        def __init__(self, cin, cout, n):
            super().__init__()
            ch = cout // 2
            self.cv1 = Conv(cin, ch, 1)
            self.cv2 = Conv(cin, ch, 1)
            self.cv3 = Conv(2 * ch, cout, 1)
            self.m = nn.Sequential(*[Bottleneck(ch) for _ in range(n)])

    class SPPF(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            ch = cin // 2
            self.cv1 = Conv(cin, ch, 1)
            self.cv2 = Conv(ch * 4, cout, 1)
            self.m = nn.MaxPool2d(5, 1, 2)

    class Concat(nn.Module):
        def __init__(self, d=1):
            super().__init__()
            self.d = d

    class Detect(nn.Module):
        def __init__(self, nc, chs):
            super().__init__()
            self.nc = nc
            self.no = nc + 5
            self.nl = len(chs)
            self.na = 3
            self.m = nn.ModuleList(nn.Conv2d(c, 3 * (nc + 5), 1) for c in chs)
            self.register_buffer(
                "anchors", torch.from_numpy(V6_ANCHORS / STRIDES[:, None, None])
            )

    class DetectionModel(nn.Module):
        def __init__(self, layers, nc):
            super().__init__()
            self.model = nn.Sequential(*layers)
            self.yaml = {"nc": nc, "depth_multiple": 0.33, "width_multiple": 0.25}
            self.names = [str(i) for i in range(nc)]
            self.stride = torch.from_numpy(STRIDES)
            self.inplace = True

    for cls in (Conv, Bottleneck, C3, SPPF, Concat):
        cls.__module__ = "models.common"
        cls.__qualname__ = cls.__name__
        setattr(mcommon, cls.__name__, cls)
    for cls in (Detect, DetectionModel):
        cls.__module__ = "models.yolo"
        cls.__qualname__ = cls.__name__
        setattr(myolo, cls.__name__, cls)
    mpkg.yolo, mpkg.common = myolo, mcommon
    sys.modules["models"] = mpkg
    sys.modules["models.yolo"] = myolo
    sys.modules["models.common"] = mcommon
    return DetectionModel, Conv, C3, SPPF, Concat, Detect


def _build_fake_checkpoint(tmp_path, rng):
    """DetectionModel with make_state_dict weights, fp16, hub dict wrapper."""
    DetectionModel, Conv, C3, SPPF, Concat, Detect = _install_fake_ultralytics()
    w, d = CFG.width, CFG.depth
    c64, c128, c256, c512, c1024 = w(64), w(128), w(256), w(512), w(1024)
    up = lambda: nn.Upsample(scale_factor=2.0, mode="nearest")
    layers = [
        Conv(3, c64, 6, 2), Conv(c64, c128, 3, 2), C3(c128, c128, d(3)),
        Conv(c128, c256, 3, 2), C3(c256, c256, d(6)),
        Conv(c256, c512, 3, 2), C3(c512, c512, d(9)),
        Conv(c512, c1024, 3, 2), C3(c1024, c1024, d(3)), SPPF(c1024, c1024),
        Conv(c1024, c512, 1), up(), Concat(), C3(c1024, c512, d(3)),
        Conv(c512, c256, 1), up(), Concat(), C3(c512, c256, d(3)),
        Conv(c256, c256, 3, 2), Concat(), C3(c512, c512, d(3)),
        Conv(c512, c512, 3, 2), Concat(), C3(c1024, c1024, d(3)),
        Detect(NC, (c256, c512, c1024)),
    ]
    model = DetectionModel(layers, NC)

    sd = make_state_dict(rng)  # keys already carry the 'model.' prefix
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    # only BN bookkeeping + anchors may be absent from the synthetic dict
    assert all("num_batches_tracked" in k or "anchors" in k for k in missing), missing

    model = model.half()  # hub checkpoints ship fp16
    path = str(tmp_path / "yolov5n_fake.pt")
    torch.save(
        {
            "epoch": -1, "best_fitness": None, "model": model, "ema": None,
            "updates": None, "optimizer": None, "wandb_id": None,
            "date": "2021-10-12",
        },
        path,
    )
    # simulate 'ultralytics is not installed': the pickled class paths
    # models.yolo/models.common must resolve through the stub unpickler
    for name in ("models", "models.yolo", "models.common"):
        del sys.modules[name]
    return path, sd


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    rng = np.random.default_rng(1702)
    return _build_fake_checkpoint(tmp_path_factory.mktemp("ckpt"), rng)


def test_stub_unpickler_walks_detectionmodel(fake_ckpt):
    path, sd = fake_ckpt
    assert "models" not in sys.modules
    ckpt = load_torch_checkpoint(path)
    got = extract_state_dict(ckpt)
    # every conv/bn tensor present under the model.{i} names, fp16-rounded
    for k, v in sd.items():
        assert k in got, f"missing {k}"
        np.testing.assert_array_equal(
            got[k], v.astype(np.float16).astype(np.float32), err_msg=k
        )
    assert "model.24.anchors" in got


def test_anchors_recovered_in_pixels(fake_ckpt):
    path, _ = fake_ckpt
    got = checkpoint_anchors(extract_state_dict(load_torch_checkpoint(path)))
    np.testing.assert_allclose(np.asarray(got), V6_ANCHORS, rtol=1e-3)


def test_converted_pytree_bit_equals_reference_path(fake_ckpt):
    """load_yolov5_weights(.pt) == name-map+fold of the fp16-rounded dict:
    any layout/name/BN-fold regression a real checkpoint would hit fails."""
    path, sd = fake_ckpt
    params = load_yolov5_weights(path)
    sd16 = {k: v.astype(np.float16).astype(np.float32) for k, v in sd.items()}
    want = yolov5_state_dict_to_pytree(sd16)

    import jax

    leaves_got, tree_got = jax.tree.flatten(params)
    leaves_want, tree_want = jax.tree.flatten(want)
    assert tree_got == tree_want
    for a, b in zip(leaves_got, leaves_want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converted_checkpoint_drives_detection(fake_ckpt, rng):
    """detect-path forward with the converted tree matches the torch oracle
    running the same fp16-rounded weights."""
    from vehicle_counting_tpu.models.yolo import yolov5_forward

    path, sd = fake_ckpt
    params = load_yolov5_weights(path)
    sd16 = {
        k[len("model."):]: v.astype(np.float16).astype(np.float32)
        for k, v in sd.items()
    }
    x = rng.normal(0.45, 0.2, size=(1, 64, 64, 3)).astype(np.float32).clip(0, 1)
    heads = yolov5_forward(params, jnp.asarray(x), CFG, dtype=jnp.float32)
    with torch.no_grad():
        want = torch_forward(sd16, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for got, ref in zip(heads, want):
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )


def test_converted_weights_non169_end_to_end(fake_ckpt, rng):
    """Converted-checkpoint detect parity END-TO-END on a NON-16:9 source
    (VERDICT r2 next-6): the host full-frame I420 letterbox branch
    (content_upload_exact FALSE — odd content top row), YOLO forward with
    the CONVERTED pytree, the fused decode+NMS tail, and the letterbox
    coordinate restore — against an oracle that runs the SAME letterboxed
    pixels through the torch reference forward (fp16-rounded weights), the
    staged decode+NMS path, and an independent numpy implementation of the
    restore contract (/root/reference/utilities/postprocess.py:72-109:
    gain = min(dst/src), half/half padding, subtract pad, divide gain,
    clip to source bounds). Catches real-checkpoint layout or coordinate-
    restore regressions that the pure-forward parity test cannot."""
    from vehicle_counting_tpu.models import decode_predictions
    from vehicle_counting_tpu.models.detector import fused_detect_tail
    from vehicle_counting_tpu.models.yolo import yolov5_forward
    from vehicle_counting_tpu.ops.letterbox import (
        content_upload_exact,
        host_letterbox_yuv420,
        restore_boxes,
        yuv420_to_rgb_u8,
    )
    from vehicle_counting_tpu.ops.nms import batched_nms

    src_hw, dst_hw = (73, 100), (96, 96)
    # gain .96 -> new_h 70, pad_y 13: content rows start on an ODD row, so
    # the thin content-only upload is NOT exact and the pipeline must ship
    # full letterboxed frames (pipeline/__init__.py content_only branch)
    assert not content_upload_exact(src_hw, dst_hw)

    path, sd = fake_ckpt
    params = load_yolov5_weights(path)

    frames = rng.integers(0, 255, size=(2, *src_hw, 3), dtype=np.uint8)
    yuv = host_letterbox_yuv420(frames, dst_hw)  # full-frame branch
    assert yuv.shape == (2, dst_hw[0] * 3 // 2, dst_hw[1])
    # both paths below consume the SAME letterboxed pixels (the YUV->RGB
    # roundtrip's own bit-exactness is pinned by test_yuv420)
    rgb = np.asarray(yuv420_to_rgb_u8(jnp.asarray(yuv)))

    x = jnp.asarray(rgb).astype(jnp.float32) / 255.0
    heads = yolov5_forward(params, x, CFG, dtype=jnp.float32)
    got = fused_detect_tail(heads, CFG, conf_thres=0.25, iou_thres=0.45, max_det=32)
    got_boxes = np.asarray(restore_boxes(got["boxes"], src_hw, dst_hw))

    sd16 = {
        k[len("model."):]: v.astype(np.float16).astype(np.float32)
        for k, v in sd.items()
    }
    with torch.no_grad():
        theads = torch_forward(
            sd16,
            torch.from_numpy((rgb.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)),
        )
    theads = [jnp.asarray(h.numpy().transpose(0, 2, 3, 1)) for h in theads]
    dec = decode_predictions(theads, CFG)
    ref = batched_nms(
        dec["boxes"], dec["scores"], dec["classes"],
        iou_threshold=0.45, score_threshold=0.25, max_det=32,
    )

    # independent numpy restore straight from the reference contract
    sh, sw = src_hw
    dh, dw = dst_hw
    gain = min(dh / sh, dw / sw)
    pad_x, pad_y = (dw - round(sw * gain)) / 2, (dh - round(sh * gain)) / 2
    rb = np.asarray(ref["boxes"], np.float32).copy()
    rb[..., [0, 2]] = ((rb[..., [0, 2]] - pad_x) / gain).clip(0, sw)
    rb[..., [1, 3]] = ((rb[..., [1, 3]] - pad_y) / gain).clip(0, sh)

    v_got, v_ref = np.asarray(got["valid"]), np.asarray(ref["valid"])
    assert v_got.any()  # random-init at conf .25 must admit detections
    assert np.array_equal(v_got, v_ref)
    assert np.array_equal(
        np.asarray(got["classes"])[v_got], np.asarray(ref["classes"])[v_ref]
    )
    np.testing.assert_allclose(
        np.asarray(got["scores"])[v_got], np.asarray(ref["scores"])[v_ref],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(got_boxes[v_got], rb[v_ref], atol=0.1)
