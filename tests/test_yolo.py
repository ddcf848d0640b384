"""YOLOv5 numerics: JAX model vs an independent torch functional oracle.

The oracle below is built in the test from the public v6.0 architecture
spec (Conv-BN-SiLU, C3, SPPF, PANet, anchor Detect) using torch.nn.functional
only. Both sides consume the same synthetic ultralytics-style state dict, so
this exercises: name mapping, conv+BN fusion, OIHW->HWIO layout, padding
semantics, C3/SPPF wiring, upsample+concat order, and the anchor decode.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models import (
    YoloConfig,
    decode_predictions,
    init_yolov5,
    yolov5_forward,
)
from vehicle_counting_tpu.models.convert import (
    fuse_conv_bn,
    yolov5_state_dict_to_pytree,
)

NC = 4
CFG = YoloConfig(variant="yolov5n", num_classes=NC)


# ---------------------------------------------------------------------------
# synthetic ultralytics-style state dict
# ---------------------------------------------------------------------------

def _conv_entries(rng, sd, base, cin, cout, k):
    sd[f"{base}.conv.weight"] = rng.normal(0, 0.1, size=(cout, cin, k, k)).astype(np.float32)
    sd[f"{base}.bn.weight"] = rng.uniform(0.5, 1.5, size=cout).astype(np.float32)
    sd[f"{base}.bn.bias"] = rng.normal(0, 0.1, size=cout).astype(np.float32)
    sd[f"{base}.bn.running_mean"] = rng.normal(0, 0.1, size=cout).astype(np.float32)
    sd[f"{base}.bn.running_var"] = rng.uniform(0.5, 1.5, size=cout).astype(np.float32)


def _c3_entries(rng, sd, i, cin, cout, n):
    ch = cout // 2
    _conv_entries(rng, sd, f"{i}.cv1", cin, ch, 1)
    _conv_entries(rng, sd, f"{i}.cv2", cin, ch, 1)
    _conv_entries(rng, sd, f"{i}.cv3", 2 * ch, cout, 1)
    for j in range(n):
        _conv_entries(rng, sd, f"{i}.m.{j}.cv1", ch, ch, 1)
        _conv_entries(rng, sd, f"{i}.m.{j}.cv2", ch, ch, 3)


def make_state_dict(rng):
    w, d = CFG.width, CFG.depth
    c64, c128, c256, c512, c1024 = w(64), w(128), w(256), w(512), w(1024)
    sd = {}
    _conv_entries(rng, sd, "0", 3, c64, 6)
    _conv_entries(rng, sd, "1", c64, c128, 3)
    _c3_entries(rng, sd, "2", c128, c128, d(3))
    _conv_entries(rng, sd, "3", c128, c256, 3)
    _c3_entries(rng, sd, "4", c256, c256, d(6))
    _conv_entries(rng, sd, "5", c256, c512, 3)
    _c3_entries(rng, sd, "6", c512, c512, d(9))
    _conv_entries(rng, sd, "7", c512, c1024, 3)
    _c3_entries(rng, sd, "8", c1024, c1024, d(3))
    _conv_entries(rng, sd, "9.cv1", c1024, c1024 // 2, 1)
    _conv_entries(rng, sd, "9.cv2", 2 * c1024, c1024, 1)
    _conv_entries(rng, sd, "10", c1024, c512, 1)
    _c3_entries(rng, sd, "13", c1024, c512, d(3))
    _conv_entries(rng, sd, "14", c512, c256, 1)
    _c3_entries(rng, sd, "17", c512, c256, d(3))
    _conv_entries(rng, sd, "18", c256, c256, 3)
    _c3_entries(rng, sd, "20", c512, c512, d(3))
    _conv_entries(rng, sd, "21", c512, c512, 3)
    _c3_entries(rng, sd, "23", c1024, c1024, d(3))
    for j, c in enumerate((c256, c512, c1024)):
        sd[f"24.m.{j}.weight"] = rng.normal(0, 0.05, size=(3 * (NC + 5), c, 1, 1)).astype(np.float32)
        sd[f"24.m.{j}.bias"] = rng.normal(0, 0.05, size=3 * (NC + 5)).astype(np.float32)
    # hub checkpoints carry a leading 'model.' prefix
    return {f"model.{k}": v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torch functional oracle (public v6.0 graph)
# ---------------------------------------------------------------------------

def tconv(x, sd, base, stride=1, pad=None, act=True):
    w = torch.from_numpy(sd[f"{base}.conv.weight"])
    k = w.shape[2]
    p = k // 2 if pad is None else pad
    y = F.conv2d(x, w, None, stride, p)
    y = F.batch_norm(
        y,
        torch.from_numpy(sd[f"{base}.bn.running_mean"]),
        torch.from_numpy(sd[f"{base}.bn.running_var"]),
        torch.from_numpy(sd[f"{base}.bn.weight"]),
        torch.from_numpy(sd[f"{base}.bn.bias"]),
        False,
        0.0,
        1e-3,
    )
    return F.silu(y) if act else y


def tc3(x, sd, i, n, shortcut):
    y1 = tconv(x, sd, f"{i}.cv1")
    for j in range(n):
        h = tconv(y1, sd, f"{i}.m.{j}.cv1")
        h = tconv(h, sd, f"{i}.m.{j}.cv2")
        y1 = y1 + h if shortcut else h
    y2 = tconv(x, sd, f"{i}.cv2")
    return tconv(torch.cat([y1, y2], 1), sd, f"{i}.cv3")


def tsppf(x, sd, i):
    y = tconv(x, sd, f"{i}.cv1")
    m1 = F.max_pool2d(y, 5, 1, 2)
    m2 = F.max_pool2d(m1, 5, 1, 2)
    m3 = F.max_pool2d(m2, 5, 1, 2)
    return tconv(torch.cat([y, m1, m2, m3], 1), sd, f"{i}.cv2")


def torch_forward(sd, x_nchw):
    d = CFG.depth
    x = tconv(x_nchw, sd, "0", 2, 2)
    x = tconv(x, sd, "1", 2)
    x = tc3(x, sd, "2", d(3), True)
    x = tconv(x, sd, "3", 2)
    p3 = tc3(x, sd, "4", d(6), True)
    x = tconv(p3, sd, "5", 2)
    p4 = tc3(x, sd, "6", d(9), True)
    x = tconv(p4, sd, "7", 2)
    x = tc3(x, sd, "8", d(3), True)
    p5 = tsppf(x, sd, "9")
    t10 = tconv(p5, sd, "10")
    x = torch.cat([F.interpolate(t10, scale_factor=2, mode="nearest"), p4], 1)
    x = tc3(x, sd, "13", d(3), False)
    t14 = tconv(x, sd, "14")
    x = torch.cat([F.interpolate(t14, scale_factor=2, mode="nearest"), p3], 1)
    o3 = tc3(x, sd, "17", d(3), False)
    x = tconv(o3, sd, "18", 2)
    x = torch.cat([x, t14], 1)
    o4 = tc3(x, sd, "20", d(3), False)
    x = tconv(o4, sd, "21", 2)
    x = torch.cat([x, t10], 1)
    o5 = tc3(x, sd, "23", d(3), False)
    outs = []
    for j, o in enumerate((o3, o4, o5)):
        w = torch.from_numpy(sd[f"24.m.{j}.weight"])
        b = torch.from_numpy(sd[f"24.m.{j}.bias"])
        outs.append(F.conv2d(o, w, b))
    return outs


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_fuse_conv_bn_matches_torch(rng):
    cin, cout, k = 8, 16, 3
    w = rng.normal(0, 0.3, size=(cout, cin, k, k)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, size=cout).astype(np.float32)
    beta = rng.normal(size=cout).astype(np.float32)
    mean = rng.normal(size=cout).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=cout).astype(np.float32)
    x = rng.normal(size=(2, cin, 16, 16)).astype(np.float32)

    y_t = F.batch_norm(
        F.conv2d(torch.from_numpy(x), torch.from_numpy(w), None, 1, 1),
        torch.from_numpy(mean),
        torch.from_numpy(var),
        torch.from_numpy(gamma),
        torch.from_numpy(beta),
        False,
        0.0,
        1e-3,
    ).numpy()

    wf, bf = fuse_conv_bn(w, gamma, beta, mean, var, eps=1e-3)
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    y_j = jax.lax.conv_general_dilated(
        xn, jnp.asarray(wf), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bf)
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)


def test_init_forward_shapes():
    params = init_yolov5(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    heads = yolov5_forward(params, x, CFG, dtype=jnp.float32)
    assert [h.shape for h in heads] == [
        (2, 16, 16, 27),
        (2, 8, 8, 27),
        (2, 4, 4, 27),
    ]
    dec = decode_predictions(heads, CFG)
    a = 16 * 16 * 3 + 8 * 8 * 3 + 4 * 4 * 3
    assert dec["boxes"].shape == (2, a, 4)
    assert dec["scores"].shape == (2, a)
    assert dec["classes"].dtype == jnp.int32


def test_full_forward_matches_torch_oracle(rng):
    sd_prefixed = make_state_dict(rng)
    sd = {k[len("model."):]: v for k, v in sd_prefixed.items()}
    params = yolov5_state_dict_to_pytree(sd_prefixed)

    x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
    heads_j = yolov5_forward(params, jnp.asarray(x), CFG, dtype=jnp.float32)
    with torch.no_grad():
        heads_t = torch_forward(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    for hj, ht in zip(heads_j, heads_t):
        ht = np.transpose(ht.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(hj), ht, rtol=1e-3, atol=2e-4)


def test_decode_against_numpy_oracle(rng):
    heads = [
        jnp.asarray(rng.normal(0, 1, size=(1, 4, 4, 27)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1, size=(1, 2, 2, 27)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1, size=(1, 1, 1, 27)).astype(np.float32)),
    ]
    dec = decode_predictions(heads, CFG)

    def sigmoid(v):
        return 1 / (1 + np.exp(-v))

    # oracle for the first scale, first cell, anchor 0
    p = np.asarray(heads[0])[0, 0, 0, :9]
    s = sigmoid(p)
    stride, anc = 8.0, CFG.anchors[0][0]
    cx = (s[0] * 2 - 0.5 + 0) * stride
    cy = (s[1] * 2 - 0.5 + 0) * stride
    w = (s[2] * 2) ** 2 * anc[0]
    h = (s[3] * 2) ** 2 * anc[1]
    box = np.asarray(dec["boxes"])[0, 0]
    np.testing.assert_allclose(box, [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], rtol=1e-5)
    assert np.asarray(dec["scores"])[0, 0] == pytest.approx(s[4] * sigmoid(p[5:]).max(), rel=1e-5)


def test_bf16_close_to_f32(rng):
    params = init_yolov5(jax.random.PRNGKey(1), CFG)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32))
    h32 = yolov5_forward(params, x, CFG, dtype=jnp.float32)
    h16 = yolov5_forward(params, x, CFG, dtype=jnp.bfloat16)
    # decoded sigmoid-space differences should be small
    d32 = decode_predictions(h32, CFG)
    d16 = decode_predictions(h16, CFG)
    err = np.abs(np.asarray(d32["scores"]) - np.asarray(d16["scores"])).max()
    assert err < 0.1
