"""YOLOv5 (v6.0 graph) as a pure-JAX NHWC model.

The reference gets this network from torch.hub (`networks/yolo.py:58`); here
it is built natively: CSPDarknet backbone (6x6/s2 stem, C3 stages), SPPF,
PANet neck, and the 3-scale anchor-grid Detect head, with configurable
depth/width multiples for the n/s/m/l/x variants (model_name from
configs.yaml, README.md:50-53 uses yolov5s and yolov5m).

Design for TPU:
  * fixed static input shape (letterboxed upstream, ops/letterbox.py);
  * all convs pre-fused with BN (models/convert.py) -> conv+bias+SiLU,
    which XLA fuses to single MXU ops; bf16 activations, f32 accumulation;
  * decode emits a FIXED [B, A, 4+1+nc] tensor (A = total anchors) — no
    data-dependent shapes; NMS (ops/nms.py) keeps shapes fixed through to
    the host boundary.

Structure of the params pytree mirrors the canonical module indexing
(layer 0..24) so checkpoint conversion is a pure name map.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.layers import (
    conv_block,
    init_conv,
    max_pool,
    upsample2x_nearest,
)

# depth_multiple, width_multiple per variant (public yolov5 model family)
VARIANTS: Dict[str, Tuple[float, float]] = {
    "yolov5n": (0.33, 0.25),
    "yolov5s": (0.33, 0.50),
    "yolov5m": (0.67, 0.75),
    "yolov5l": (1.00, 1.00),
    "yolov5x": (1.33, 1.25),
}

# COCO anchors (pixels) per detection scale P3/P4/P5
DEFAULT_ANCHORS: Tuple[Tuple[Tuple[float, float], ...], ...] = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(int(math.ceil(x / divisor) * divisor), divisor)


@dataclass(frozen=True)
class YoloConfig:
    variant: str = "yolov5s"
    num_classes: int = 80
    anchors: Tuple = DEFAULT_ANCHORS
    strides: Tuple[int, ...] = STRIDES

    @property
    def depth_multiple(self) -> float:
        return VARIANTS[self.variant][0]

    @property
    def width_multiple(self) -> float:
        return VARIANTS[self.variant][1]

    def width(self, c: int) -> int:
        return make_divisible(c * self.width_multiple, 8)

    def depth(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1) if n > 1 else n

    @property
    def na(self) -> int:
        return len(self.anchors[0])

    @property
    def no(self) -> int:
        return self.num_classes + 5


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_c3(key, cin: int, cout: int, n: int, e: float = 0.5) -> Dict[str, Any]:
    ch = int(cout * e)
    keys = jax.random.split(key, 3 + 2 * n)
    p = {
        "cv1": init_conv(keys[0], 1, cin, ch),
        "cv2": init_conv(keys[1], 1, cin, ch),
        "cv3": init_conv(keys[2], 1, 2 * ch, cout),
        "m": [],
    }
    for i in range(n):
        p["m"].append(
            {
                "cv1": init_conv(keys[3 + 2 * i], 1, ch, ch),
                "cv2": init_conv(keys[4 + 2 * i], 3, ch, ch),
            }
        )
    return p


def _init_sppf(key, cin: int, cout: int) -> Dict[str, Any]:
    ch = cin // 2
    k1, k2 = jax.random.split(key)
    return {"cv1": init_conv(k1, 1, cin, ch), "cv2": init_conv(k2, 1, ch * 4, cout)}


def init_yolov5(key, cfg: YoloConfig) -> Dict[str, Any]:
    """Random-init full param pytree (layer index -> module params)."""
    w, d = cfg.width, cfg.depth
    keys = iter(jax.random.split(key, 32))
    c64, c128, c256, c512, c1024 = w(64), w(128), w(256), w(512), w(1024)
    layers: Dict[str, Any] = {}
    # backbone
    layers["0"] = init_conv(next(keys), 6, 3, c64)                   # P1/2
    layers["1"] = init_conv(next(keys), 3, c64, c128)                # P2/4
    layers["2"] = _init_c3(next(keys), c128, c128, d(3))
    layers["3"] = init_conv(next(keys), 3, c128, c256)               # P3/8
    layers["4"] = _init_c3(next(keys), c256, c256, d(6))
    layers["5"] = init_conv(next(keys), 3, c256, c512)               # P4/16
    layers["6"] = _init_c3(next(keys), c512, c512, d(9))
    layers["7"] = init_conv(next(keys), 3, c512, c1024)              # P5/32
    layers["8"] = _init_c3(next(keys), c1024, c1024, d(3))
    layers["9"] = _init_sppf(next(keys), c1024, c1024)
    # head (PANet)
    layers["10"] = init_conv(next(keys), 1, c1024, c512)
    layers["13"] = _init_c3(next(keys), c1024, c512, d(3))           # after concat w/ P4
    layers["14"] = init_conv(next(keys), 1, c512, c256)
    layers["17"] = _init_c3(next(keys), c512, c256, d(3))            # P3 out
    layers["18"] = init_conv(next(keys), 3, c256, c256)
    layers["20"] = _init_c3(next(keys), c512, c512, d(3))            # P4 out
    layers["21"] = init_conv(next(keys), 3, c512, c512)
    layers["23"] = _init_c3(next(keys), c1024, c1024, d(3))          # P5 out
    # detect head: one 1x1 conv per scale
    layers["24"] = {
        "m": [
            init_conv(next(keys), 1, c, cfg.na * cfg.no)
            for c in (c256, c512, c1024)
        ]
    }
    return layers


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _c3(p, x, *, shortcut: bool, dtype):
    y1 = conv_block(p["cv1"], x, dtype=dtype)
    for m in p["m"]:
        h = conv_block(m["cv1"], y1, dtype=dtype)
        h = conv_block(m["cv2"], h, dtype=dtype)
        y1 = y1 + h if shortcut else h
    y2 = conv_block(p["cv2"], x, dtype=dtype)
    return conv_block(p["cv3"], jnp.concatenate([y1, y2], axis=-1), dtype=dtype)


def _sppf(p, x, *, dtype):
    y = conv_block(p["cv1"], x, dtype=dtype)
    m1 = max_pool(y, 5, 1, 2)
    m2 = max_pool(m1, 5, 1, 2)
    m3 = max_pool(m2, 5, 1, 2)
    return conv_block(p["cv2"], jnp.concatenate([y, m1, m2, m3], axis=-1), dtype=dtype)


def yolov5_forward(params, images, cfg: YoloConfig, *, dtype=jnp.bfloat16) -> List[jax.Array]:
    """Raw 3-scale head outputs.

    images: [B, H, W, 3] float32 in [0,1] (letterboxed).
    Returns [B, Hs, Ws, na*no] per scale, float32.
    """
    L = params
    x = images
    x = conv_block(L["0"], x, stride=2, padding=2, dtype=dtype)
    x = conv_block(L["1"], x, stride=2, dtype=dtype)
    x = _c3(L["2"], x, shortcut=True, dtype=dtype)
    x = conv_block(L["3"], x, stride=2, dtype=dtype)
    p3 = _c3(L["4"], x, shortcut=True, dtype=dtype)
    x = conv_block(L["5"], p3, stride=2, dtype=dtype)
    p4 = _c3(L["6"], x, shortcut=True, dtype=dtype)
    x = conv_block(L["7"], p4, stride=2, dtype=dtype)
    x = _c3(L["8"], x, shortcut=True, dtype=dtype)
    p5 = _sppf(L["9"], x, dtype=dtype)
    # PANet top-down
    t10 = conv_block(L["10"], p5, dtype=dtype)
    x = jnp.concatenate([upsample2x_nearest(t10), p4], axis=-1)
    x = _c3(L["13"], x, shortcut=False, dtype=dtype)
    t14 = conv_block(L["14"], x, dtype=dtype)
    x = jnp.concatenate([upsample2x_nearest(t14), p3], axis=-1)
    o3 = _c3(L["17"], x, shortcut=False, dtype=dtype)
    # bottom-up
    x = conv_block(L["18"], o3, stride=2, dtype=dtype)
    x = jnp.concatenate([x, t14], axis=-1)
    o4 = _c3(L["20"], x, shortcut=False, dtype=dtype)
    x = conv_block(L["21"], o4, stride=2, dtype=dtype)
    x = jnp.concatenate([x, t10], axis=-1)
    o5 = _c3(L["23"], x, shortcut=False, dtype=dtype)
    heads = []
    for m, o in zip(L["24"]["m"], (o3, o4, o5)):
        # heads stay in the compute dtype: bf16 -> f32 casting is exact, so
        # decode gets identical values either way, and keeping bf16 halves
        # the [B, A, 85] slice/reduce traffic in the decode tail (the cast
        # of head0 alone cost 26 us/frame on v5e)
        heads.append(conv_block(m, o, act=False, dtype=dtype))
    return heads


def decode_predictions(heads: Sequence[jax.Array], cfg: YoloConfig) -> Dict[str, jax.Array]:
    """Anchor-grid decode to input-pixel space, fixed [B, A, ...] shapes.

    v5 decode: s = sigmoid(raw); xy = (2*s_xy - 0.5 + grid) * stride;
    wh = (2*s_wh)^2 * anchor; score = obj * cls (multi_label=False: best
    class only, matching networks/yolo.py:65).

    Heads may arrive in bf16 (the conv compute dtype): slices and the class
    max/argmax run in that dtype (bf16->f32 casting is exact, so comparisons
    and tie-breaks are identical to an f32 decode of the same heads — this
    halves the [B, A, nc] slice/reduce traffic, the decode tail's main cost
    on v5e), and every transcendental/box output is computed and returned in
    f32. The class max/argmax also runs on LOGITS: sigmoid is monotone, so
    sigmoid(max(logits)) == max(sigmoid(logits)) with the same argmax; one
    scalar sigmoid per anchor replaces an nc-wide one.
    """
    outs_box, outs_score, outs_cls = [], [], []
    for head, stride, anchors in zip(heads, cfg.strides, cfg.anchors):
        b, h, w, _ = head.shape
        na, no = cfg.na, cfg.no
        p = head.reshape(b, h, w, na, no)
        # slice raw logits FIRST and sigmoid per consumer slice — avoids
        # materializing sigmoid over the whole [B,h,w,na,85] tensor
        s_xywh = jax.nn.sigmoid(p[..., 0:4].astype(jnp.float32))
        obj = jax.nn.sigmoid(p[..., 4].astype(jnp.float32))
        cls_logit = p[..., 5:]  # native (possibly bf16) dtype
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # [1,h,w,1,2]
        anc = jnp.asarray(anchors, jnp.float32)[None, None, None, :, :]  # [1,1,1,na,2]
        xy = (s_xywh[..., 0:2] * 2.0 - 0.5 + grid) * float(stride)
        wh = jnp.square(s_xywh[..., 2:4] * 2.0) * anc
        cxcywh = jnp.concatenate([xy, wh], axis=-1)
        outs_box.append(cxcywh.reshape(b, h * w * na, 4))
        outs_score.append(obj.reshape(b, h * w * na))
        outs_cls.append(cls_logit.reshape(b, h * w * na, cfg.num_classes))
    boxes = jnp.concatenate(outs_box, axis=1)  # [B, A, 4] cxcywh
    obj = jnp.concatenate(outs_score, axis=1)  # [B, A]
    cls_logit = jnp.concatenate(outs_cls, axis=1)  # [B, A, nc] raw logits
    # class max/argmax AFTER the concat (one [B, A, nc] reduce tiles far
    # better than per-head [b,h,w,na,nc] reduces — measured 2.5x on v5e)
    best_cls = jnp.argmax(cls_logit, axis=-1).astype(jnp.int32)
    best_cls_p = jax.nn.sigmoid(jnp.max(cls_logit, axis=-1).astype(jnp.float32))
    # full per-class probabilities only for callers that read them (WBF /
    # evaluation); dead-code-eliminated out of the detect+track path
    cls = jax.nn.sigmoid(cls_logit.astype(jnp.float32))
    scores = obj * best_cls_p
    x1 = boxes[..., 0] - boxes[..., 2] / 2
    y1 = boxes[..., 1] - boxes[..., 3] / 2
    xyxy = jnp.stack([x1, y1, x1 + boxes[..., 2], y1 + boxes[..., 3]], axis=-1)
    return {"boxes": xyxy, "scores": scores, "classes": best_cls, "cls_probs": cls, "obj": obj}
