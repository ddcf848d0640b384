"""On-device box-crop gather + bilinear resize for ReID embedding.

Replaces the reference's host loop of `ori_img[y1:y2, x1:x2]` +
`cv2.resize(..., (50, 50))` + ImageNet normalize (deep_sort.py:119-129,
feature_extractor.py:26-39) with one fixed-shape gather kernel: all
max_dets crops of a frame are sampled in parallel straight from the
device-resident frame — no host round-trip between detector and embedder.

Semantics matched:
  * integer crop bounds: x1 = max(int(x), 0), x2 = min(int(x + w), W - 1)
    (deep_sort.py:88-107), so the crop spans pixels [x1, x2) x [y1, y2);
  * cv2 bilinear mapping src = (dst + 0.5) * (crop / 50) - 0.5 with edge
    clamping inside the crop;
  * /255 then (v - mean) / std with ImageNet stats.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

CROP_SIZE = 50
# numpy host constants (module-level device arrays would trigger remote
# syncs during tracing on networked TPU backends)
import numpy as _np

_MEAN = _np.asarray((0.485, 0.456, 0.406), _np.float32)
_STD = _np.asarray((0.229, 0.224, 0.225), _np.float32)


def crop_boxes_to_bounds(boxes_xyxy: jax.Array, height: int, width: int):
    """Float xyxy -> integer crop bounds (x1, y1, x2, y2), reference rules."""
    b = boxes_xyxy
    x1 = jnp.maximum(b[..., 0].astype(jnp.int32), 0)
    y1 = jnp.maximum(b[..., 1].astype(jnp.int32), 0)
    x2 = jnp.minimum(b[..., 2].astype(jnp.int32), width - 1)
    y2 = jnp.minimum(b[..., 3].astype(jnp.int32), height - 1)
    return x1, y1, x2, y2


def _bilinear_coords(boxes_xyxy, h: int, w: int, out_size: Tuple[int, int]):
    """Per-crop cv2-bilinear sample coordinates: (y0c, y1c, fy, x0c, x1c, fx)."""
    oh, ow = out_size
    x1, y1, x2, y2 = crop_boxes_to_bounds(boxes_xyxy, h, w)
    cw = jnp.maximum(x2 - x1, 1).astype(jnp.float32)  # crop spans [x1, x2)
    ch = jnp.maximum(y2 - y1, 1).astype(jnp.float32)

    di = jnp.arange(oh, dtype=jnp.float32)  # dst rows
    dj = jnp.arange(ow, dtype=jnp.float32)  # dst cols

    # cv2 bilinear source coords, per box [D, o*]
    sy = y1[:, None].astype(jnp.float32) + jnp.clip(
        (di[None, :] + 0.5) * (ch[:, None] / oh) - 0.5, 0.0, ch[:, None] - 1.0
    )
    sx = x1[:, None].astype(jnp.float32) + jnp.clip(
        (dj[None, :] + 0.5) * (cw[:, None] / ow) - 0.5, 0.0, cw[:, None] - 1.0
    )

    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = sy - y0
    fx = sx - x0
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    return y0c, y1c, fy, x0c, x1c, fx


def _mix_bilinear(r00, r01, r10, r11, fy_, fx_):
    top = r00 * (1 - fx_)[None, :, None] + r01 * fx_[None, :, None]
    bot = r10 * (1 - fx_)[None, :, None] + r11 * fx_[None, :, None]
    return top * (1 - fy_)[:, None, None] + bot * fy_[:, None, None]


@partial(jax.jit, static_argnames=("out_size",))
def gather_crops(
    frame: jax.Array,
    boxes_xyxy: jax.Array,
    valid: jax.Array,
    out_size: Tuple[int, int] = (CROP_SIZE, CROP_SIZE),
) -> jax.Array:
    """Sample normalized [D, oh, ow, 3] crops from one frame.

    frame: [H, W, 3] uint8/float RGB (0..255). boxes: [D, 4] xyxy floats.
    Invalid rows produce all-zero crops.
    """
    h, w, _ = frame.shape
    # keep the gather in the frame's native (usually uint8) dtype — 4x less
    # HBM gather traffic than normalizing the whole frame to f32 first;
    # normalization happens on the tiny [D, oh, ow, 3] result instead
    img = frame
    y0c, y1c, fy, x0c, x1c, fx = _bilinear_coords(boxes_xyxy, h, w, out_size)

    # NOTE on alternatives: expressing the bilinear resize as two MXU matmuls
    # (separable interpolation with one-hot weight matrices) was measured
    # SLOWER on v5e than row gathers at these sizes (~3ms vs ~1.2ms device
    # time for 64 crops) — the [D*oh, H] x [H, W*3] batched matmul tiles
    # poorly at M=50. Row gathers in uint8 keep traffic low.
    def sample_one(y0c_, y1c_, fy_, x0c_, x1c_, fx_):
        r0 = img[y0c_]  # [oh, W, 3] native-dtype row gather
        r1 = img[y1c_]
        r00 = r0[:, x0c_].astype(jnp.float32)  # [oh, ow, 3]
        r01 = r0[:, x1c_].astype(jnp.float32)
        r10 = r1[:, x0c_].astype(jnp.float32)
        r11 = r1[:, x1c_].astype(jnp.float32)
        return _mix_bilinear(r00, r01, r10, r11, fy_, fx_)

    crops = jax.vmap(sample_one)(y0c, y1c, fy, x0c, x1c, fx)  # [D, oh, ow, 3]
    crops = (crops / 255.0 - _MEAN) / _STD
    return jnp.where(valid[:, None, None, None], crops, 0.0)


@partial(jax.jit, static_argnames=("out_size",))
def gather_crops_batch(
    frames: jax.Array,
    frame_idx: jax.Array,
    boxes_xyxy: jax.Array,
    valid: jax.Array,
    out_size: Tuple[int, int] = (CROP_SIZE, CROP_SIZE),
) -> jax.Array:
    """Sample normalized [D, oh, ow, 3] crops, each from its own frame.

    frames: [B, H, W, 3] uint8/float RGB (0..255); frame_idx: [D] i32 source
    frame per crop. Same cv2-bilinear semantics as `gather_crops` — used by
    the batch-global chunked ReID embed so crops from MANY frames share one
    CNN forward regardless of how detections distribute across frames.
    """
    _, h, w, _ = frames.shape
    y0c, y1c, fy, x0c, x1c, fx = _bilinear_coords(boxes_xyxy, h, w, out_size)

    def sample_one(fi, y0c_, y1c_, fy_, x0c_, x1c_, fx_):
        r0 = frames[fi, y0c_]  # [oh, W, 3] native-dtype row gather
        r1 = frames[fi, y1c_]
        r00 = r0[:, x0c_].astype(jnp.float32)  # [oh, ow, 3]
        r01 = r0[:, x1c_].astype(jnp.float32)
        r10 = r1[:, x0c_].astype(jnp.float32)
        r11 = r1[:, x1c_].astype(jnp.float32)
        return _mix_bilinear(r00, r01, r10, r11, fy_, fx_)

    crops = jax.vmap(sample_one)(frame_idx, y0c, y1c, fy, x0c, x1c, fx)
    crops = (crops / 255.0 - _MEAN) / _STD
    return jnp.where(valid[:, None, None, None], crops, 0.0)
