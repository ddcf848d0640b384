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


def _columns_matmul(rows: jax.Array, x0c, x1c, fx, w: int, dtype) -> jax.Array:
    """Column bilinear interpolation as a one-hot batched matmul.

    rows: [D, R, W, C] native dtype (uint8). Returns [D, R, ow, C] f32.

    The one-hot weight matrix sel[d, w, o] carries BOTH column taps
    ((1-fx) at x0c, fx at x1c; at clamp edges the taps coincide and the
    weights sum to 1), so one W-contraction on the MXU replaces the four
    per-(crop, pixel) column gathers of the naive form — XLA lowers those
    to element fetches (~11 us/crop measured on v5e at 640x640 sources);
    the contraction is ~0.6 MMAC/crop. dtype=bfloat16 halves operand
    traffic on TPU (uint8 pixel values are exact in bf16; weights lose
    <=2^-9 relative — immaterial ahead of a bf16 CNN); None keeps f32
    (used by CPU tests, exact). The bf16 mode is applied on TPU only: the
    CPU multi-process (thunk) runtime rejects BF16 x BF16 -> F32 dots, and
    on CPU the f32 path is the exact-parity reference anyway.
    """
    use_bf16 = dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    w0 = (1.0 - fx)[:, None, :].astype(cdt)
    w1 = fx[:, None, :].astype(cdt)
    zero = jnp.zeros((), cdt)
    sel = jnp.where(iw == x0c[:, None, :], w0, zero) + jnp.where(
        iw == x1c[:, None, :], w1, zero
    )  # [D, W, ow]
    return jnp.einsum(
        "drwc,dwo->droc",
        rows.astype(cdt),
        sel,
        preferred_element_type=jnp.float32,
    )


def _resize_rows(rows: jax.Array, fy, x0c, x1c, fx, w: int, oh: int, dtype):
    """[D, 2*oh, W, C] stacked row taps -> [D, oh, ow, C] f32 bilinear."""
    mixed = _columns_matmul(rows, x0c, x1c, fx, w, dtype)
    return (
        mixed[:, :oh] * (1.0 - fy)[:, :, None, None]
        + mixed[:, oh:] * fy[:, :, None, None]
    )


@partial(jax.jit, static_argnames=("out_size", "dtype"))
def gather_crops(
    frame: jax.Array,
    boxes_xyxy: jax.Array,
    valid: jax.Array,
    out_size: Tuple[int, int] = (CROP_SIZE, CROP_SIZE),
    dtype=None,
) -> jax.Array:
    """Sample normalized [D, oh, ow, 3] crops from one frame.

    frame: [H, W, 3] uint8/float RGB (0..255). boxes: [D, 4] xyxy floats.
    Invalid rows produce all-zero crops.

    Rows are gathered in the frame's native (usually uint8) dtype — they are
    contiguous 3*W-byte slices, which XLA moves at near memory bandwidth;
    both vertical taps share ONE gather. Column interpolation then runs as a
    one-hot matmul (`_columns_matmul`) instead of per-element gathers.
    """
    h, w, _ = frame.shape
    oh, _ = out_size
    y0c, y1c, fy, x0c, x1c, fx = _bilinear_coords(boxes_xyxy, h, w, out_size)
    rows = frame[jnp.concatenate([y0c, y1c], axis=1)]  # [D, 2*oh, W, 3]
    crops = _resize_rows(rows, fy, x0c, x1c, fx, w, oh, dtype)
    crops = (crops / 255.0 - _MEAN) / _STD
    return jnp.where(valid[:, None, None, None], crops, 0.0)


@partial(jax.jit, static_argnames=("out_size", "dtype"))
def gather_crops_batch(
    frames: jax.Array,
    frame_idx: jax.Array,
    boxes_xyxy: jax.Array,
    valid: jax.Array,
    out_size: Tuple[int, int] = (CROP_SIZE, CROP_SIZE),
    dtype=None,
) -> jax.Array:
    """Sample normalized [D, oh, ow, 3] crops, each from its own frame.

    frames: [B, H, W, 3] uint8/float RGB (0..255); frame_idx: [D] i32 source
    frame per crop. Same cv2-bilinear semantics as `gather_crops` — used by
    the batch-global chunked ReID embed so crops from MANY frames share one
    CNN forward regardless of how detections distribute across frames.
    """
    _, h, w, _ = frames.shape
    oh, _ = out_size
    y0c, y1c, fy, x0c, x1c, fx = _bilinear_coords(boxes_xyxy, h, w, out_size)
    y_idx = jnp.concatenate([y0c, y1c], axis=1)  # [D, 2*oh]
    rows = frames[frame_idx[:, None], y_idx]     # [D, 2*oh, W, 3] row gather
    crops = _resize_rows(rows, fy, x0c, x1c, fx, w, oh, dtype)
    crops = (crops / 255.0 - _MEAN) / _STD
    return jnp.where(valid[:, None, None, None], crops, 0.0)
