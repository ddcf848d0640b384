"""On-device letterbox preprocessing and coordinate restore.

The reference delegates letterboxing to ultralytics AutoShape (loaded at
networks/yolo.py:58) with the LongestMaxSize+Pad contract also spelled out in
augmentations/transforms.py:50-55 and the inverse in
utilities/postprocess.py:72-126. TPU-native version: fixed output shape
(static under jit), bilinear resize + symmetric 114-gray padding fused into
one compiled op; the inverse maps detector boxes back to source pixels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0  # ultralytics letterbox fill gray


def letterbox_params(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    """Static (Python) letterbox geometry: scale gain and per-side padding.

    Matches the contract of utilities/postprocess.py:72-109: gain =
    min(dst/src), symmetric padding of the short side (split half/half).
    Returns (gain, pad_x, pad_y, new_w, new_h) as Python floats/ints so the
    jitted graph sees constants.
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    gain = min(dh / sh, dw / sw)
    new_w, new_h = round(sw * gain), round(sh * gain)
    pad_x = (dw - new_w) / 2
    pad_y = (dh - new_h) / 2
    return gain, pad_x, pad_y, new_w, new_h


def letterbox(images: jax.Array, dst_hw: Tuple[int, int]) -> jax.Array:
    """Letterbox a batch of uint8/float RGB frames to dst_hw, normalized /255.

    Args:
      images: [B, H, W, 3] (uint8 or float, 0..255).
      dst_hw: static (height, width) target, e.g. (640, 640).

    Returns:
      [B, dh, dw, 3] float32 in [0, 1] with gray padding.
    """
    b, sh, sw, c = images.shape
    dh, dw = dst_hw
    gain, pad_x, pad_y, new_w, new_h = letterbox_params((sh, sw), (dh, dw))

    x = images.astype(jnp.float32)
    x = jax.image.resize(x, (b, new_h, new_w, c), method="bilinear")
    top, left = int(round(pad_y - 0.1)), int(round(pad_x - 0.1))
    out = jnp.full((b, dh, dw, c), PAD_VALUE, dtype=jnp.float32)
    out = jax.lax.dynamic_update_slice(out, x, (0, top, left, 0))
    return out / 255.0


def host_letterbox(frames: "object", dst_hw: Tuple[int, int]):
    """cv2 letterbox on host (uint8 in/out) — same geometry as `letterbox`.

    Used by the upload-thin path: sending 640x640 letterboxed uint8 instead
    of full-resolution frames cuts host->device bytes ~2.2x for 720p; the
    device then only divides by 255. Crops for ReID are taken from the
    letterboxed frame via the (gain, pad) transform.
    """
    import cv2
    import numpy as np

    b, sh, sw, c = frames.shape
    dh, dw = dst_hw
    gain, pad_x, pad_y, new_w, new_h = letterbox_params((sh, sw), (dh, dw))
    top, left = int(round(pad_y - 0.1)), int(round(pad_x - 0.1))
    out = np.full((b, dh, dw, c), int(PAD_VALUE), dtype=np.uint8)
    for i in range(b):
        r = cv2.resize(frames[i], (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        out[i, top : top + new_h, left : left + new_w] = r
    return out


def host_letterbox_yuv420(frames, dst_hw: Tuple[int, int]):
    """Letterbox + RGB->I420 on host: [B, dh*3/2, dw] uint8.

    Video sources are 4:2:0 to begin with, so shipping planar YUV420 to the
    device halves host->device bytes with no information the codec hadn't
    already discarded. Reconstruct with `yuv420_to_rgb` on device.
    """
    import cv2
    import numpy as np

    lb = host_letterbox(frames, dst_hw)
    b = lb.shape[0]
    dh, dw = dst_hw
    out = np.empty((b, dh * 3 // 2, dw), np.uint8)
    for i in range(b):
        out[i] = cv2.cvtColor(lb[i], cv2.COLOR_RGB2YUV_I420)
    return out


def yuv420_to_rgb(yuv: jax.Array) -> jax.Array:
    """Device-side I420 -> RGB (float32, 0..255). yuv: [B, H*3/2, W] uint8.

    BT.601 STUDIO swing (Y in [16, 235]), matching cv2.COLOR_RGB2YUV_I420 /
    COLOR_YUV2RGB_I420.
    """
    b, h15, w = yuv.shape
    h = h15 * 2 // 3
    x = yuv.astype(jnp.float32)
    y = (x[:, :h, :] - 16.0) * 1.163999557
    u = x[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v = x[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
    # nearest 2x chroma upsample
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    r = y + 1.596026612 * v
    g = y - 0.391762290 * u - 0.812967647 * v
    bl = y + 2.017232143 * u
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)


def restore_boxes(
    boxes: jax.Array, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]
) -> jax.Array:
    """Map xyxy boxes from letterboxed coords back to source-frame pixels.

    Inverse of `letterbox` (reference contract: utilities/postprocess.py:
    72-126 — subtract pad, divide gain, clip to source bounds).
    boxes: [..., 4] xyxy in dst (letterboxed) pixel space.
    """
    gain, pad_x, pad_y, _, _ = letterbox_params(src_hw, dst_hw)
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    sh, sw = src_hw
    out = jnp.concatenate(
        [
            (x1 - pad_x) / gain,
            (y1 - pad_y) / gain,
            (x2 - pad_x) / gain,
            (y2 - pad_y) / gain,
        ],
        axis=-1,
    )
    return jnp.concatenate(
        [
            jnp.clip(out[..., 0:1], 0, sw),
            jnp.clip(out[..., 1:2], 0, sh),
            jnp.clip(out[..., 2:3], 0, sw),
            jnp.clip(out[..., 3:4], 0, sh),
        ],
        axis=-1,
    )
