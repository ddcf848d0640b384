"""On-device letterbox preprocessing and coordinate restore.

The reference delegates letterboxing to ultralytics AutoShape (loaded at
networks/yolo.py:58) with the LongestMaxSize+Pad contract also spelled out in
augmentations/transforms.py:50-55 and the inverse in
utilities/postprocess.py:72-126. TPU-native version: fixed output shape
(static under jit), bilinear resize + symmetric 114-gray padding fused into
one compiled op; the inverse maps detector boxes back to source pixels.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0  # ultralytics letterbox fill gray


def autoshape_hw(
    src_hw: Tuple[int, int], size, stride: int = 32
) -> Tuple[int, int]:
    """Network input (h, w) the reference's AutoShape actually infers at.

    The reference runs inference through ultralytics AutoShape with NO size
    argument (/root/reference/networks/yolo.py:70 — `self.model(inputs)`),
    so the network never sees the config's square image_size: AutoShape
    ratio-scales each source dim by size / max(src) and rounds each UP to
    the next stride-`stride` multiple (720x1280 @ 640 -> 384x640, padding
    only 24 gray rows — not the 280 a full 640x640 square would add). The
    config's image_size feeds only a constructed-but-never-applied
    albumentations pipeline (/root/reference/modules/datasets.py:19-22).

    Replicates AutoShape.forward's float math exactly: g = size / max(s)
    (float64), per-dim make_divisible(x) = ceil(x / stride) * stride.
    `size` may be a scalar or the config's [h, w] pair (max is used, which
    is what reaching AutoShape's single `size` int would do).
    """
    sh, sw = src_hw
    if not isinstance(size, (int, float)):
        size = max(size)
    g = float(size) / float(max(sh, sw))
    return (
        int(math.ceil(sh * g / stride) * stride),
        int(math.ceil(sw * g / stride) * stride),
    )


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


def content_rows(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]) -> Tuple[int, int]:
    """(top, ch): content row offset and even-aligned content height.

    The letterboxed frame is mostly constant gray padding (720p -> 640x640
    keeps only 360 content rows); the content-only upload ships just those
    rows. ch is new_h rounded up to even so the I420 chroma planes tile;
    exactness vs the full-frame path additionally needs `top` even so 2x2
    chroma blocks never straddle the content/pad boundary (checked by
    `content_upload_exact`).
    """
    dh, dw = dst_hw
    gain, pad_x, pad_y, new_w, new_h = letterbox_params(src_hw, dst_hw)
    top = int(round(pad_y - 0.1))
    ch = new_h + (new_h & 1)
    return top, min(ch, dh - top)


def content_upload_exact(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]) -> bool:
    """True when the content-only upload is bit-identical to full-frame."""
    top, ch = content_rows(src_hw, dst_hw)
    _, _, _, _, new_h = letterbox_params(src_hw, dst_hw)
    return top % 2 == 0 and ch == new_h


def _gray_yuv():
    """I420 bytes cv2 produces for the uniform 114-gray padding."""
    import cv2
    import numpy as np

    g = cv2.cvtColor(np.full((2, 2, 3), int(PAD_VALUE), np.uint8), cv2.COLOR_RGB2YUV_I420)
    return int(g[0, 0]), int(g[2, 0]), int(g[2, 1])  # y, u, v


_CV_POOL = None


def _cv_pool():
    """Shared thread pool for per-frame cv2 work (cv2 releases the GIL).

    At YOLOv5s-640 the serial letterbox+I420 costs ~1.9 ms/frame — the same
    order as the device step — so on multi-core hosts the conversion threads
    out; on 1-CPU containers it stays serial (pool overhead only hurts).
    """
    global _CV_POOL
    import os

    n = min(8, os.cpu_count() or 1)
    if n <= 1:
        return None
    if _CV_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _CV_POOL = ThreadPoolExecutor(n)
    return _CV_POOL


def host_letterbox_yuv420(frames, dst_hw: Tuple[int, int], content_only: bool = False):
    """Letterbox + RGB->I420 on host: [B, dh*3/2, dw] uint8.

    Video sources are 4:2:0 to begin with, so shipping planar YUV420 to the
    device halves host->device bytes with no information the codec hadn't
    already discarded. Reconstruct with `yuv420_to_rgb` on device.

    content_only=True ships ONLY the content rows ([B, ch*3/2, dw]) and the
    device re-inserts the constant gray padding (`yuv420_content_to_full`):
    another ~1.8x transfer cut at 720p->640, bit-identical to the full path
    whenever `content_upload_exact` holds (it does for the standard 16:9
    inputs; callers should fall back to full frames otherwise).
    """
    import cv2
    import numpy as np

    b, sh, sw, c = frames.shape
    dh, dw = dst_hw
    pool = _cv_pool()
    if content_only:
        gain, pad_x, pad_y, new_w, new_h = letterbox_params((sh, sw), (dh, dw))
        top, ch = content_rows((sh, sw), (dh, dw))
        left = int(round(pad_x - 0.1))
        out = np.empty((b, ch * 3 // 2, dw), np.uint8)

        def one(i):
            strip = np.full((ch, dw, c), int(PAD_VALUE), np.uint8)
            r = cv2.resize(frames[i], (new_w, new_h), interpolation=cv2.INTER_LINEAR)
            strip[:new_h, left : left + new_w] = r
            out[i] = cv2.cvtColor(strip, cv2.COLOR_RGB2YUV_I420)

        if pool is None:
            for i in range(b):
                one(i)
        else:
            list(pool.map(one, range(b)))
        return out

    lb = host_letterbox(frames, dst_hw)
    out = np.empty((b, dh * 3 // 2, dw), np.uint8)

    def one_full(i):
        out[i] = cv2.cvtColor(lb[i], cv2.COLOR_RGB2YUV_I420)

    if pool is None:
        for i in range(b):
            one_full(i)
    else:
        list(pool.map(one_full, range(b)))
    return out


def yuv420_content_to_full(
    yuv_c: jax.Array, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]
) -> jax.Array:
    """Re-insert the gray padding rows into a content-only I420 upload.

    yuv_c: [B, ch*3/2, dw] from host_letterbox_yuv420(content_only=True).
    Returns [B, dh*3/2, dw] equal to the full-frame host conversion (given
    `content_upload_exact`), so everything downstream is unchanged.
    """
    b, ch15, w = yuv_c.shape
    ch = ch15 * 2 // 3
    dh, dw = dst_hw
    top, ch_expect = content_rows(src_hw, dst_hw)
    assert ch == ch_expect and w == dw, (yuv_c.shape, src_hw, dst_hw)
    yg, ug, vg = _gray_yuv()

    y = yuv_c[:, :ch, :]
    u = yuv_c[:, ch : ch + ch // 4, :].reshape(b, ch // 2, w // 2)
    v = yuv_c[:, ch + ch // 4 :, :].reshape(b, ch // 2, w // 2)

    yf = jnp.full((b, dh, w), yg, jnp.uint8)
    yf = jax.lax.dynamic_update_slice(yf, y, (0, top, 0))
    uf = jnp.full((b, dh // 2, w // 2), ug, jnp.uint8)
    uf = jax.lax.dynamic_update_slice(uf, u, (0, top // 2, 0))
    vf = jnp.full((b, dh // 2, w // 2), vg, jnp.uint8)
    vf = jax.lax.dynamic_update_slice(vf, v, (0, top // 2, 0))
    return jnp.concatenate(
        [yf, uf.reshape(b, dh // 4, w), vf.reshape(b, dh // 4, w)], axis=1
    )


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


def yuv420_to_rgb_u8(yuv: jax.Array) -> jax.Array:
    """`yuv420_to_rgb(yuv).astype(uint8)` with identical outputs, cheaper.

    Two exact rewrites (array_equal-verified on-chip and in
    tests/test_yuv420.py; benchmarks/micro/yuv_bench.py: 0.115 -> 0.081
    ms/frame at B=128 640x640 on v5e):
      * the nearest 2x chroma upsample runs on the uint8 planes BEFORE the
        f32 cast (repeat and cast commute exactly — 4x less repeat traffic);
      * each channel clips + converts to uint8 BEFORE the [B, H, W, 3]
        stack, so the clip/convert fuse into the per-channel combos and the
        interleaved buffer materializes in u8, not f32.
    """
    b, h15, w = yuv.shape
    h = h15 * 2 // 3
    y = (yuv[:, :h, :].astype(jnp.float32) - 16.0) * 1.163999557
    u8_ = yuv[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v8_ = yuv[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
    u = jnp.repeat(jnp.repeat(u8_, 2, axis=1), 2, axis=2).astype(
        jnp.float32
    ) - 128.0
    v = jnp.repeat(jnp.repeat(v8_, 2, axis=1), 2, axis=2).astype(
        jnp.float32
    ) - 128.0
    r = jnp.clip(y + 1.596026612 * v, 0.0, 255.0).astype(jnp.uint8)
    g = jnp.clip(
        y - 0.391762290 * u - 0.812967647 * v, 0.0, 255.0
    ).astype(jnp.uint8)
    bl = jnp.clip(y + 2.017232143 * u, 0.0, 255.0).astype(jnp.uint8)
    return jnp.stack([r, g, bl], axis=-1)


def yuv420_to_rgb_u8_planar(yuv: jax.Array) -> jax.Array:
    """`yuv420_to_rgb_u8` with PLANAR output [B, 3, H, W] (same bytes).

    transpose(yuv420_to_rgb_u8(x), (0, 3, 1, 2)) by construction — the
    channel planes are simply never interleaved. The Pallas crop-DMA kernel
    wants planar input anyway (ops/pallas/crops.py transposes first), and
    skipping the [B, H, W, 3] stack avoids ~1.2 MB/frame of u8 interleave
    copies in the fused detect program (profiled ~20 us/frame at B=128
    on v5e as broadcast+copy fusions).
    """
    b, h15, w = yuv.shape
    h = h15 * 2 // 3
    y = (yuv[:, :h, :].astype(jnp.float32) - 16.0) * 1.163999557
    u8_ = yuv[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v8_ = yuv[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
    u = jnp.repeat(jnp.repeat(u8_, 2, axis=1), 2, axis=2).astype(
        jnp.float32
    ) - 128.0
    v = jnp.repeat(jnp.repeat(v8_, 2, axis=1), 2, axis=2).astype(
        jnp.float32
    ) - 128.0
    r = jnp.clip(y + 1.596026612 * v, 0.0, 255.0).astype(jnp.uint8)
    g = jnp.clip(
        y - 0.391762290 * u - 0.812967647 * v, 0.0, 255.0
    ).astype(jnp.uint8)
    bl = jnp.clip(y + 2.017232143 * u, 0.0, 255.0).astype(jnp.uint8)
    return jnp.stack([r, g, bl], axis=1)


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
