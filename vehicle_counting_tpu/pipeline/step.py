"""The fused per-batch device step: detect + track for B frames in ONE jit.

Call stack equivalent in the reference (modules/__init__.py:54-84): per
frame, detector forward -> per-class DeepSort updates — a Python loop with a
GPU sync per stage. Here the whole batch is one XLA program:

    letterbox -> YOLOv5 -> decode -> NMS -> restore -> class-map
    -> lax.scan over frames [ crops -> ReID -> per-class tracker scan ]

One host->device transfer (the frame batch) and one small readback (the
[B, C, K] track outputs) per batch; everything else stays in HBM. This is
what makes the tunnel/PCIe dispatch latency amortize: per-frame Python
dispatch would cost more than the compute itself.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# channel-planar pixel path (see the letterboxed_yuv420 branch below);
# read at trace time so stage_bench can A/B it per process. Default ON:
# bit-identical (tests/test_yuv420.py) and measured e2e 0.936 -> 0.924
# ms/frame at B=128 on v5e (the [B, H, W, 3] interleave copies disappear;
# the Pallas crop kernel consumes planar directly).
_PLANAR_PIXELS = os.environ.get("VCT_PLANAR_PIXELS", "1") == "1"

from vehicle_counting_tpu.models.detector import fused_detect_tail
from vehicle_counting_tpu.models.yolo import YoloConfig, yolov5_forward
from vehicle_counting_tpu.ops.letterbox import letterbox, restore_boxes
from vehicle_counting_tpu.tracking.deepsort import (
    DeepSortParams,
    deepsort_frame_core,
    embed_detections_batch,
)
from vehicle_counting_tpu.tracking.tracker import TrackerOutputs


@partial(
    jax.jit,
    static_argnames=(
        "ycfg", "image_size", "src_hw", "max_det", "dtype", "content_only",
    ),
)
def detect_only_step(
    yolo_params,
    yuv: jax.Array,  # [B, H*3/2, W] host-letterboxed I420 (content rows or full)
    *,
    ycfg: YoloConfig,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    content_only: bool = False,
):
    """Detection-only device step on the thin-upload I420 pixel path.

    Identical pixel path to pipeline_batch_step's letterboxed_yuv420 branch
    (I420 -> u8 RGB -> /255 -> YOLOv5 -> fused tail -> source-pixel
    restore), minus ReID/tracking — BASELINE config 1 (reference
    ImageDetect.run, modules/detect.py:30-60).
    """
    from vehicle_counting_tpu.ops.letterbox import (
        yuv420_content_to_full,
        yuv420_to_rgb_u8,
    )

    if content_only:
        yuv = yuv420_content_to_full(yuv, src_hw, image_size)
    imgs = (yuv420_to_rgb_u8(yuv).astype(jnp.float32) / 255.0).astype(dtype)
    heads = yolov5_forward(yolo_params, imgs, ycfg, dtype=dtype)
    out = fused_detect_tail(
        heads, ycfg,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
    )
    out["boxes"] = (
        restore_boxes(out["boxes"], src_hw, image_size)
        * out["valid"][..., None]
    )
    return out


def detect_embed_core(
    yolo_params,
    reid_params,
    reid_stats,
    frames: jax.Array,       # [B, H, W, 3] uint8 RGB (or thin-upload encodings)
    frame_valid: jax.Array,  # [B] bool (tail padding of the last batch)
    class_lut: jax.Array,    # [nc] i32: detector class -> tracked class (-1 drops)
    *,
    ycfg: YoloConfig,
    hp: DeepSortParams,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "raw_rgb",
):
    """The FRAME-INDEPENDENT front of the fused step: pixels -> YOLOv5 ->
    decode/NMS/restore -> class map -> ReID embed. Returns (det, feats).

    Every output is per-frame with no cross-frame coupling (detection and
    per-crop ReID embeddings do not depend on which frames share the batch),
    which is what lets parallel/frames.py shard this part over a mesh 'frame'
    axis while the recurrent tracker scan consumes the gathered results.
    """
    from vehicle_counting_tpu.ops.letterbox import (
        letterbox_params,
        yuv420_content_to_full,
        yuv420_to_rgb_u8,
    )

    planar = False
    if frames_format == "raw_rgb":
        # cast to the conv compute dtype HERE (values identical to casting
        # inside the first conv block, since /255 happens in f32 either
        # way): the cast then fuses into the producing fusion instead of
        # materializing a separate [B, dh, dw, 3] f32 image (~20 us/frame
        # of pure HBM traffic on v5e)
        imgs = letterbox(frames, image_size).astype(dtype)
        crop_source = frames
        crop_kw = dict(out_hw=src_hw)
    else:
        if frames_format == "letterboxed_yuv420":
            if frames.shape[1] != image_size[0] * 3 // 2:
                # content-only upload: re-insert the constant gray padding
                frames = yuv420_content_to_full(frames, src_hw, image_size)
            # quantized ONCE to uint8 — the only materialized full-res
            # buffer (157 MB/batch at B=128 vs 629 MB for f32 rgb, which
            # previously fed two consumers). This is also the reference's
            # exact pixel path: video decode yields uint8 RGB, the detector
            # sees u8/255 (utilities/postprocess.py letterbox on uint8
            # frames). yuv420_to_rgb_u8 == yuv420_to_rgb + u8 cast exactly.
            if _PLANAR_PIXELS:
                # channel-PLANAR u8 [B, 3, H, W]: same bytes, never
                # interleaved — the Pallas crop kernel consumes planar
                # directly and the [B, H, W, 3] stack's interleave copies
                # (~20 us/frame at B=128, profiled) disappear; the detector
                # sees a logical transpose the conv relayout absorbs
                from vehicle_counting_tpu.ops.letterbox import (
                    yuv420_to_rgb_u8_planar,
                )

                crop_source = yuv420_to_rgb_u8_planar(frames)
                planar = True
                imgs = (
                    jnp.transpose(crop_source, (0, 2, 3, 1)).astype(jnp.float32)
                    / 255.0
                ).astype(dtype)
            else:
                crop_source = yuv420_to_rgb_u8(frames)
                imgs = (crop_source.astype(jnp.float32) / 255.0).astype(dtype)
        elif frames_format == "letterboxed_rgb":
            crop_source = frames
            imgs = (frames.astype(jnp.float32) / 255.0).astype(dtype)
        else:
            raise ValueError(f"unknown frames_format: {frames_format}")
        gain, pad_x, pad_y, _, _ = letterbox_params(src_hw, image_size)
        crop_kw = dict(
            crop_gain=float(gain),
            crop_pad=(float(pad_x), float(pad_y)),
            out_hw=src_hw,
        )
    heads = yolov5_forward(yolo_params, imgs, ycfg, dtype=dtype)
    det = fused_detect_tail(
        heads, ycfg,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
    )
    det["boxes"] = restore_boxes(det["boxes"], src_hw, image_size)

    mapped = class_lut[jnp.clip(det["classes"], 0, class_lut.shape[0] - 1)]
    det_valid = det["valid"] & (mapped >= 0) & frame_valid[:, None]
    mapped = jnp.where(det_valid, mapped, -1)

    # Batch-global ReID: all B frames' valid detections share one compacted
    # chunk stream (ceil(total_valid / max_embed) CNN forwards), so every
    # valid crop is embedded — reference semantics (deep_sort.py:119-129) —
    # while crowded frames borrow batch slots from quiet ones.
    out_hw = crop_kw.pop("out_hw")
    # ReID convs share the detector's MXU dtype (bf16 on TPU, f32 in CPU
    # parity tests); accumulation + normalization stay f32 (models/reid.py).
    feats = embed_detections_batch(
        crop_source, det["boxes"], det_valid,
        reid_params, reid_stats, hp, dtype=dtype, planar=planar, **crop_kw,
    )  # [B, N, F]
    det["classes"] = mapped
    det["valid"] = det_valid
    return det, feats


# frame-scan unroll factor (trace-time; stage_bench A/B knob). The r3 steady
# tracker trace showed ~26 us/frame of scan control + inter-iteration gaps
# (device self 138 vs 164 wall at B=128). Measured on v5e B=128 30-dets
# (round 5): unroll=2 tracker churn/steady 0.128/0.167 -> 0.121/0.157
# ms/frame (half the per-iteration loop boundaries; exactly the predicted
# ~10 us/frame of the gap item) and skewed e2e 0.770 -> 0.767; unroll=4
# gives it back (0.123/0.160 — bigger body, worse scheduling). Default 2.
# Semantics-exact at any value (lax.scan unroll is pure restructuring).
_SCAN_UNROLL = int(os.environ.get("VCT_SCAN_UNROLL", "2"))


def tracker_scan(states, det, feats, *, hp: DeepSortParams, src_hw: Tuple[int, int]):
    """The frame-RECURRENT back of the fused step: per-frame DeepSORT scan
    over the batch. Consumes detect_embed_core's outputs in frame order."""

    def body(states_, inp):
        f, boxes, scores, classes, valid = inp
        states_, out = deepsort_frame_core(
            states_, f, boxes, scores, classes, valid, hp, src_hw
        )
        return states_, out

    return jax.lax.scan(
        body, states,
        (feats, det["boxes"], det["scores"], det["classes"], det["valid"]),
        unroll=_SCAN_UNROLL,
    )


@partial(
    jax.jit,
    static_argnames=(
        "ycfg", "hp", "image_size", "src_hw",
        "max_det", "dtype", "frames_format",
    ),
)
def pipeline_batch_step(
    yolo_params,
    reid_params,
    reid_stats,
    states,
    frames: jax.Array,       # [B, H, W, 3] uint8 RGB
    frame_valid: jax.Array,  # [B] bool (tail padding of the last batch)
    class_lut: jax.Array,    # [nc] i32: detector class -> tracked class (-1 drops)
    *,
    ycfg: YoloConfig,
    hp: DeepSortParams,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "raw_rgb",
):
    """Returns (new_states, det dict [B, max_det], track TrackerOutputs [B, C, K]).

    frames_format selects the upload encoding (ops/letterbox.py thin-upload
    helpers); box coordinates stay in source pixels in every mode:
      raw_rgb           - [B, H, W, 3] full-res uint8; letterbox on device.
      letterboxed_rgb   - [B, dh, dw, 3] host-letterboxed uint8 (~2.2x less
                          transfer at 720p); ReID crops come from the
                          letterboxed frame via the (gain, pad) transform.
      letterboxed_yuv420- [B, dh*3/2, dw] host-letterboxed planar I420
                          (another 2x less; video sources are 4:2:0 anyway).
    """
    det, feats = detect_embed_core(
        yolo_params, reid_params, reid_stats, frames, frame_valid, class_lut,
        ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        dtype=dtype, frames_format=frames_format,
    )
    new_states, track_outs = tracker_scan(states, det, feats, hp=hp, src_hw=src_hw)
    return new_states, det, track_outs
