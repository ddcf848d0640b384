"""End-to-end jitted detection step and host-facing Detector facade.

Mirrors the role of the reference's Detector/YoloBackbone.detect
(networks/detector.py:11-38, networks/yolo.py:45-99): frames in, per-image
{bboxes (x,y,w,h), classes, scores} out — but the whole
letterbox -> conv net -> decode -> NMS -> coordinate-restore chain is ONE
compiled XLA program with fixed shapes; only the final (max_det-padded)
arrays cross to the host.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vehicle_counting_tpu.models.yolo import (
    YoloConfig,
    decode_predictions,
    init_yolov5,
    yolov5_forward,
)
from vehicle_counting_tpu.ops.letterbox import letterbox, restore_boxes
from vehicle_counting_tpu.ops.nms import batched_nms

# COCO -> vehicle-class mapping the reference CLI defines (run.py:38-46):
# person/bicycle/motorcycle->motorcycle(0), car->car(1), bus->bus(2), truck->truck(3)
COCO_VEHICLE_MAPPING: Dict[int, int] = {0: 0, 1: 0, 2: 1, 3: 0, 5: 2, 7: 3}
VEHICLE_CLASS_NAMES: Tuple[str, ...] = ("motorbike", "car", "bus", "truck")


@partial(
    jax.jit,
    static_argnames=("cfg", "image_size", "src_hw", "max_det", "dtype"),
)
def detect_step(
    params: Dict[str, Any],
    frames: jax.Array,
    *,
    cfg: YoloConfig,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
) -> Dict[str, jax.Array]:
    """Raw frames [B, H, W, 3] uint8 RGB -> fixed-shape detections.

    Returns boxes [B, max_det, 4] xyxy in SOURCE pixels, scores, classes,
    valid.
    """
    imgs = letterbox(frames, image_size)
    heads = yolov5_forward(params, imgs, cfg, dtype=dtype)
    dec = decode_predictions(heads, cfg)
    out = batched_nms(
        dec["boxes"],
        dec["scores"],
        dec["classes"],
        iou_threshold=iou_thres,
        score_threshold=conf_thres,
        max_det=max_det,
    )
    out["boxes"] = restore_boxes(out["boxes"], src_hw, image_size) * out["valid"][..., None]
    return out


class Detector:
    """Host-facing detector: owns params/config, compiles per source shape.

    `run(frames)` keeps the reference ImageDetect.run output contract
    (modules/detect.py:30-60): a list over images of dicts with 'bboxes'
    (x, y, w, h), 'classes', 'scores' — after optional class mapping.
    """

    def __init__(
        self,
        config,
        weights: Optional[str] = None,
        mapping_dict: Optional[Dict[int, int]] = None,
        num_classes: Optional[int] = None,
        seed: int = 0,
    ):
        variant = config.model_name or "yolov5s"
        image_size = config.image_size or [640, 640]
        self.image_size = (int(image_size[0]), int(image_size[1]))
        self.conf_thres = float(config.min_conf or 0.25)
        self.iou_thres = float(config.min_iou or 0.45)
        self.max_det = int(config.max_det) if (config.max_det or 0) > 0 else 300
        self.mapping_dict = mapping_dict
        self.dtype = (
            jnp.float32 if (config.compute_dtype == "float32") else jnp.bfloat16
        )

        if weights:
            from vehicle_counting_tpu.models.convert import load_yolov5_weights

            self.params = load_yolov5_weights(weights)
            nc = self.params["24"]["m"][0]["b"].shape[0] // 3 - 5
            self.cfg = YoloConfig(variant=variant, num_classes=nc)
        else:
            nc = num_classes if num_classes is not None else 80
            self.cfg = YoloConfig(variant=variant, num_classes=nc)
            self.params = init_yolov5(jax.random.PRNGKey(seed), self.cfg)
        self.params = jax.device_put(self.params)

        if self.mapping_dict:
            self._map_lut = np.full(self.cfg.num_classes + 1, -1, dtype=np.int32)
            for src, dst in self.mapping_dict.items():
                self._map_lut[src] = dst
        else:
            self._map_lut = None

    def detect_batch(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        """frames [B, H, W, 3] uint8 RGB -> fixed-shape numpy detections."""
        b, h, w, _ = frames.shape
        out = detect_step(
            self.params,
            jnp.asarray(frames),
            cfg=self.cfg,
            image_size=self.image_size,
            src_hw=(h, w),
            conf_thres=self.conf_thres,
            iou_thres=self.iou_thres,
            max_det=self.max_det,
            dtype=self.dtype,
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def run(self, frames: np.ndarray) -> List[Dict[str, np.ndarray]]:
        """Reference-style per-image outputs with optional class mapping.

        Applies the class-mapping filter the way modules/detect.py:41-46
        intends (keep only mapped classes, remap ids) — without the
        reference's off-by-one quirk, which is a bug, not a behavior.
        """
        out = self.detect_batch(frames)
        results = []
        for i in range(frames.shape[0]):
            valid = out["valid"][i]
            boxes = out["boxes"][i][valid]
            classes = out["classes"][i][valid]
            scores = out["scores"][i][valid]
            if self._map_lut is not None:
                mapped = self._map_lut[np.clip(classes, 0, len(self._map_lut) - 1)]
                keep = mapped >= 0
                boxes, scores, classes = boxes[keep], scores[keep], mapped[keep]
            tlwh = boxes.copy()
            tlwh[:, 2] -= tlwh[:, 0]
            tlwh[:, 3] -= tlwh[:, 1]
            results.append({"bboxes": tlwh, "classes": classes, "scores": scores})
        return results
