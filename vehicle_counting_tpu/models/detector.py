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
    init_yolov5,
    yolov5_forward,
)
from vehicle_counting_tpu.ops.letterbox import autoshape_hw, letterbox, restore_boxes
from vehicle_counting_tpu.ops.nms import nms_selected

# COCO -> vehicle-class mapping the reference CLI defines (run.py:38-46):
# person/bicycle/motorcycle->motorcycle(0), car->car(1), bus->bus(2), truck->truck(3)
COCO_VEHICLE_MAPPING: Dict[int, int] = {0: 0, 1: 0, 2: 1, 3: 0, 5: 2, 7: 3}
VEHICLE_CLASS_NAMES: Tuple[str, ...] = ("motorbike", "car", "bus", "truck")

# NOTE: a grouped two-phase top-k over the CONCATENATED anchor axis was a
# measured wash on v5e (benchmarks/micro/topk_bench.py, G=4..49); the win
# came from going head-wise instead (fused_detect_tail), where the same
# exactness argument (exact_topk's proof) justifies the per-head merge.

# Detect-tail candidate-row strategy (trace-time knob; flips need fresh jit
# traces). "packed" (default, measured r4): never gather 255-lane rows from
# the conv output — per-candidate components (xywh logits + the class
# argmax riding along as a 5th bf16 lane) are extracted for every anchor
# as lane slices / lane reduces that fuse into the head's score pass
# regardless of XLA's {3,0,2,1} conv layout, and ONE small [B, k, 5] row
# gather replaces the [B, k, 255] one. Measured on v5e B=128 (xprof trace
# units; ROADMAP r4): data formatting 177 -> 89, tail device total
# 563 -> 451, tail wall 0.096 -> 0.082 ms/frame. Two earlier shapes lost:
# separate xywh + i32 cls gathers (628 — a 1-lane i32 gather costs MORE
# than the 4-lane row gather: per-row overhead dominates), and jnp.argmax
# for the class index (lowers as an expensive variadic custom fusion; the
# compare + masked-min against the score pass's existing class max is the
# cheap exact form). "rows": the r2/r3 wide-row gather path, kept for A/B.
import os as _os

TAIL_ROWS_MODE = _os.environ.get("VCT_TAIL_ROWS", "packed")


def exact_topk(scores: jax.Array, k: int, groups: int = 1):
    """lax.top_k-equivalent (values AND index tie-breaking) in two phases.

    scores [..., A] -> (values [..., k], indices [..., k]), identical to
    jax.lax.top_k including its lower-index-first tie rule:

      * phase 1 takes each of `groups` contiguous slices' top-k — any
        global top-k element is necessarily in its own slice's top-k, and
        an element dropped there is preceded within its slice alone by k
        same-or-better elements under the (value desc, index asc) order,
        so it cannot be a global winner;
      * the merged [groups * k] candidates are ordered by (slice, in-slice
        rank); for equal values that IS ascending original index (slices
        are index-contiguous and in-slice ties come out index-ascending),
        so phase 2's lower-position tie rule reproduces the global rule.

    Pads with -inf. Falls back to plain lax.top_k when k exceeds the slice
    width (a slice could not surface k candidates) — grouping only pays for
    k << A anyway.
    """
    if groups <= 1:
        return jax.lax.top_k(scores, k)
    a = scores.shape[-1]
    s = -(-a // groups)  # slice width
    if k > s:
        return jax.lax.top_k(scores, k)
    lead = scores.shape[:-1]
    pad = groups * s - a
    sp = jnp.concatenate(
        [scores, jnp.full(lead + (pad,), -jnp.inf, scores.dtype)], axis=-1
    ) if pad else scores
    grp = sp.reshape(lead + (groups, s))
    v1, i1 = jax.lax.top_k(grp, k)  # [..., G, k]
    base = (jnp.arange(groups, dtype=jnp.int32) * s)[
        (None,) * len(lead) + (slice(None), None)
    ]
    iorig = i1 + base
    v2, i2 = jax.lax.top_k(v1.reshape(lead + (groups * k,)), k)
    idx = jnp.take_along_axis(iorig.reshape(lead + (groups * k,)), i2, axis=-1)
    return v2, idx


def fused_detect_tail(
    heads,
    cfg: YoloConfig,
    *,
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    pre_nms_topk: int = 512,
) -> Dict[str, jax.Array]:
    """Decode + class-aware NMS, head-wise, with box decode DEFERRED past
    the top-k.

    Bit-identical outputs to `decode_predictions` + `batched_nms` (tested in
    tests/test_detect_tail.py), but cheaper on TPU:

      * scores for all A anchors need only sigmoid(obj) * sigmoid(max cls
        logit) — a plain max reduce — so the [B, A, 4] box decode, the
        A-wide class ARGMAX, and their materializations run on just the
        pre_nms_topk survivors;
      * each head stays in its native [B, HW, na*no] lane layout: scores
        come from per-anchor lane extracts/reduces and candidates merge via
        a per-head top-k + one small phase-2 top-k (exact, including the
        global lower-index tie rule — exact_topk's proof, heads as the
        index-contiguous groups). The old concatenated [B, A, no] view
        relayouted + copied ~4.3 MB/frame of head data (~40 us/frame of
        the tail's 113 on v5e).

    Grid/stride per candidate are recovered arithmetically from the anchor
    index (3-entry table gathers); anchors from a [nh*na, 2] table.

    Exactness: bf16->f32 casts are exact, sigmoid is monotone (argmax/max
    commute with it), per-head lax.top_k ties break by lower index and the
    merge preserves (value desc, global index asc), and the per-candidate
    decode applies the same f32 ops in the same order as
    decode_predictions — so every output matches bitwise.
    """
    na, no = cfg.na, cfg.no
    b = heads[0].shape[0]
    shapes = [(head.shape[1], head.shape[2]) for head in heads]
    a_total = sum(h * w * na for (h, w) in shapes)
    k = min(pre_nms_topk, a_total)

    # host-side per-head metadata (numpy: no device constants at trace time)
    offs = [0]
    for (h, w) in shapes:
        offs.append(offs[-1] + h * w * na)
    st_tbl = [float(s) for s in cfg.strides]
    anc_tbl = np.asarray(cfg.anchors, np.float32).reshape(-1, 2)  # [nh*na, 2]

    # Stay in each head's native [B, HW, na*no] lane layout: assembling the
    # concatenated [B, A, no] view relayouts + copies ~4.3 MB/frame of bf16
    # head data (measured ~40 us/frame of the tail's 113 on v5e). Scores
    # come from lane extracts/reduces on the 255-lane tiles; in "packed"
    # mode the candidate components (xywh logits, class argmax) are ALSO
    # extracted as lane slices/reduces — nothing ever gathers a wide row
    # from the conv output, so the ~10 us/frame-per-head relayout copies
    # the r3 xprof trace attributed to the row-major row-gather operands
    # disappear (see TAIL_ROWS_MODE above).
    packed = TAIL_ROWS_MODE == "packed"
    cand_v, cand_gidx, cand_rows = [], [], []
    for hi, head in enumerate(heads):
        hh, wh_ = shapes[hi]
        hw = hh * wh_
        flat = head.reshape(b, hw, na * no)  # sublane-only reshape: free
        # per-anchor score = sigmoid(obj) * sigmoid(max cls logit) — same
        # values as the concatenated form (bf16 max reduce, f32 sigmoids)
        s_parts = []
        cls_max = []
        for a in range(na):
            obj_l = flat[:, :, a * no + 4].astype(jnp.float32)
            cls_m = jnp.max(flat[:, :, a * no + 5 : (a + 1) * no], axis=-1)
            cls_max.append(cls_m)
            s_parts.append(
                jax.nn.sigmoid(obj_l)
                * jax.nn.sigmoid(cls_m.astype(jnp.float32))
            )
        # anchor-minor flatten matches the reference decode order
        # (index = cell * na + a)
        sc = jnp.stack(s_parts, axis=-1).reshape(b, hw * na)
        sc_m = jnp.where(sc > conf_thres, sc, -1.0)
        kh = min(k, hw * na)
        v1, i1 = jax.lax.top_k(sc_m, kh)  # [B, kh] in-head, ties index-asc
        if kh < k:
            v1 = jnp.pad(v1, ((0, 0), (0, k - kh)), constant_values=-jnp.inf)
            i1 = jnp.pad(i1, ((0, 0), (0, k - kh)))
        if packed:
            # xywh logits and class argmax for EVERY anchor, as lane
            # slices / lane reduces on the native head (the score max
            # reduce above already streams these bytes; XLA multi-output-
            # fuses the extra reduces into the same pass).
            #
            # class argmax WITHOUT jnp.argmax: the score loop already has
            # each anchor's class max, so the index is "first lane equal
            # to the max" — a compare + masked min-reduce. Exact: bf16
            # equality with its own max is exact, and min of the matching
            # lane indices IS argmax's first-max tie rule.
            #
            # The index RIDES ALONG as a 5th lane of the candidate rows
            # (exact in the conv dtype for nc <= 256 — bf16 holds small
            # ints exactly), so ONE row gather serves both: on-chip the
            # per-row gather overhead dominates, and a separate [B, k]
            # i32 gather measured MORE expensive than the whole 4-lane
            # row gather (125 vs 91 trace units, ROADMAP r4).
            nc_l = no - 5
            lane_i = jnp.arange(nc_l, dtype=jnp.int32)
            assert nc_l <= 256, "cls index must be exact in bf16 lanes"
            # anchor-minor interleaved stack (row = cell*na + a, gathered
            # directly with i1). MEASURED NEGATIVE (don't retry): the
            # anchor-CONCATENATED [B, na*HW, 5] layout with a remapped
            # gather index (a*HW + cell) is WORSE — tail trace 493 vs 451
            # us-units, data formatting 89.5 -> 128.7 — the per-anchor
            # block concat relayouts more than this interleave stack.
            rows5 = jnp.stack(
                [
                    jnp.concatenate(
                        [
                            flat[:, :, a * no : a * no + 4],
                            jnp.min(
                                jnp.where(
                                    flat[:, :, a * no + 5 : (a + 1) * no]
                                    == cls_max[a][:, :, None],
                                    lane_i,
                                    nc_l,
                                ),
                                axis=-1,
                            )[:, :, None].astype(flat.dtype),
                        ],
                        axis=-1,
                    )
                    for a in range(na)
                ],
                axis=2,
            ).reshape(b, hw * na, 5)              # [B, HW*na, 5] conv dtype
            cand_rows.append(
                jnp.take_along_axis(rows5, i1[:, :, None], axis=1)
            )                                      # [B, k, 5] row gather
        else:
            # candidate rows: gather the 255-lane cell row, then window-
            # select the anchor's no-lane slice (conv dtype preserved)
            cell1 = i1 // na
            a1 = i1 % na
            rows_wide = jnp.take_along_axis(
                flat, cell1[:, :, None], axis=1
            )  # [B, k, na*no]
            r85 = rows_wide[:, :, 0:no]
            for a in range(1, na):
                r85 = jnp.where(
                    (a1 == a)[:, :, None],
                    rows_wide[:, :, a * no : (a + 1) * no],
                    r85,
                )
            cand_rows.append(r85)
        cand_v.append(v1)
        cand_gidx.append(offs[hi] + i1)

    # exact merge: candidates are ordered (head, in-head rank); heads are
    # index-contiguous ascending and in-head ties come out index-ascending,
    # so phase-2's lower-position tie rule reproduces lax.top_k's global
    # lower-index rule (same argument as exact_topk's proof)
    mv = jnp.concatenate(cand_v, axis=1)        # [B, nh*k]
    mg = jnp.concatenate(cand_gidx, axis=1)
    mr = jnp.concatenate(cand_rows, axis=1)     # [B, nh*k, no|5]

    def per_image(mv_i, mg_i, mr_i):
        top_sc, pos = jax.lax.top_k(mv_i, k)
        top_sc = jnp.maximum(top_sc, -1.0)  # -inf pads -> the old masked -1
        idx = mg_i[pos]
        valid = top_sc > 0

        rows = mr_i[pos]  # [k, no|5] gather from the small candidate buffer
        if packed:
            cl_k = rows[:, 4].astype(jnp.int32)
            s_xywh = jax.nn.sigmoid(rows[:, 0:4].astype(jnp.float32))
        else:
            cl_k = jnp.argmax(rows[:, 5:], axis=-1).astype(jnp.int32)
            s_xywh = jax.nn.sigmoid(rows[:, 0:4].astype(jnp.float32))

        # which head each candidate came from, then its grid cell/anchor
        h_id = jnp.zeros_like(idx)
        for o in offs[1:-1]:
            h_id = h_id + (idx >= o).astype(idx.dtype)
        jj = idx - jnp.asarray(np.asarray(offs[:-1], np.int32))[h_id]
        ww = jnp.asarray(np.asarray([w for (_, w) in shapes], np.int32))[h_id]
        stride = jnp.asarray(np.asarray(st_tbl, np.float32))[h_id]
        cell = jj // na
        gx = (cell % ww).astype(jnp.float32)
        gy = (cell // ww).astype(jnp.float32)
        anc = jnp.asarray(anc_tbl)[h_id * na + (jj % na)]  # [k, 2]

        # same f32 expression order as decode_predictions
        x = (s_xywh[:, 0] * 2.0 - 0.5 + gx) * stride
        y = (s_xywh[:, 1] * 2.0 - 0.5 + gy) * stride
        wh = jnp.square(s_xywh[:, 2:4] * 2.0) * anc
        x1 = x - wh[:, 0] / 2
        y1 = y - wh[:, 1] / 2
        bx_k = jnp.stack([x1, y1, x1 + wh[:, 0], y1 + wh[:, 1]], axis=-1)
        return nms_selected(
            bx_k, top_sc, cl_k, valid,
            iou_threshold=iou_thres, max_det=max_det,
        )

    return jax.vmap(per_image)(mv, mg, mr)


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
    out = fused_detect_tail(
        heads, cfg,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
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
        # AutoShape's stride-aligned minimal pad is what the reference's
        # network actually sees (networks/yolo.py:70); square_letterbox pins
        # the full-square pad for callers that want the nominal contract
        self.square_letterbox = bool(getattr(config, "square_letterbox", None))
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

    def net_hw(self, src_hw: Tuple[int, int]) -> Tuple[int, int]:
        """Static network input shape for a source shape (AutoShape rule)."""
        if self.square_letterbox:
            return self.image_size
        return autoshape_hw(src_hw, self.image_size)

    def detect_batch(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        """frames [B, H, W, 3] uint8 RGB -> fixed-shape numpy detections."""
        b, h, w, _ = frames.shape
        out = detect_step(
            self.params,
            jnp.asarray(frames),
            cfg=self.cfg,
            image_size=self.net_hw((h, w)),
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
