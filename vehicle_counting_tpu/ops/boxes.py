"""Box-order conversions and pairwise overlap matrices (jittable).

Coordinate conventions (same vocabulary as the reference
utilities/postprocess.py:4-42 and networks/deepsort/deep_sort.py:61-117):
  xyxy   = (x1, y1, x2, y2)
  tlwh   = (x1, y1, w, h)          -- top-left + size
  cxcywh = (cx, cy, w, h)          -- center + size
  xyah   = (cx, cy, a, h), a = w/h -- Kalman filter state observation

All functions are shape-polymorphic over leading batch dims ([..., 4]) and
safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyxy_to_tlwh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def tlwh_to_xyxy(b):
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def tlwh_to_xyah(b):
    """tlwh -> (center-x, center-y, aspect = w/h, h)."""
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x + w / 2, y + h / 2, w / jnp.maximum(h, 1e-6), h], axis=-1)


def xyah_to_tlwh(b):
    cx, cy, a, h = jnp.split(b, 4, axis=-1)
    w = a * h
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=-1)


def clip_boxes(b, height, width):
    """Clip xyxy boxes into [0, width] x [0, height]."""
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x1, 0, width),
            jnp.clip(y1, 0, height),
            jnp.clip(x2, 0, width),
            jnp.clip(y2, 0, height),
        ],
        axis=-1,
    )


def iou_matrix(a, b):
    """Pairwise IoU of xyxy boxes: a [N,4], b [M,4] -> [N,M] float32."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0.0) * jnp.maximum(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0.0) * jnp.maximum(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def tlwh_iou_matrix(a, b):
    """Pairwise IoU of tlwh boxes (used by SORT's IoU cost,
    networks/deepsort/sort/iou_matching.py:7-39: plain IoU, no +1)."""
    return iou_matrix(tlwh_to_xyxy(a), tlwh_to_xyxy(b))


def sort_overlap_matrix(tlwh):
    """Pairwise SORT-NMS overlap: intersection / area(col box), +1 convention.

    Reproduces networks/deepsort/sort/preprocessing.py:41-67: boxes are tlwh,
    corners get the legacy `+1` pixel convention, and the overlap of kept box
    i against candidate j is inter_area / area_j (NOT IoU).
    Returns [N, N] where entry (i, j) is how much box i suppresses box j.
    """
    b = tlwh.astype(jnp.float32)
    x1 = b[:, 0]
    y1 = b[:, 1]
    x2 = b[:, 0] + b[:, 2]
    y2 = b[:, 1] + b[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    return (w * h) / jnp.maximum(area[None, :], 1e-9)
