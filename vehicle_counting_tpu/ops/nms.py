"""Fixed-shape greedy NMS for TPU.

Two NMS flavors exist in the reference (SURVEY.md "hard parts"):
  1. YOLO's batched class-aware IoU NMS (conf 0.25 / iou 0.45 / max_det 300;
     thresholds configured at networks/yolo.py:62-66 from configs.yaml) —
     done upstream by torchvision inside AutoShape;
  2. SORT's greedy suppression with the +1 area / intersection-over-other-box
     criterion (networks/deepsort/sort/preprocessing.py:6-73).

Both are reformulated here as a *fixpoint iteration* instead of a sequential
scan: with candidates sorted by priority, greedy-keep is the unique fixpoint
of   k[i] = valid[i] AND NOT any_{j<i} (k[j] AND overlap[j,i] > thr).
Iterating this converges in "suppression-chain depth" steps (rarely > 5) and
each step is one [K,K] masked reduction — MXU/VPU-friendly, no per-box host
loop, exact greedy result (uniqueness: induction over i).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.ops.boxes import iou_matrix, sort_overlap_matrix

# Class-offset trick for class-aware NMS on one shared matrix
# (same constant ultralytics uses for its offset).
MAX_WH = 7680.0


def greedy_suppress(overlap: jax.Array, valid: jax.Array, threshold) -> jax.Array:
    """Exact greedy NMS keep-mask by fixpoint iteration.

    Args:
      overlap: [K, K]; overlap[j, i] = how much keeping j suppresses i.
               Rows/cols MUST be sorted by descending priority.
      valid:   [K] bool candidate mask.
      threshold: suppression threshold (suppress when overlap > threshold).

    Returns:
      keep [K] bool — identical to the sequential greedy scan.
    """
    k = overlap.shape[0]
    # strictly-lower-triangular predecessor mask: j < i suppresses i
    jj = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    pred = (jj < ii) & (overlap > threshold)  # [K, K] j suppresses i

    def step(state):
        keep, _ = state
        new = valid & ~jnp.any(pred & keep[:, None], axis=0)
        return new, jnp.any(new != keep)

    def cond(state):
        return state[1]

    keep, _ = jax.lax.while_loop(cond, step, (valid, jnp.array(True)))
    return keep


def nms_selected(bx_k, top_sc, cl_k, valid, *, iou_threshold, max_det: int):
    """Class-aware NMS over an already top-k-selected candidate set.

    Inputs are ONE image's k score-sorted candidates (descending, invalid
    rows carry score -1): boxes [k, 4] xyxy, scores [k], classes [k] i32,
    valid [k] bool. Returns the same fixed-shape dict as `batched_nms`
    (boxes/scores/classes/valid, max_det rows, zero-padded). Shared by
    `batched_nms` and the fused decode+NMS tail (models/detector.py), which
    defers box decode/argmax until after its top-k.
    """
    k = bx_k.shape[0]
    # class-aware via coordinate offset, one shared IoU matrix
    off = cl_k.astype(jnp.float32)[:, None] * MAX_WH
    iou = iou_matrix(bx_k + off, bx_k + off)
    keep = greedy_suppress(iou, valid, iou_threshold)

    kept_sc = jnp.where(keep, top_sc, -1.0)
    out_k = min(max_det, k)
    out_sc, oidx = jax.lax.top_k(kept_sc, out_k)
    out_valid = out_sc > 0
    zero = ~out_valid
    pad = max_det - out_k
    out = {
        "boxes": jnp.where(zero[:, None], 0.0, bx_k[oidx]),
        "scores": jnp.where(zero, 0.0, out_sc),
        "classes": jnp.where(zero, -1, cl_k[oidx]).astype(jnp.int32),
        "valid": out_valid,
    }
    if pad:
        out = {
            "boxes": jnp.pad(out["boxes"], ((0, pad), (0, 0))),
            "scores": jnp.pad(out["scores"], (0, pad)),
            "classes": jnp.pad(out["classes"], (0, pad), constant_values=-1),
            "valid": jnp.pad(out["valid"], (0, pad)),
        }
    return out


@partial(jax.jit, static_argnames=("max_det", "pre_nms_topk"))
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    classes: jax.Array,
    *,
    iou_threshold=0.45,
    score_threshold=0.25,
    max_det: int = 300,
    pre_nms_topk: int = 512,
):
    """Batched class-aware NMS with fixed output shapes.

    Args:
      boxes:   [B, N, 4] xyxy (detector-input pixel space).
      scores:  [B, N] confidence (obj * cls for YOLO).
      classes: [B, N] int class ids.

    Returns:
      dict with boxes [B, max_det, 4], scores [B, max_det],
      classes [B, max_det] (int32), valid [B, max_det] bool —
      score-sorted, zero-padded.
    """

    def per_image(bx, sc, cl):
        conf_ok = sc > score_threshold
        sc_m = jnp.where(conf_ok, sc, -1.0)
        k = min(pre_nms_topk, sc.shape[0])
        top_sc, idx = jax.lax.top_k(sc_m, k)
        valid = top_sc > 0
        return nms_selected(
            bx[idx], top_sc, cl[idx], valid,
            iou_threshold=iou_threshold, max_det=max_det,
        )

    return jax.vmap(per_image)(boxes, scores, classes)


def sort_nms_mask(tlwh: jax.Array, scores: jax.Array, valid: jax.Array, max_overlap) -> jax.Array:
    """SORT-flavor greedy suppression keep-mask over tlwh detections.

    Semantics of networks/deepsort/sort/preprocessing.py:6-73: process by
    descending score (ties: HIGHER original index first, because np.argsort
    ascending + take-last), suppress j when inter(i, j)/area(j) > max_overlap
    with the +1 pixel convention. Returns keep mask aligned with the INPUT
    order (no reordering), invalid rows always False.
    """
    n = tlwh.shape[0]
    # priority = descending score, ties -> HIGHER original index first.
    # rank[i] = processing position of i, via a comparison-matrix count
    # (cheaper than a [64] sort on TPU and vmaps over classes without the
    # sort's per-lane lowering); order[rank[i]] = i inverts it.
    sc = jnp.where(valid, scores, -jnp.inf)
    idx = jnp.arange(n, dtype=jnp.int32)
    rank = jnp.sum(
        (sc[None, :] > sc[:, None])
        | ((sc[None, :] == sc[:, None]) & (idx[None, :] > idx[:, None])),
        axis=1,
    ).astype(jnp.int32)
    # invert rank -> order with a one-hot reduce, not a scatter (scatters
    # lower to per-lane loops under the per-class vmap on TPU)
    order = jnp.sum(jnp.where(rank[None, :] == idx[:, None], idx[None, :], 0), axis=1)
    # permute rows with one permutation MATMUL, not gathers: the three
    # vmapped gathers here (tlwh[order], valid[order], keep_sorted[rank])
    # measured ~5.6 us/frame combined under the per-class vmap (xprof,
    # round 3); the [N, N] @ [N, 5] / [1, N] @ [N, N] forms are ~1 us and
    # EXACT — each row-sum has exactly one nonzero term, f32 HIGHEST
    p = (order[:, None] == idx[None, :]).astype(jnp.float32)  # [N(pos), N(i)]
    hi = jax.lax.Precision.HIGHEST
    tv = jnp.concatenate(
        [tlwh.astype(jnp.float32), valid.astype(jnp.float32)[:, None]], axis=1
    )  # [N, 5]
    tvp = jnp.matmul(p, tv, precision=hi)
    overlap = sort_overlap_matrix(tvp[:, :4])  # [N,N] (i suppresses j)
    keep_sorted = greedy_suppress(overlap, tvp[:, 4] > 0.5, max_overlap)
    # unpermute: element i sits at processing position rank[i], i.e. p^T y
    keep = (
        jnp.matmul(keep_sorted.astype(jnp.float32)[None, :], p, precision=hi)[0]
        > 0.5
    )
    return keep & valid
