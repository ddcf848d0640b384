"""Multi-class DeepSORT: detections + frame -> per-class track updates.

Role-equivalent of the reference's VideoTracker + DeepSort facade
(modules/track.py:8-70, networks/deepsort/deep_sort.py:14-59): ONE tracker
state per class (modules/track.py:16), each fed only its class's detections.
TPU-native differences:
  * ReID crops for ALL classes' detections are gathered and embedded in one
    batched pass (classes partition association, not features — SURVEY.md §7.3);
  * per-class detection lists become fixed [C, K, ...] tensors with validity
    masks, slotted in detection order;
  * confidence filter (> MIN_CONFIDENCE, deep_sort.py:31) and the SORT greedy
    NMS at NMS_MAX_OVERLAP (deep_sort.py:33-37) run vectorized on device;
  * the per-class tracker update runs under lax.scan over the class axis so
    empty classes really skip (reference quirk: a class with no detections
    this frame does not advance its tracker, modules/track.py:55-59).

Entry points: `deepsort_frame` (single frame, crop+embed included) for
direct use, or `embed_detections` + `deepsort_frame_core` for batch callers
(pipeline/step.py embeds every frame's crops in one MXU pass, then scans the
core over frames).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import EMBED_DIM, reid_forward
from vehicle_counting_tpu.ops.boxes import xyxy_to_tlwh
from vehicle_counting_tpu.ops.crops import gather_crops, gather_crops_batch
from vehicle_counting_tpu.ops.nms import sort_nms_mask
from vehicle_counting_tpu.tracking.tracker import (
    TrackerOutputs,
    TrackerParams,
    TrackerState,
    init_state,
    tracker_feature_post,
    tracker_precompute,
    tracker_step,
    tracker_step_core,
)


class DeepSortParams(NamedTuple):
    """Static facade config: tracker hyper-params + class count."""

    tracker: TrackerParams
    num_classes: int
    min_confidence: float = 0.25  # MIN_CONFIDENCE
    nms_max_overlap: float = 0.5  # NMS_MAX_OVERLAP
    class_mode: str = "batched"   # "batched": class-vmapped association step
                                  # — each cascade stage runs once for ALL
                                  # classes (one grid-batched Pallas solver
                                  # launch) instead of per class. Became the
                                  # winner once the association core went
                                  # scatter-free (vmapped scatters lower to
                                  # ~14 us per-lane loops); measured on v5e
                                  # at 30 dets/frame steady/churn:
                                  #   4-class: batched 0.820/0.449 ms/frame
                                  #            vs scan 1.083/0.547
                                  #   1-class: batched 0.636/0.561
                                  #            vs scan 0.602/0.562 (tie)
                                  # "scan" keeps real lax.cond skips for
                                  # empty classes — marginally better when
                                  # only one class is ever populated.
    max_embed: int = 128          # ReID crops per CNN forward (chunk size;
                                  # 128 measured best on v5e at 30 dets/frame
                                  # x B=32: 0.420 ms/frame embed vs 0.460 at
                                  # 64 and 0.441 at 256 — bigger chunks tile
                                  # the small 50x50 convs better, with
                                  # diminishing returns past one pass/4 frames).
                                  # ALL valid detections are embedded, like
                                  # the reference (deep_sort.py:119-129):
                                  # valid dets compact to the front, then a
                                  # lax.scan runs the CNN chunk by chunk and
                                  # lax.cond skips fully-empty chunks, so
                                  # cost tracks the actual detection load
                                  # instead of the max_det padding.


# None: auto (Pallas per-crop DMA gather on TPU when the backend compiles
# Mosaic); True: force (interpret mode off-TPU — used by CPU parity tests);
# False: force the XLA row-gather path (ops/crops.py).
FORCE_PALLAS_CROPS = None


def _crops_kernel_mode() -> str:
    """'off' | 'compile' | 'interpret' — trace-time dispatch decision."""
    if FORCE_PALLAS_CROPS is False:
        return "off"
    if FORCE_PALLAS_CROPS is True:
        return "interpret" if jax.default_backend() != "tpu" else "compile"
    if jax.default_backend() == "tpu":
        try:
            from vehicle_counting_tpu.ops.pallas.crops import (
                pallas_crops_supported,
            )

            if pallas_crops_supported():
                return "compile"
        except Exception:
            pass
    return "off"


def init_states(hp: DeepSortParams) -> TrackerState:
    """Stacked per-class tracker states: every leaf gains a leading [C] axis."""
    one = init_state(hp.tracker)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (hp.num_classes,) + x.shape).copy(), one
    )


def _slot_by_class(boxes, scores, classes, valid, num_classes: int, k: int):
    """Slot flat detections into fixed per-class arrays (detection order).

    Scatter-free: the slotting matrix M[c, s, d] = "detection d is the s-th
    valid detection of class c" has at most one nonzero per (c, s), so the
    per-class boxes/scores are exact one-hot contractions (HIGHEST precision
    keeps the f32 values bit-identical) and the index/valid outputs are
    masked reduces. The previous .at[tgt].set scatters lowered to per-lane
    loops under the class vmap (~35 us/frame of the batch step's scan body
    on v5e; the reduces + two small MXU contractions are ~5 us).
    """
    d = boxes.shape[0]
    d_idx = jnp.arange(d, dtype=jnp.int32)
    cls_m = valid[None, :] & (
        classes[None, :] == jnp.arange(num_classes, dtype=classes.dtype)[:, None]
    )  # [C, D]
    # inclusive prefix count as a [C,D]@[D,D] triangular MXU matmul:
    # jnp.cumsum at these shapes lowers to a reduce-window costing ~6
    # us/frame inside the frame scan, and a [C, D, D] masked reduce costs
    # ~9 (both profiled round 3). Exact: 0/1 factors, counts <= D, f32
    # HIGHEST (bf16 split would also be exact at these magnitudes, but
    # HIGHEST is the house rule for exactness-bearing matmuls).
    tri = (d_idx[:, None] <= d_idx[None, :]).astype(jnp.float32)  # [j, d]
    rank = (
        jnp.matmul(
            cls_m.astype(jnp.float32), tri, precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.int32)
        - 1
    )  # [C, D]
    slot = jax.lax.broadcasted_iota(jnp.int32, (num_classes, k, d), 1)
    M = cls_m[:, None, :] & (rank[:, None, :] == slot)  # [C, K, D]
    Mf = M.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    cb = jnp.einsum("ckd,df->ckf", Mf, boxes.astype(jnp.float32), precision=hi)
    cs = jnp.einsum("ckd,d->ck", Mf, scores.astype(jnp.float32), precision=hi)
    cv = jnp.any(M, axis=2)
    cidx = jnp.where(
        cv, jnp.sum(jnp.where(M, d_idx[None, None, :], 0), axis=2), d
    ).astype(jnp.int32)
    return cb, cs, cidx, cv, Mf  # [C,K,4], [C,K], [C,K], [C,K], [C,K,D]


def _crop_transform(boxes, crop_gain, crop_pad):
    if crop_gain != 1.0 or crop_pad != (0.0, 0.0):
        px, py = crop_pad
        return boxes * crop_gain + jnp.asarray([px, py, px, py], jnp.float32)
    return boxes


def _embed_compacted_chunks(gather_chunk, embed_chunk, valid_flat, chunk: int):
    """Shared chunked-embed core over a flat detection axis.

    valid detections compact to the front (stable order); a lax.scan runs
    ceil(n/chunk) ReID forwards of `chunk` crops each, and lax.cond skips
    chunks with no valid crop — so with d valid detections the CNN cost is
    ceil(d/chunk) forwards, whatever the padded capacity. Returns [n, F]
    features (zeros for invalid / out-of-capacity slots — there are none of
    the latter: every valid det lands in some chunk).

    gather_chunk(sel, v) -> [chunk, 50, 50, 3] normalized crops for flat
    detection indices `sel` (indices == n mean padding).
    """
    n = valid_flat.shape[0]
    c = min(chunk, n)
    num_chunks = -(-n // c)
    # stable valid-first partition via cumsums + ONE plain scatter (an
    # argsort of the [B*N] mask cost ~5 us/frame at B=128; non-vmapped
    # index scatters are ~0.2 us)
    n_valid = jnp.sum(valid_flat.astype(jnp.int32))
    inv = jnp.where(
        valid_flat,
        jnp.cumsum(valid_flat.astype(jnp.int32)) - 1,
        n_valid + jnp.cumsum((~valid_flat).astype(jnp.int32)) - 1,
    )
    order = jnp.zeros((n,), jnp.int32).at[inv].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    pad = num_chunks * c - n
    if pad:
        order = jnp.concatenate([order, jnp.full((pad,), n, jnp.int32)])
    valid_p = jnp.concatenate([valid_flat, jnp.zeros((1,), bool)])
    sel_chunks = order.reshape(num_chunks, c)

    def body(_, sel):
        v = valid_p[sel]

        def go(_):
            crops = gather_chunk(sel, v)
            f, _ = embed_chunk(crops)
            return f

        f = jax.lax.cond(
            jnp.any(v), go, lambda _: jnp.zeros((c, EMBED_DIM), jnp.float32), None
        )
        return None, jnp.where(v[:, None], f, 0.0)

    if num_chunks == 1:
        _, feats = body(None, sel_chunks[0])
        feats_flat = feats
    else:
        _, feats = jax.lax.scan(body, None, sel_chunks)
        feats_flat = feats.reshape(num_chunks * c, -1)
    # un-compact with the same `inv` map (valid det i sits at compacted
    # position cumsum(valid)-1, invalid ones after all valid); the gather
    # stays — a scatter here costs ~25 us/frame on TPU
    return feats_flat[inv]


def embed_detections(
    frame: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    reid_params,
    reid_stats,
    hp: DeepSortParams,
    crop_gain: float = 1.0,
    crop_pad: Tuple[float, float] = (0.0, 0.0),
    dtype=None,
) -> jax.Array:
    """Crop + ReID embed for ALL of one frame's valid detections: [N, F].

    Matches the reference, which embeds every crop (deep_sort.py:119-129);
    the CNN runs in chunks of hp.max_embed crops (compacted valid-first, so
    empty chunks are skipped at runtime). crop_gain/crop_pad map source-pixel
    boxes into a letterboxed crop frame.
    """
    boxes_t = _crop_transform(boxes, crop_gain, crop_pad)
    boxes_p = jnp.concatenate([boxes_t, jnp.zeros((1, 4), boxes_t.dtype)])

    def gather_chunk(sel, v):
        return gather_crops(frame, boxes_p[sel], v, dtype=dtype)

    def embed_chunk(crops):
        return reid_forward(reid_params, reid_stats, crops, train=False, reid=True, dtype=dtype)

    return _embed_compacted_chunks(gather_chunk, embed_chunk, valid, hp.max_embed)


def embed_detections_batch(
    frames: jax.Array,   # [B, H, W, 3] crop source
    boxes: jax.Array,    # [B, N, 4] xyxy in crop-source pixels pre-transform
    valid: jax.Array,    # [B, N] bool
    reid_params,
    reid_stats,
    hp: DeepSortParams,
    crop_gain: float = 1.0,
    crop_pad: Tuple[float, float] = (0.0, 0.0),
    dtype=None,
    planar: bool = None,
) -> jax.Array:
    """Batch-global chunked ReID embed: [B, N, F], every valid det embedded.

    All B frames' detections share one compacted chunk stream, so a crowded
    frame borrows CNN batch slots from quiet ones — total forwards =
    ceil(total_valid / max_embed) rather than B * ceil(N / max_embed).
    """
    b, n = valid.shape
    # frames may arrive channel-PLANAR [B, 3, H, W] (the pipeline's pixel
    # path can skip the [B, H, W, 3] interleave entirely; the Pallas crop
    # kernel wants planar anyway) or interleaved [B, H, W, 3]. Callers that
    # know the layout pass `planar` explicitly (pipeline/step.py does); the
    # shape inference is a fallback for direct callers and would misread a
    # genuine NHWC source with W == 3 (no real letterbox is 3 px wide).
    if planar is None:
        planar = frames.shape[1] == 3 and frames.shape[-1] != 3
    frame_w = frames.shape[-1] if planar else frames.shape[2]
    fb = _crop_transform(boxes.reshape(b * n, 4), crop_gain, crop_pad)
    fb = jnp.concatenate([fb, jnp.zeros((1, 4), fb.dtype)])
    fidx = jnp.concatenate(
        [jnp.repeat(jnp.arange(b, dtype=jnp.int32), n), jnp.zeros((1,), jnp.int32)]
    )
    fv = valid.reshape(b * n)

    mode = _crops_kernel_mode()
    if mode == "compile" and frame_w % 128 != 0:
        # the kernel's HBM memref slices need a 128-lane-aligned frame
        # width (ops/pallas/crops.py); pipeline letterboxes (640) are
        mode = "off"
    if mode != "off":
        # Pallas per-crop DMA gather (ops/pallas/crops.py): array-equal to
        # gather_crops_batch but DMAs each crop's row band at line rate
        # instead of the slow XLA row-gather lowering. Wants the frame
        # planar; one u8 transpose per batch is cheap next to the gather.
        from vehicle_counting_tpu.ops.pallas.crops import (
            gather_crops_batch_pallas,
        )

        frames_planar = (
            frames if planar else jnp.transpose(frames, (0, 3, 1, 2))
        )

        def gather_chunk(sel, v):
            return gather_crops_batch_pallas(
                frames_planar, fidx[sel], fb[sel], v, dtype=dtype,
                interpret=mode == "interpret",
            )
    else:
        frames_nhwc = (
            jnp.transpose(frames, (0, 2, 3, 1)) if planar else frames
        )

        def gather_chunk(sel, v):
            return gather_crops_batch(frames_nhwc, fidx[sel], fb[sel], v, dtype=dtype)

    def embed_chunk(crops):
        return reid_forward(reid_params, reid_stats, crops, train=False, reid=True, dtype=dtype)

    feats = _embed_compacted_chunks(gather_chunk, embed_chunk, fv, hp.max_embed)
    return feats.reshape(b, n, -1)


def deepsort_frame_core(
    states: TrackerState,
    feats: jax.Array,     # [N, F] per-detection embeddings (zeros if absent)
    boxes: jax.Array,     # [N, 4] xyxy source pixels
    scores: jax.Array,    # [N]
    classes: jax.Array,   # [N] i32
    valid: jax.Array,     # [N] bool
    hp: DeepSortParams,
    out_hw: Tuple[int, int],
) -> Tuple[TrackerState, TrackerOutputs]:
    """Association + lifecycle for one frame, features precomputed.

    Split out so callers (pipeline/step.py) can batch the ReID embedding of
    MANY frames' crops into a single MXU pass instead of one small forward
    per frame inside the sequential scan.
    """
    h, w = out_hw
    k = hp.tracker.capacity

    cb, cs, cidx, cv, slot_m = _slot_by_class(
        boxes, scores, classes, valid, hp.num_classes, k
    )
    # per-slot features via the same one-hot contraction (exact: one nonzero
    # per row-sum) — the [C, K]-indexed gather from [N, F] lowers to
    # per-element fetches on TPU
    cf = jnp.einsum(
        "ckd,df->ckf", slot_m, feats, precision=jax.lax.Precision.HIGHEST
    )  # [C, K, F]

    # a class advances its tracker iff it had ANY raw detection this frame
    # (modules/track.py:55-59) — even if every one fails the conf filter
    present = jnp.any(cv, axis=1)  # [C]

    # confidence filter (deep_sort.py:31)
    cv = cv & (cs > hp.min_confidence)
    ct = xyxy_to_tlwh(cb)

    # SORT greedy NMS per class (deep_sort.py:33-37)
    keep = jax.vmap(lambda t, s, v: sort_nms_mask(t, s, v, hp.nms_max_overlap))(ct, cs, cv)
    cv = cv & keep

    # the reference's NMS returns picks in PROCESSING order (descending
    # score, ties -> higher index; preprocessing.py:54-56) and the detection
    # LIST keeps that order — it drives Hungarian column order and new-track
    # id order. det_order = each detection's rank in that list.
    def pick_rank(s, v):
        # rank under (descending score, ties -> higher original index) as a
        # comparison-matrix count: equivalent to the argsort+scatter form
        # but all-elementwise (vmapped scatters lower to slow loops on TPU)
        n = s.shape[0]
        sc = jnp.where(v, s, -jnp.inf)
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        before = (sc[None, :] > sc[:, None]) | ((sc[None, :] == sc[:, None]) & (j > i))
        return jnp.sum(before.astype(jnp.int32), axis=1)

    corder = jax.vmap(pick_rank)(cs, cv)  # [C, K]

    width = jnp.int32(w)
    height = jnp.int32(h)

    if hp.class_mode == "batched":
        # ONE class-batched tracker step: lifecycle/Kalman/cost math runs as
        # [C, ...] batched ops and every matching stage's Hungarian solves
        # collapse into a single grid-batched Pallas launch (the per-launch
        # fixed cost ~60 us dominates these tiny solves on v5e, and the
        # per-class XLA op stream is likewise fixed-cost-bound). The
        # reference's per-class skip semantics survive exactly: vmap turns
        # the present/needed-level conds into masked selects, and absent
        # classes' solves degenerate to nc=0 (zero insertions).
        #
        # The big feature buffers stay OUTSIDE the vmapped cond: under vmap
        # the cond lowers to a select over every carried leaf, and a select
        # over the [C, K, budget, F] gallery re-materializes ~31 MB/frame
        # (measured ~36 us/frame on v5e — the single largest tracker-glue
        # op). Precompute reads the gallery once (appearance einsum);
        # feature post commits the mutations once.
        pre = jax.vmap(
            lambda st, t, f, v: tracker_precompute(st, t, f, v, hp.tracker)
        )(states, ct, cf, cv)
        small = states._replace(
            gallery=None, gallery_count=None, pending_count=None
        )
        new_small, outputs, flags = jax.vmap(
            lambda st, pre_c, t, s, v, pres, ordr: tracker_step_core(
                st, pre_c, t, s, v, hp.tracker, width, height, pres, ordr
            )
        )(small, pre, ct, cs, cv, present, corder)
        f_n = cf / jnp.maximum(jnp.linalg.norm(cf, axis=-1, keepdims=True), 1e-12)
        gallery, gallery_count, pending_count = tracker_feature_post(
            states.gallery, states.gallery_count,
            states.pending_count, flags, f_n, hp.tracker,
        )
        st_new = new_small._replace(
            gallery=gallery,
            gallery_count=gallery_count,
            pending_count=pending_count,
        )
        return st_new, outputs

    # scan over classes, SMALL state only: the association core runs
    # per class under the scan (cond skips for empty classes / cascade
    # levels stay real control flow), while everything touching the big
    # feature buffers is hoisted out and batched over [C, ...]:
    #   PRE  — tracker_precompute vmapped (appearance einsum, Kalman
    #          predict + Mahalanobis gate as single [C, ...] ops);
    #   POST — tracker_feature_post once (pending append / reset /
    #          initiate / gallery-ring flush as gather+where ops).
    # Carrying the [K, budget, F] gallery through the scan cost a
    # dynamic-slice + copy + update of the whole buffer per class per
    # frame — ~0.3 ms/frame of pure HBM traffic at 4 classes on v5e.
    pre = jax.vmap(
        lambda st, t, f, v: tracker_precompute(st, t, f, v, hp.tracker)
    )(states, ct, cf, cv)

    small = states._replace(
        gallery=None, gallery_count=None, pending_count=None
    )

    def scan_body(_, xs):
        st, t, s, v, pres, ordr, pre_c = xs
        st_new, out, fl = tracker_step_core(
            st, pre_c, t, s, v, hp.tracker, width, height, pres, ordr
        )
        return None, (st_new, out, fl)

    _, (new_small, outputs, flags) = jax.lax.scan(
        scan_body, None, (small, ct, cs, cv, present, corder, pre)
    )

    f_n = cf / jnp.maximum(jnp.linalg.norm(cf, axis=-1, keepdims=True), 1e-12)
    gallery, gallery_count, pending_count = tracker_feature_post(
        states.gallery, states.gallery_count,
        states.pending_count, flags, f_n, hp.tracker,
    )
    new_states = new_small._replace(
        gallery=gallery,
        gallery_count=gallery_count,
        pending_count=pending_count,
    )
    return new_states, outputs


@partial(jax.jit, static_argnames=("hp", "crop_gain", "crop_pad", "out_hw", "dtype"))
def deepsort_frame(
    states: TrackerState,
    frame: jax.Array,     # [H, W, 3] uint8 RGB (crop source; see crop_gain)
    boxes: jax.Array,     # [N, 4] xyxy source pixels (from the detector)
    scores: jax.Array,    # [N]
    classes: jax.Array,   # [N] i32
    valid: jax.Array,     # [N] bool
    reid_params,
    reid_stats,
    hp: DeepSortParams,
    crop_gain: float = 1.0,
    crop_pad: Tuple[float, float] = (0.0, 0.0),
    out_hw: Tuple[int, int] = None,
    dtype=None,
) -> Tuple[TrackerState, TrackerOutputs]:
    """One frame through all per-class trackers (crop+embed included).

    `boxes` and the tracker state are always in SOURCE pixel space; when the
    crop-source `frame` is a letterboxed copy (thin-upload path), crop_gain/
    crop_pad map boxes into it for the ReID crop gather, and `out_hw` gives
    the source (height, width) used to clamp output boxes. Batch callers
    should embed with `embed_detections` over many frames at once and call
    `deepsort_frame_core` instead.
    """
    if out_hw is None:
        out_hw = (frame.shape[0], frame.shape[1])
    feats = embed_detections(
        frame, boxes, valid, reid_params, reid_stats, hp,
        crop_gain=crop_gain, crop_pad=crop_pad, dtype=dtype,
    )
    return deepsort_frame_core(states, feats, boxes, scores, classes, valid, hp, out_hw)
