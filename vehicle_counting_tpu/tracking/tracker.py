"""Fixed-capacity vectorized DeepSORT tracker core (one class instance).

Reference semantics being reproduced (networks/deepsort/sort/tracker.py,
track.py, nn_matching.py, linear_assignment.py, iou_matching.py), re-designed
as a pure function over an SoA state pytree so `lax.scan` can drive it over
frames on-device:

  * track slots [K]: Kalman mean/cov, lifecycle state (0 empty, 1 tentative,
    2 confirmed), hits/age/time_since_update, monotonically increasing ids
    (tracker.py:133-139 `_next_id` order preserved: new tracks take ids in
    detection order);
  * appearance gallery as a [K, budget, F] ring buffer == "keep the last
    `budget` samples" (nn_matching.py:137-154); features accumulate while
    Tentative and flush on confirmation (tracker.py:81-91 flushes only
    confirmed tracks' caches) — modeled as unrevealed in-ring writes, see
    tracker_feature_post;
  * matching cascade: for level in 0..max_age-1 match confirmed tracks with
    time_since_update == 1+level against remaining detections
    (linear_assignment.py:126-141), cost = min cosine distance to gallery
    (nn_matching.py:156-177) gated at 1e5 where squared Mahalanobis > 9.4877
    (linear_assignment.py:146-192), clamped at max_dist + 1e-5, Hungarian,
    post-filtered at max_dist (linear_assignment.py:12-77). Levels with no
    eligible tracks are skipped with lax.cond, so compiled work tracks real
    occupancy;
  * IoU stage on unconfirmed + just-missed tracks at max_iou_distance, with
    the time_since_update > 1 -> INFTY row rule (iou_matching.py:73-76);
  * lifecycle: hit -> KF update, hits+=1, tsu=0, confirm at hits >= n_init;
    miss -> delete Tentative immediately, Confirmed when tsu > max_age
    (track.py:129-156);
  * per-frame outputs: confirmed tracks with tsu <= 1 as int xyxy clamped to
    [0, W-1] x [0, H-1] (deep_sort.py:45-59, _tlwh_to_xyxy :96-107);
  * empty-frame quirk: when the class has NO detections this frame the whole
    step is a no-op (the reference never calls update for that class,
    modules/track.py:55-59) — tracks do not age.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vehicle_counting_tpu.ops.boxes import tlwh_iou_matrix, tlwh_to_xyah
from vehicle_counting_tpu.tracking import kalman
from vehicle_counting_tpu.tracking.assignment import (
    BIG,
    matching_cost_matrix,
    solve_assignment_sub_fast,
)

INFTY_COST = 1e5  # linear_assignment.py:9

EMPTY, TENTATIVE, CONFIRMED = 0, 1, 2


@dataclass(frozen=True)
class TrackerParams:
    """Per-camera DeepSORT hyper-parameters (configs/cam_configs.yaml keys)."""

    capacity: int = 64          # track slots K (== detection capacity)
    feat_dim: int = 512
    budget: int = 60            # NN_BUDGET gallery ring size
    pending_cap: int = 8        # >= N_INIT (bounds unrevealed ring appends;
                                # see tracker_feature_post — no buffer is
                                # allocated for it anymore)
    max_dist: float = 0.2       # MAX_DIST cosine matching threshold
    max_iou_distance: float = 0.6
    max_age: int = 30
    n_init: int = 3
    feat_dtype: str = "float32"  # gallery storage dtype. "bfloat16"
                                 # on TPU is BIT-IDENTICAL to f32 storage
                                 # there: the appearance einsum's default-
                                 # precision dot already rounds both operands
                                 # to bf16 on the MXU, so storing the rounded
                                 # value changes nothing — but it halves the
                                 # [K, budget, F] gallery's HBM footprint and
                                 # kills a per-frame f32->bf16 conversion
                                 # copy of the whole buffer (~36 us/frame at
                                 # [4,64,60,512] on v5e). f32 default keeps
                                 # CPU parity tests at full precision.


class TrackerState(NamedTuple):
    mean: jax.Array          # [K, 8]
    cov: jax.Array           # [K, 8, 8]
    track_id: jax.Array      # [K] i32
    state: jax.Array         # [K] i32
    hits: jax.Array          # [K] i32
    age: jax.Array           # [K] i32
    tsu: jax.Array           # [K] i32 time_since_update
    gallery: jax.Array       # [K, B, F] (holds pending rows too, see
                             # tracker_feature_post: pending features write
                             # directly at ring pos (gc + pc) % B and stay
                             # invisible until the confirm-flush reveals
                             # them by bumping gallery_count)
    gallery_count: jax.Array # [K] i32 (total REVEALED; ring pos = count % B)
    pending_count: jax.Array # [K] i32 (appended since last flush)
    last_conf: jax.Array     # [K] f32
    next_id: jax.Array       # [] i32
    overflow: jax.Array      # [] i32 count of dropped initiations


class TrackerOutputs(NamedTuple):
    boxes: jax.Array   # [K, 4] i32 xyxy
    ids: jax.Array     # [K] i32
    scores: jax.Array  # [K] f32
    mask: jax.Array    # [K] bool


class TrackerFlags(NamedTuple):
    """Per-slot association outcome — everything `tracker_feature_post` needs
    to apply the frame's gallery mutations OUTSIDE the association
    step. Multi-class callers scan the (small) association core over classes
    and run the feature-buffer update once, batched [C, ...]: carrying the
    [K, budget, F] gallery through the class scan costs a dynamic-slice +
    copy + dynamic-update-slice of the whole buffer per class per frame
    (~0.3 ms/frame at 4 classes on v5e — the dominant tracker cost before
    this split)."""

    matched: jax.Array     # [K] bool: slot matched a detection this frame
    gcol: jax.Array        # [K] i32: matched detection index (0 if unmatched)
    delete: jax.Array      # [K] bool: track deleted this frame
    src: jax.Array         # [K] i32: detection initiating this slot (K = none)
    conf_after: jax.Array  # [K] bool: state == CONFIRMED after lifecycle


def init_state(hp: TrackerParams) -> TrackerState:
    k, b, f = hp.capacity, hp.budget, hp.feat_dim
    mean = jnp.zeros((k, 8), jnp.float32).at[:, 3].set(1.0)  # h=1 keeps cholesky finite
    return TrackerState(
        mean=mean,
        cov=jnp.tile(jnp.eye(8, dtype=jnp.float32)[None], (k, 1, 1)),
        track_id=jnp.zeros((k,), jnp.int32),
        state=jnp.zeros((k,), jnp.int32),
        hits=jnp.zeros((k,), jnp.int32),
        age=jnp.zeros((k,), jnp.int32),
        tsu=jnp.zeros((k,), jnp.int32),
        gallery=jnp.zeros((k, b, f), jnp.dtype(hp.feat_dtype)),
        gallery_count=jnp.zeros((k,), jnp.int32),
        pending_count=jnp.zeros((k,), jnp.int32),
        last_conf=jnp.zeros((k,), jnp.float32),
        next_id=jnp.int32(1),
        overflow=jnp.int32(0),
    )


def _appearance_cost(st: TrackerState, feat: jax.Array, hp: TrackerParams) -> jax.Array:
    """[K, D] min cosine distance of each detection to each track's gallery."""
    f_n = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
    # gallery stored normalized; match the detection features to the storage
    # dtype so a bf16 gallery feeds the MXU directly (the default-precision
    # f32 dot rounds to bf16 anyway — same values, minus a whole-buffer
    # conversion copy per frame), accumulating in f32 either way
    sims = jnp.einsum(
        "kbf,df->kbd", st.gallery, f_n.astype(st.gallery.dtype),
        preferred_element_type=jnp.float32,
    )
    b = st.gallery.shape[1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    slot_valid = slot < jnp.minimum(st.gallery_count, b)[:, None]  # [K, B]
    dist = 1.0 - sims
    dist = jnp.where(slot_valid[:, :, None], dist, INFTY_COST)
    return jnp.min(dist, axis=1)  # [K, D]


def _stable_perm(keys: jax.Array) -> jax.Array:
    """Stable ascending permutation of [K] int keys, without a sort.

    rank[i] = #{j: keys[j] < keys[i]} + #{j < i: keys[j] == keys[i]}, computed
    as one [K, K] comparison-matrix reduce + a [K]-indexed scatter. Equivalent
    to jnp.argsort(keys, stable=True), but ~2 us cheaper per instance on v5e
    at K=64 — and the match cascade runs ~2 instances per stage per class per
    frame, which made the two argsorts the single largest line item in the
    steady-state tracker profile (~125 us/frame of 1150)."""
    k = keys.shape[0]
    idx = jnp.arange(k, dtype=jnp.int32)
    lt = keys[:, None] > keys[None, :]
    tie = (keys[:, None] == keys[None, :]) & (idx[None, :] < idx[:, None])
    rank = jnp.sum(lt | tie, axis=1).astype(jnp.int32)
    # invert rank -> perm as a permutation matmul, not a scatter (scatters
    # lower to per-lane loops under vmap — the batched class mode vmaps
    # this) and not an int select-reduce (measured 19 us/frame; the f32 dot
    # rides the MXU and K <= 64 indices are exact in f32)
    oh = (rank[None, :] == idx[:, None]).astype(jnp.float32)
    return (oh @ idx.astype(jnp.float32)).astype(jnp.int32)


def _match_stage(cost, rows, det_free, track_col, threshold, row_order, det_key, stage_base):
    """One min_cost_matching pass over masked rows/cols.

    Besides matches, maintains `det_key`: the reference's unmatched-detections
    list order (linear_assignment.py:69-76 appends matched-but-rejected
    detections to the END in ascending Hungarian row order, and
    tracker.py:77-79 initiates new tracks in that list order). Rejected
    detections get key = stage_base * K + (rejection rank in compacted row
    order), which sorts them behind every not-yet-rejected detection while
    preserving the within-stage ordering. Rows/cols are compacted so the
    solver sees them in the reference's exact orders (scipy tie-breaking).
    """
    k = cost.shape[0]
    imax = jnp.iinfo(jnp.int32).max

    def solve(args):
        det_free_, track_col_, det_key_ = args
        nr = jnp.sum(rows.astype(jnp.int32))
        nc = jnp.sum(det_free_.astype(jnp.int32))
        # compact: real rows first in reference row order, real cols first in
        # unmatched-list order — scipy tie-breaking scans in these orders.
        row_perm = _stable_perm(jnp.where(rows, row_order, imax))
        col_perm = _stable_perm(jnp.where(det_free_, det_key_, imax))
        c = matching_cost_matrix(cost, rows, det_free_, threshold)
        # permute the cost matrix with permutation MATMULS, not gathers:
        # P_r @ c @ P_c^T is exact (0/1 factors, one nonzero per row-sum)
        # and runs on the MXU; vmapped gathers under the batched class mode
        # cost ~2.5 us each (~53 us/frame), a 2-D-indexed gather 4096 scalar
        # fetches. Precision MUST be HIGHEST: the permutation factors are
        # exact in bf16 but the COST VALUES are not, and the TPU's default
        # single-pass bf16 matmul truncates them (measured: flipped 2/48
        # random association scenarios vs the CPU/fused-kernel semantics).
        a_i = jnp.arange(k, dtype=jnp.int32)
        p_r = (row_perm[:, None] == a_i[None, :]).astype(c.dtype)  # [K, K]
        p_c = (col_perm[:, None] == a_i[None, :]).astype(c.dtype)
        hi = jax.lax.Precision.HIGHEST
        c2 = jnp.matmul(jnp.matmul(p_r, c, precision=hi), p_c.T, precision=hi)
        r2c = solve_assignment_sub_fast(c2, nr, nc)  # permuted row -> permuted col

        a = jnp.arange(k)
        paired = (a < nr) & (r2c >= 0) & (r2c < nc)
        # read c2's per-row assigned cost and map permuted->original columns
        # via one-hot reduces (vmapped gathers cost ~2.5 us each here,
        # ~53 us/frame across the cascade; the [K, K] reduces are ~1 us and
        # exact — one nonzero term per row)
        oh_rc = jnp.clip(r2c, 0, k - 1)[:, None] == a[None, :]  # [K(row), K(col)]
        cost_at = jnp.sum(jnp.where(oh_rc, c2, 0.0), axis=1)
        accept = paired & (cost_at <= threshold)
        reject = paired & ~accept
        slot_col = jnp.sum(jnp.where(oh_rc, col_perm[None, :], 0), axis=1)

        # All updates below are one-hot reduces over the permuted-row axis
        # `a` rather than scatters: a scatter lowers to a ~14 us per-lane
        # loop under vmap (the batched class mode vmaps this whole stage),
        # while a [K, K] masked reduce costs ~1 us either way. row_perm /
        # slot_col hit each target index at most once, so sum == the single
        # written value.
        onehot_r = accept[None, :] & (row_perm[None, :] == a[:, None])  # [K(i), K(a)]
        hit_r = jnp.any(onehot_r, axis=1)
        track_col_ = jnp.where(
            hit_r, jnp.sum(jnp.where(onehot_r, slot_col[None, :], 0), axis=1), track_col_
        )
        taken = jnp.any(
            accept[None, :] & (slot_col[None, :] == a[:, None]), axis=1
        )  # [K(j)]
        # demote rejected detections in submatrix row order (= scipy's
        # ascending row_ind, the order min_cost_matching appends them);
        # inclusive prefix count as a [K, K] triangular masked reduce
        # (cumsum lowers to a ~6 us reduce-window on v5e; exact i32 0/1)
        tri_r = a[None, :] <= a[:, None]  # [K(i), K(j)]: j <= i
        rank = (
            jnp.sum(
                jnp.where(tri_r, reject[None, :].astype(jnp.int32), 0), axis=1
            )
            - 1
        )
        onehot_j = reject[None, :] & (slot_col[None, :] == a[:, None])  # [K(j), K(a)]
        det_key_ = jnp.where(
            jnp.any(onehot_j, axis=1),
            stage_base * k + jnp.sum(jnp.where(onehot_j, rank[None, :], 0), axis=1),
            det_key_,
        )
        return det_free_ & ~taken, track_col_, det_key_

    do = jnp.any(rows) & jnp.any(det_free)
    return jax.lax.cond(do, solve, lambda a: a, (det_free, track_col, det_key))


def _associate_xla(gated, iou_cost, lvl_of, tentative, track_id, iou_order,
                   det_valid, det_order, hp):
    """Staged association: one `_match_stage` (and, on TPU, one Pallas solver
    launch) per occupied cascade level + one for the IoU stage.

    Empty levels are no-ops in the reference too (matching_cascade's
    `continue`, linear_assignment.py:133-135), so iterate ONLY the levels
    where some confirmed track actually lives: start at min(lvl_of) and jump
    to the next occupied level each step. With spread track ages the naive
    level+1 walk costs ~2-4 us of loop control per EMPTY level on TPU.
    """
    k = gated.shape[0]
    imax = jnp.iinfo(jnp.int32).max
    det_free0 = det_valid
    track_col0 = jnp.full((k,), -1, jnp.int32)
    # init-order key: the detection's position in the (NMS pick-ordered)
    # detection list; rejections demote (see _match_stage). stage_base
    # starts at 1 so any demotion sorts last.
    det_key0 = det_order
    first_level = jnp.min(lvl_of)

    def level_cond(carry):
        level, det_free_, _, _ = carry
        return (level != imax) & jnp.any(det_free_)

    def level_body(carry):
        level, det_free_, track_col_, det_key_ = carry
        rows = lvl_of == level
        det_free_, track_col_, det_key_ = _match_stage(
            gated, rows, det_free_, track_col_, hp.max_dist,
            track_id, det_key_, 1 + level,
        )
        next_level = jnp.min(jnp.where(lvl_of > level, lvl_of, imax))
        return next_level, det_free_, track_col_, det_key_

    _, det_free, track_col, det_key = jax.lax.while_loop(
        level_cond, level_body, (first_level, det_free0, track_col0, det_key0)
    )

    # ---- IoU stage (tracker.py:117-127) ---------------------------------
    iou_rows = tentative | ((lvl_of == 0) & (track_col < 0))
    det_free, track_col, det_key = _match_stage(
        iou_cost, iou_rows, det_free, track_col, hp.max_iou_distance,
        iou_order, det_key, 1 + hp.max_age,
    )
    return det_free, track_col, det_key


def _stable_rank(keys: jax.Array) -> jax.Array:
    """rank[i] = position of i in a stable ascending sort of [K] i32 keys."""
    k = keys.shape[0]
    idx = jnp.arange(k, dtype=jnp.int32)
    lt = keys[:, None] > keys[None, :]
    tie = (keys[:, None] == keys[None, :]) & (idx[None, :] < idx[:, None])
    return jnp.sum(lt | tie, axis=1).astype(jnp.int32)


# None: auto (fused Pallas cascade kernel on TPU when the backend compiles
# Mosaic); True: force (interpret mode off-TPU — used by CPU parity tests);
# False: force the staged XLA path.
FORCE_PALLAS_CASCADE = None

# None: auto (class-parallel kernel when it compiles — all classes' Dijkstra
# state machines advance in the same loop iterations, so the fused-cascade
# cost is the max over classes instead of the sum; measured 3.3x at C=4,
# 30 dets/class on v5e). False pins the one-grid-step-per-class kernel.
# Trace-time knob like FORCE_PALLAS_CASCADE (flips need fresh jit traces).
CASCADE_CLASS_PARALLEL = None


def _use_class_parallel(interpret: bool) -> bool:
    if CASCADE_CLASS_PARALLEL is False:
        return False
    if interpret:
        return True
    try:
        from vehicle_counting_tpu.ops.pallas.cascade import (
            pallas_cascade_cp_supported,
        )

        return pallas_cascade_cp_supported()
    except Exception:
        return False


def _cascade_kernel_mode(hp) -> str:
    """'off' | 'compile' | 'interpret' — trace-time dispatch decision."""
    # demoted det_key values (stage_base * K + rank) and ranks round-trip
    # through exact f32 one-hot matmuls inside the kernel
    if (hp.max_age + 2) * hp.capacity >= (1 << 22):
        return "off"
    if FORCE_PALLAS_CASCADE is False:
        return "off"
    if FORCE_PALLAS_CASCADE is True:
        return "interpret"
    if jax.default_backend() == "tpu":
        try:
            from vehicle_counting_tpu.ops.pallas.cascade import (
                pallas_cascade_supported,
            )

            if pallas_cascade_supported():
                return "compile"
        except Exception:
            pass
    return "off"


from functools import lru_cache, partial


@lru_cache(maxsize=None)
def _make_cascade_match(max_dist: float, max_iou: float, max_age: int,
                        interpret: bool):
    """custom_vmap fused-cascade entry: single class unbatched, one grid
    kernel for all classes under the batched class mode's vmap."""
    from vehicle_counting_tpu.ops.pallas.cascade import cascade_match_batched

    @jax.custom_batching.custom_vmap
    def match(gated, iou_cost, lvl_of, tentative, crank, irank, det_valid,
              det_order):
        det_free, det_key, out_row = cascade_match_batched(
            gated[None], iou_cost[None], lvl_of[None], tentative[None],
            crank[None], irank[None], det_valid[None], det_order[None],
            max_dist, max_iou, max_age=max_age, interpret=interpret,
        )
        return det_free[0], det_key[0], out_row[0]

    @match.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        from vehicle_counting_tpu.ops.pallas.cascade import (
            cascade_match_classparallel,
        )

        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        ]
        # class-parallel kernel when available: one grid step for ALL
        # classes (sublane-batched Dijkstra) instead of one per class
        fn = (
            cascade_match_classparallel
            if _use_class_parallel(interpret)
            else cascade_match_batched
        )
        out = fn(
            *args, max_dist, max_iou, max_age=max_age, interpret=interpret
        )
        return out, (True, True, True)

    return match


def _associate(gated, iou_cost, lvl_of, tentative, track_id, iou_order,
               det_valid, det_order, hp):
    """Cascade + IoU association -> (det_free, track_col, det_key).

    Dispatches between the fused single-launch Pallas kernel
    (ops/pallas/cascade.py — whole cascade resident in VMEM, one launch per
    frame for ALL classes under vmap) and the staged XLA path (one solver
    call per stage). Both produce identical results; the decision is made at
    trace time from the backend.
    """
    mode = _cascade_kernel_mode(hp)
    if mode == "off":
        return _associate_xla(gated, iou_cost, lvl_of, tentative, track_id,
                              iou_order, det_valid, det_order, hp)

    from vehicle_counting_tpu.ops.pallas.cascade import LVL_SENTINEL

    k = gated.shape[0]
    match = _make_cascade_match(
        float(hp.max_dist), float(hp.max_iou_distance), int(hp.max_age),
        mode == "interpret",
    )
    det_free, det_key, out_row = match(
        gated,
        iou_cost,
        jnp.minimum(lvl_of, LVL_SENTINEL),
        tentative.astype(jnp.int32),
        _stable_rank(track_id),
        _stable_rank(iou_order),
        det_valid.astype(jnp.int32),
        det_order,
    )
    # invert det slot -> track slot into per-track matched column (one-hot
    # reduce, not a scatter; each track appears in at most one out_row entry)
    a = jnp.arange(k, dtype=jnp.int32)
    oh = out_row[None, :] == a[:, None]  # [K(track), K(det)]
    track_col = jnp.where(
        jnp.any(oh, axis=1), jnp.sum(jnp.where(oh, a[None, :], 0), axis=1), -1
    )
    return det_free, track_col, det_key


def tracker_precompute(st: TrackerState, tlwh, feat, det_valid, hp: TrackerParams):
    """Association-independent per-frame math: predict + gated cost matrix.

    Everything here depends only on the incoming state and detections — not
    on any matching decision — so multi-class callers vmap it over the class
    axis BEFORE the sequential class scan: the appearance einsum and the
    Kalman predict/gating run as single [C, ...] batched ops (better MXU
    tiling, C times fewer sequential dispatches) instead of per class inside
    the scan. Returns (pred_mean, pred_cov, gated_cost [K, D]).
    """
    active = st.state > EMPTY
    pm, pc = kalman.predict(st.mean, st.cov)
    mean = jnp.where(active[:, None], pm, st.mean)
    cov = jnp.where(active[:, None, None], pc, st.cov)
    det_xyah = tlwh_to_xyah(tlwh)
    app = _appearance_cost(st, feat, hp)                   # [K, D]
    maha = kalman.gating_distance(mean, cov, det_xyah)     # [K, D]
    gated = jnp.where(maha > kalman.CHI2INV95_4DOF, INFTY_COST, app)
    gated = jnp.where(det_valid[None, :], gated, BIG)
    return mean, cov, gated


@partial(jax.jit, static_argnames=("hp",))
def tracker_step(
    st: TrackerState,
    tlwh: jax.Array,    # [K, 4] detection boxes (post conf-filter + NMS)
    conf: jax.Array,    # [K]
    feat: jax.Array,    # [K, F] appearance embeddings (L2-normalized upstream)
    det_valid: jax.Array,  # [K] bool
    hp: TrackerParams,
    width,
    height,
    present=None,
    det_order=None,
    pre=None,
) -> Tuple[TrackerState, TrackerOutputs]:
    """One frame for one class. Detection capacity equals track capacity K.

    `present`: whether the class had ANY raw detection this frame — BEFORE the
    confidence filter. The reference only skips a class's update when the
    per-class detection list is empty (modules/track.py:55-59); if detections
    exist but all fall below MIN_CONFIDENCE, the tracker still advances with
    an empty detection set (deep_sort.py:31,41-42). Defaults to
    any(det_valid) for callers that pre-filter.

    `det_order` [K] i32: each detection's position in the reference's
    detection LIST — the SORT-NMS pick order, i.e. descending score with
    ties to the higher index (preprocessing.py:54-56). It drives Hungarian
    column order and new-track id assignment. Defaults to slot order.

    `pre`: optional (pred_mean, pred_cov, gated_cost) from
    `tracker_precompute` — lets multi-class callers batch that math over
    classes; computed here when absent.
    """
    k = hp.capacity
    if present is None:
        present = jnp.any(det_valid)
    if det_order is None:
        det_order = jnp.arange(k, dtype=jnp.int32)

    def no_dets(st_):
        empty = TrackerOutputs(
            boxes=jnp.zeros((k, 4), jnp.int32),
            ids=jnp.zeros((k,), jnp.int32),
            scores=jnp.zeros((k,), jnp.float32),
            mask=jnp.zeros((k,), bool),
        )
        return st_, empty

    def run(st_):
        return _tracker_step_impl(
            st_, tlwh, conf, feat, det_valid, hp, width, height, det_order, pre
        )

    return jax.lax.cond(present, run, no_dets, st)


def _tracker_core(st, pre, tlwh, conf, det_valid, hp, width, height, det_order):
    """Association + lifecycle on the SMALL state only.

    Returns (new_state, outputs, flags). gallery/*_count leaves pass
    through UNTOUCHED (they may be None for scan callers that carry them
    outside); apply `tracker_feature_post` with the returned flags to commit
    the frame's feature-buffer mutations.
    """
    k = hp.capacity
    active = st.state > EMPTY

    mean, cov, gated = pre
    age = st.age + active.astype(jnp.int32)
    tsu = st.tsu + active.astype(jnp.int32)

    det_xyah = tlwh_to_xyah(tlwh)

    confirmed = st.state == CONFIRMED
    tentative = st.state == TENTATIVE
    imax = jnp.iinfo(jnp.int32).max
    # level L matches tracks with tsu == 1 + L (cascade depth = max_age)
    lvl_of = jnp.where(confirmed & (tsu <= hp.max_age), tsu - 1, imax)
    iou_cost = 1.0 - tlwh_iou_matrix(kalman.to_tlwh(mean), tlwh)
    iou_cost = jnp.where(tsu[:, None] > 1, INFTY_COST, iou_cost)  # iou_matching.py:73-76
    # row order in the reference's IoU stage: unconfirmed tracks first
    # (tracker.py:117-121), each group in track-list (= id) order.
    iou_order = st.track_id + jnp.where(confirmed, 1 << 20, 0)

    det_free, track_col, det_key = _associate(
        gated, iou_cost, lvl_of, tentative, st.track_id, iou_order,
        det_valid, det_order, hp,
    )

    # ---- matched: KF update + lifecycle (track.py:129-148) ------------------
    matched = track_col >= 0
    gcol = jnp.where(matched, track_col, 0)
    # det_xyah[gcol] / conf[gcol] as one-hot contractions: each row has
    # exactly one nonzero term, so the HIGHEST matmul / masked reduce is
    # exact, and the vmapped [K]-indexed gathers they replace cost ~2.4 us
    # each per frame on v5e (profiled round 3)
    n_det_ = det_xyah.shape[0]
    oh_g = jnp.broadcast_to(gcol[:, None], (k, n_det_)) == jnp.arange(
        n_det_, dtype=jnp.int32
    )  # [K, D]
    meas = jnp.matmul(
        oh_g.astype(jnp.float32), det_xyah, precision=jax.lax.Precision.HIGHEST
    )
    um, uc = kalman.update(mean, cov, meas)
    mean = jnp.where(matched[:, None], um, mean)
    cov = jnp.where(matched[:, None, None], uc, cov)
    hits = st.hits + matched.astype(jnp.int32)
    tsu = jnp.where(matched, 0, tsu)
    conf_at = jnp.sum(jnp.where(oh_g, conf[None, :], 0.0), axis=1)
    last_conf = jnp.where(matched, conf_at, st.last_conf)

    state = st.state
    state = jnp.where((state == TENTATIVE) & (hits >= hp.n_init), CONFIRMED, state)

    # ---- missed: delete tentative, expire confirmed (track.py:150-156) ------
    missed = active & ~matched
    delete = (missed & (st.state == TENTATIVE)) | (missed & (tsu > hp.max_age))
    state = jnp.where(delete, EMPTY, state)

    # ---- initiate new tracks from unmatched detections ----------------------
    unmatched_det = det_valid & det_free
    # new tracks take ids in the unmatched-detections LIST order (original
    # index order, with Hungarian-rejected detections demoted; see det_key)
    order_key = jnp.where(unmatched_det, det_key, jnp.iinfo(jnp.int32).max)
    det_rank = jnp.sum(order_key[:, None] > order_key[None, :], axis=1)
    free = state == EMPTY
    d_idx = jnp.arange(k, dtype=jnp.int32)
    # inclusive prefix count as a [K, K] triangular masked reduce: jnp.cumsum
    # at [64] lowers to a reduce-window that costs ~6 us/frame on v5e inside
    # the frame scan (profiled round 3); the masked reduce is ~1 us and
    # exact (i32 sums of 0/1)
    tri = d_idx[None, :] <= d_idx[:, None]  # [K(i), K(j)]: j <= i
    free_pos = (
        jnp.sum(jnp.where(tri, free[None, :].astype(jnp.int32), 0), axis=1) - 1
    )
    num_free = jnp.sum(free.astype(jnp.int32))
    # slot_of_rank[r] = index of the r-th free slot; one-hot reduce instead
    # of a scatter (scatters lower to per-lane loops under the batched class
    # mode's vmap; a [K, K] masked reduce costs ~1 us either way)
    oh_free = free[None, :] & (free_pos[None, :] == d_idx[:, None])  # [K(r), K(i)]
    slot_of_rank = jnp.where(
        jnp.any(oh_free, axis=1),
        jnp.sum(jnp.where(oh_free, d_idx[None, :], 0), axis=1),
        k,
    )

    place = unmatched_det & (det_rank < num_free)
    # slot_of_rank[det_rank] as a one-hot masked reduce (the vmapped gather
    # costs ~2.4 us/frame; the [K, K] reduce ~1 us, exact in i32)
    oh_rank = jnp.clip(det_rank, 0, k - 1)[:, None] == d_idx[None, :]  # [D(K), K]
    slot_at = jnp.sum(jnp.where(oh_rank, slot_of_rank[None, :], 0), axis=1)
    target = jnp.where(place, slot_at, k)  # [D]->slot

    nm, ncv = kalman.initiate(det_xyah)  # [D, 8], [D, 8, 8]
    # slot initiation as one-hot selects/matmuls, not scatters. W[i, d] =
    # detection d initiates slot i — a permutation submatrix, so each f32
    # row-sum has at most one nonzero term (bit-exact vs the scatter form).
    W = place[None, :] & (target[None, :] == d_idx[:, None])  # [K(slot), D(det)]
    hit = jnp.any(W, axis=1)
    Wf = W.astype(jnp.float32)
    mean = jnp.where(hit[:, None], Wf @ nm, mean)
    cov = jnp.where(hit[:, None, None], (Wf @ ncv.reshape(k, -1)).reshape(k, 8, 8), cov)
    new_ids = (st.next_id + det_rank).astype(jnp.int32)
    track_id = jnp.where(
        hit, jnp.sum(jnp.where(W, new_ids[None, :], 0), axis=1), st.track_id
    )
    state = jnp.where(hit, TENTATIVE, state)
    hits = jnp.where(hit, 1, hits)
    age = jnp.where(hit, 1, age)
    tsu = jnp.where(hit, 0, tsu)
    last_conf = jnp.where(hit, Wf @ conf, last_conf)
    # invert det->slot into slot->det for the feature-buffer post pass
    src = jnp.where(hit, jnp.sum(jnp.where(W, d_idx[None, :], 0), axis=1), k)

    num_new = jnp.sum(place.astype(jnp.int32))
    next_id = st.next_id + num_new
    overflow = st.overflow + jnp.sum((unmatched_det & ~place).astype(jnp.int32))

    new_state = st._replace(
        mean=mean,
        cov=cov,
        track_id=track_id,
        state=state,
        hits=hits,
        age=age,
        tsu=tsu,
        last_conf=last_conf,
        next_id=next_id,
        overflow=overflow,
    )
    flags = TrackerFlags(
        matched=matched,
        gcol=gcol,
        delete=delete,
        src=src,
        conf_after=state == CONFIRMED,
    )

    # ---- outputs (deep_sort.py:45-59) ---------------------------------------
    out_mask = (state == CONFIRMED) & (tsu <= 1)
    t = kalman.to_tlwh(mean)
    x1 = jnp.maximum(t[:, 0].astype(jnp.int32), 0)
    y1 = jnp.maximum(t[:, 1].astype(jnp.int32), 0)
    x2 = jnp.minimum((t[:, 0] + t[:, 2]).astype(jnp.int32), width - 1)
    y2 = jnp.minimum((t[:, 1] + t[:, 3]).astype(jnp.int32), height - 1)
    outputs = TrackerOutputs(
        boxes=jnp.stack([x1, y1, x2, y2], axis=-1) * out_mask[:, None],
        ids=track_id * out_mask,
        scores=last_conf * out_mask,
        mask=out_mask,
    )
    return new_state, outputs, flags


def tracker_feature_post(gallery, gallery_count, pending_count, flags, f_n, hp):
    """Commit the frame's gallery mutations from association flags.

    Replays, in order, exactly what the reference does around Tracker.update
    (tracker.py:81-91, track.py:129-148): (1) matched tracks append their
    detection's feature, (2) deleted tracks reset, (3) newly initiated slots
    start with [feature], (4) confirmed tracks flush their accumulated
    features into the nn_matching gallery (partial_fit, "last budget
    samples win").

    There is no separate pending buffer: a track's i-th append since its
    last flush lands at ring position (gallery_count + i) % budget no
    matter when it flushes, so features write DIRECTLY into the
    [K, budget, F] ring at (gallery_count + pending_count) % budget and the
    confirm-flush merely REVEALS them (gallery_count += pending_count).
    The appearance cost masks ring rows >= min(gallery_count, budget), so
    unconfirmed appends stay invisible — bit-identical to the explicit
    pending buffer this replaces, which cost a [lead*K*pending_cap]-row
    flush scatter + a full pending-buffer rewrite (~45 us/frame fixed at
    [4,64] slots on v5e, the dominant tracker glue item) every frame.
    Reachability: a tentative track appends at most n_init (<= pending_cap
    <= budget, TrackerParams invariant) features before confirming or
    being deleted, and confirmed tracks flush every matched frame, so
    unrevealed appends never wrap the ring into revealed history.

    At most ONE ring row is written per slot per frame (matched xor newly
    initiated), so the whole step is a single flat [lead*K]-row scatter
    plus counter selects, with arbitrary leading batch dims — multi-class
    callers run this ONCE batched [C, ...] after the per-class association
    scan.

    Args: gallery [..., K, B, F], counts [..., K], flags leaves [..., K],
    f_n [..., D, F] L2-normalized detection features.
    """
    b = hp.budget
    k = gallery.shape[-3]
    f_n = f_n.astype(gallery.dtype)  # storage dtype (see TrackerParams.feat_dtype)

    # (1) matched tracks append at (gc + pc) % b; (3) initiated slots write
    # their detection's feature at ring position 0 (counters reset below).
    # The written feature per slot comes from ONE detection index (matched
    # column xor initiating detection), so both take_along_axis gathers and
    # the [..., K, F] select collapse into a single one-hot contraction —
    # exact (one nonzero per row; HIGHEST reconstructs f32 storage exactly,
    # bf16 storage is already rounded), and each vmapped gather it replaces
    # cost ~2.2 us/frame on v5e (profiled round 3).
    has_new = flags.src < k
    write = flags.matched | has_new
    d_cnt = f_n.shape[-2]
    idx = jnp.clip(
        jnp.where(has_new, flags.src, flags.gcol), 0, d_cnt - 1
    )  # [..., K]
    oh_w = (
        idx[..., :, None] == jnp.arange(d_cnt, dtype=jnp.int32)
    ).astype(f_n.dtype)  # [..., K, D]
    feat_w = jnp.einsum(
        "...kd,...df->...kf", oh_w, f_n, precision=jax.lax.Precision.HIGHEST
    )  # [..., K, F]
    pos = jnp.where(has_new, 0, (gallery_count + pending_count) % b)
    pos = jnp.where(write, pos, b)  # b -> dropped
    lead_shape = gallery.shape
    g2 = gallery.reshape((-1,) + gallery.shape[-2:])  # [R, B, F]
    rows = jnp.arange(g2.shape[0], dtype=jnp.int32)
    gallery = (
        g2.at[rows, pos.reshape(-1)]
        .set(feat_w.reshape(g2.shape[0], -1), mode="drop")
        .reshape(lead_shape)
    )
    pending_count = jnp.where(flags.matched, pending_count + 1, pending_count)

    # (2) deleted tracks reset, (3) initiated slots start with 1 unrevealed
    gallery_count = jnp.where(flags.delete, 0, gallery_count)
    pending_count = jnp.where(flags.delete, 0, pending_count)
    gallery_count = jnp.where(has_new, 0, gallery_count)
    pending_count = jnp.where(has_new, 1, pending_count)

    # (4) flush == reveal
    gallery_count = jnp.where(
        flags.conf_after, gallery_count + pending_count, gallery_count
    )
    pending_count = jnp.where(flags.conf_after, 0, pending_count)
    return gallery, gallery_count, pending_count


def tracker_step_core(st, pre, tlwh, conf, det_valid, hp, width, height, present, det_order):
    """cond(present)-gated association core for multi-class scan callers.

    `st` may carry None for gallery/*_count leaves (they live
    OUTSIDE the class scan; see TrackerFlags). Returns (new_st, outputs,
    flags), with all-zero flags when the class had no raw detection this
    frame (the reference never calls that class's update,
    modules/track.py:55-59 — state must not advance and buffers must not
    change).
    """
    k = hp.capacity

    def no_dets(st_):
        empty = TrackerOutputs(
            boxes=jnp.zeros((k, 4), jnp.int32),
            ids=jnp.zeros((k,), jnp.int32),
            scores=jnp.zeros((k,), jnp.float32),
            mask=jnp.zeros((k,), bool),
        )
        flags = TrackerFlags(
            matched=jnp.zeros((k,), bool),
            gcol=jnp.zeros((k,), jnp.int32),
            delete=jnp.zeros((k,), bool),
            src=jnp.full((k,), k, jnp.int32),
            conf_after=jnp.zeros((k,), bool),
        )
        return st_, empty, flags

    def run(st_):
        return _tracker_core(
            st_, pre, tlwh, conf, det_valid, hp, width, height, det_order
        )

    return jax.lax.cond(present, run, no_dets, st)


def _tracker_step_impl(st, tlwh, conf, feat, det_valid, hp, width, height, det_order, pre=None):
    """Self-contained single-class step: precompute + core + feature post."""
    if pre is None:
        pre = tracker_precompute(st, tlwh, feat, det_valid, hp)
    st2, outputs, flags = _tracker_core(
        st, pre, tlwh, conf, det_valid, hp, width, height, det_order
    )
    f_n = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
    gallery, gallery_count, pending_count = tracker_feature_post(
        st.gallery, st.gallery_count, st.pending_count, flags, f_n, hp
    )
    return (
        st2._replace(
            gallery=gallery,
            gallery_count=gallery_count,
            pending_count=pending_count,
        ),
        outputs,
    )
