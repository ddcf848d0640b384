"""Fused Pallas cascade kernel vs the staged XLA association path.

The kernel (ops/pallas/cascade.py) must reproduce the staged path —
`tracking.tracker._associate_xla`, itself frame-exact against the
reference's DeepSORT — bit for bit: same matches, same unmatched-detection
key order (drives new-track ids), same det_free sets. Scenarios force the
hard corners: clamp-tie costs (every gated row ties at max_dist + 1e-5),
nr > nc (scipy's transpose rule), multi-level cascades with gaps, rejected
matches (cost above threshold after Hungarian), tentative-only IoU stages,
and empty inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.ops.pallas.cascade import (
    LVL_SENTINEL,
    cascade_match_batched,
)
from vehicle_counting_tpu.tracking import tracker as trk
from vehicle_counting_tpu.tracking.tracker import TrackerParams, _associate_xla, _stable_rank


def _random_scenario(rng, k, max_age, n_tracks, n_dets, n_classes=1,
                     clamp_frac=0.5, tie_frac=0.3):
    """Random association inputs mirroring what _tracker_core computes."""
    out = []
    for _ in range(n_classes):
        # track slots: first n_tracks active with random state/age
        state = np.zeros(k, np.int64)
        state[:n_tracks] = rng.choice([1, 2], size=n_tracks, p=[0.3, 0.7])
        tsu = np.ones(k, np.int64)
        tsu[:n_tracks] = rng.integers(1, max_age + 2, size=n_tracks)
        # tentative tracks are always tsu <= 1 in live states
        tsu[state == 1] = 1
        track_id = np.zeros(k, np.int64)
        track_id[:n_tracks] = rng.permutation(np.arange(1, n_tracks + 1))

        confirmed = state == 2
        lvl_of = np.where(confirmed & (tsu <= max_age), tsu - 1, np.iinfo(np.int32).max)

        det_valid = np.zeros(k, bool)
        det_valid[:n_dets] = True
        det_order = rng.permutation(k).astype(np.int64)

        gated = rng.uniform(0, 0.4, size=(k, k)).astype(np.float32)
        # clamp ties: gated rows at INFTY (Mahalanobis fail) and cost
        # clamping make max_dist + 1e-5 ties COMMON in real frames
        gate_fail = rng.uniform(size=(k, k)) < clamp_frac
        gated = np.where(gate_fail, 1e5, gated)
        gated = np.where(det_valid[None, :], gated, 8.0)

        iou = rng.uniform(0, 1.2, size=(k, k)).astype(np.float32)
        tie_mask = rng.uniform(size=(k, k)) < tie_frac
        iou = np.where(tie_mask, 0.55, iou)
        iou = np.where(tsu[:, None] > 1, 1e5, iou)

        iou_order = track_id + np.where(confirmed, 1 << 20, 0)
        out.append(dict(
            gated=gated, iou=iou.astype(np.float32), lvl_of=lvl_of,
            tentative=state == 1, track_id=track_id, iou_order=iou_order,
            det_valid=det_valid, det_order=det_order,
        ))
    return out


def _run_xla(s, hp):
    return _associate_xla(
        jnp.asarray(s["gated"]), jnp.asarray(s["iou"]),
        jnp.asarray(s["lvl_of"], jnp.int32), jnp.asarray(s["tentative"]),
        jnp.asarray(s["track_id"], jnp.int32),
        jnp.asarray(s["iou_order"], jnp.int32),
        jnp.asarray(s["det_valid"]), jnp.asarray(s["det_order"], jnp.int32),
        hp,
    )


def _run_kernel(scenarios, hp):
    det_free, det_key, out_row = cascade_match_batched(
        jnp.asarray(np.stack([s["gated"] for s in scenarios])),
        jnp.asarray(np.stack([s["iou"] for s in scenarios])),
        jnp.asarray(
            np.minimum(np.stack([s["lvl_of"] for s in scenarios]), LVL_SENTINEL),
            jnp.int32,
        ),
        jnp.asarray(np.stack([s["tentative"] for s in scenarios]), jnp.int32),
        jnp.stack([_stable_rank(jnp.asarray(s["track_id"], jnp.int32)) for s in scenarios]),
        jnp.stack([_stable_rank(jnp.asarray(s["iou_order"], jnp.int32)) for s in scenarios]),
        jnp.asarray(np.stack([s["det_valid"] for s in scenarios]), jnp.int32),
        jnp.asarray(np.stack([s["det_order"] for s in scenarios]), jnp.int32),
        hp.max_dist, hp.max_iou_distance, max_age=hp.max_age, interpret=True,
    )
    return det_free, det_key, out_row


def _track_col_from_out_row(out_row, k):
    a = np.arange(k)
    tc = np.full(k, -1, np.int32)
    for j in a:
        if out_row[j] >= 0:
            tc[out_row[j]] = j
    return tc


@pytest.mark.parametrize("n_tracks,n_dets", [
    (0, 0), (0, 8), (8, 0), (6, 6), (12, 5), (5, 12), (20, 20), (30, 31),
])
def test_fused_cascade_matches_staged_xla(rng, n_tracks, n_dets):
    k, max_age = 32, 8
    hp = TrackerParams(capacity=k, max_age=max_age)
    scenarios = _random_scenario(
        np.random.default_rng(11 * n_tracks + n_dets), k, max_age,
        n_tracks, n_dets,
    )
    s = scenarios[0]
    want_free, want_col, want_key = map(np.asarray, _run_xla(s, hp))
    got_free, got_key, got_row = map(np.asarray, _run_kernel(scenarios, hp))
    np.testing.assert_array_equal(got_free[0], want_free)
    np.testing.assert_array_equal(got_key[0], want_key)
    np.testing.assert_array_equal(_track_col_from_out_row(got_row[0], k), want_col)


def test_fused_cascade_batched_classes(rng):
    """One grid launch for several classes == per-class staged XLA."""
    k, max_age = 32, 6
    hp = TrackerParams(capacity=k, max_age=max_age)
    g = np.random.default_rng(7)
    scenarios = _random_scenario(g, k, max_age, 14, 10, n_classes=4)
    got_free, got_key, got_row = map(np.asarray, _run_kernel(scenarios, hp))
    for c, s in enumerate(scenarios):
        want_free, want_col, want_key = map(np.asarray, _run_xla(s, hp))
        np.testing.assert_array_equal(got_free[c], want_free, err_msg=f"class {c}")
        np.testing.assert_array_equal(got_key[c], want_key, err_msg=f"class {c}")
        np.testing.assert_array_equal(
            _track_col_from_out_row(got_row[c], k), want_col, err_msg=f"class {c}"
        )


def test_fused_cascade_many_random(rng):
    k, max_age = 16, 5
    hp = TrackerParams(capacity=k, max_age=max_age)
    g = np.random.default_rng(123)
    for trial in range(20):
        nt = int(g.integers(0, k + 1))
        nd = int(g.integers(0, k + 1))
        s = _random_scenario(g, k, max_age, nt, nd,
                             clamp_frac=float(g.uniform(0, 0.9)),
                             tie_frac=float(g.uniform(0, 0.9)))[0]
        want_free, want_col, want_key = map(np.asarray, _run_xla(s, hp))
        got_free, got_key, got_row = map(np.asarray, _run_kernel([s], hp))
        np.testing.assert_array_equal(got_free[0], want_free, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got_key[0], want_key, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(
            _track_col_from_out_row(got_row[0], k), want_col, err_msg=f"trial {trial}"
        )


def test_tracker_fused_cascade_integration(rng):
    """Run the full single-class tracker over random frames twice — staged
    XLA vs forced fused kernel — and require identical states/outputs."""
    from vehicle_counting_tpu.tracking.tracker import (
        init_state, tracker_step,
    )

    hp = TrackerParams(capacity=16, feat_dim=8, budget=4, pending_cap=4,
                       max_age=4, n_init=2)
    g = np.random.default_rng(42)

    def run():
        st = init_state(hp)
        outs = []
        # FRESH jit wrapper per phase: the FORCE toggle is a trace-time
        # dispatch, and the shared tracker_step jit cache would otherwise
        # reuse the first phase's trace. A new jax.jit object has its own
        # cache, so each phase traces once under its own toggle — and the
        # 12 frames compile ONE program instead of 12 eager lax.cond
        # programs (the eager form also segfaulted XLA:CPU's compiler
        # deterministically after ~200 suite tests' worth of process state
        # — round 5; jitting sidesteps it and is ~10x faster).
        step = jax.jit(tracker_step.__wrapped__, static_argnames=("hp",))
        for _ in range(12):
            n = int(g.integers(0, 10))
            tlwh = np.zeros((16, 4), np.float32)
            tlwh[:n] = g.uniform(0, 80, size=(n, 4)).astype(np.float32)
            tlwh[:n, 2:] = g.uniform(5, 30, size=(n, 2))
            conf = np.zeros(16, np.float32)
            conf[:n] = g.uniform(0.3, 1, size=n)
            feat = g.normal(size=(16, 8)).astype(np.float32)
            valid = np.arange(16) < n
            st, out = step(
                st, jnp.asarray(tlwh), jnp.asarray(conf), jnp.asarray(feat),
                jnp.asarray(valid), hp=hp, width=jnp.int32(200),
                height=jnp.int32(200),
            )
            outs.append(jax.tree.map(np.asarray, out))
        return jax.tree.map(np.asarray, st), outs

    old = trk.FORCE_PALLAS_CASCADE
    try:
        trk.FORCE_PALLAS_CASCADE = False
        g = np.random.default_rng(42)
        st_x, outs_x = run()
        trk.FORCE_PALLAS_CASCADE = True
        g = np.random.default_rng(42)
        st_p, outs_p = run()
    finally:
        trk.FORCE_PALLAS_CASCADE = old

    jax.tree.map(np.testing.assert_array_equal, st_x, st_p)
    for a, b in zip(outs_x, outs_p):
        jax.tree.map(np.testing.assert_array_equal, a, b)
