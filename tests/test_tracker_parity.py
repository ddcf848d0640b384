"""Frame-by-frame parity: vectorized JAX tracker vs the NumPy oracle.

Scenario generator scripts several objects with jittered boxes, detection
dropouts (exercising cascade levels > 0 and the IoU stage), births and
deaths. Both trackers consume identical (boxes, scores, features) streams;
track ids and output boxes must agree every frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.ops.boxes import xyxy_to_tlwh
from vehicle_counting_tpu.ops.nms import sort_nms_mask
from vehicle_counting_tpu.tracking import TrackerParams, init_state, tracker_step

from oracle_deepsort import OracleDeepSort


def pick_order_rank(s, valid):
    """Rank of each det in the reference's NMS pick order (desc score,
    ties -> higher index); the detection-list order downstream."""
    n = s.shape[0]
    sc = jnp.where(valid, s, -jnp.inf)
    order = (n - 1) - jnp.argsort(-sc[::-1], stable=True)
    return jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

K = 16
HP = TrackerParams(
    capacity=K,
    feat_dim=32,
    budget=10,
    pending_cap=8,
    max_dist=0.25,
    max_iou_distance=0.6,
    max_age=8,
    n_init=3,
)
FRAME_HW = (480, 640)
MIN_CONF = 0.25
NMS_OVERLAP = 0.5


def jax_step(state, boxes_xyxy, confs, feats):
    """Facade-equivalent single-class step: conf filter + SORT NMS + tracker."""
    n = len(boxes_xyxy)
    b = np.zeros((K, 4), np.float32)
    s = np.zeros((K,), np.float32)
    f = np.zeros((K, HP.feat_dim), np.float32)
    v = np.zeros((K,), bool)
    m = min(n, K)
    b[:m] = boxes_xyxy[:m]
    s[:m] = confs[:m]
    f[:m] = feats[:m]
    v[:m] = True

    tlwh = xyxy_to_tlwh(jnp.asarray(b))
    present = jnp.asarray(v).any()  # raw per-class presence, pre conf-filter
    valid = jnp.asarray(v) & (jnp.asarray(s) > MIN_CONF)
    keep = sort_nms_mask(tlwh, jnp.asarray(s), valid, NMS_OVERLAP)
    valid = valid & keep
    det_order = pick_order_rank(jnp.asarray(s), valid)
    state, out = tracker_step(
        state, tlwh, jnp.asarray(s), jnp.asarray(f), valid, HP,
        jnp.int32(FRAME_HW[1]), jnp.int32(FRAME_HW[0]), present=present,
        det_order=det_order,
    )
    mask = np.asarray(out.mask)
    rows = []
    for i in np.where(mask)[0]:
        rows.append(
            (int(np.asarray(out.ids)[i]),) + tuple(int(x) for x in np.asarray(out.boxes)[i])
        )
    return state, sorted(rows)


class Scenario:
    """Objects moving linearly, with per-frame jitter/dropout and lifetimes."""

    def __init__(self, rng, num_objects=5, frames=40):
        self.rng = rng
        self.frames = frames
        self.objs = []
        for i in range(num_objects):
            start = rng.integers(0, frames // 2)
            self.objs.append(
                {
                    "pos": rng.uniform(60, 400, 2),
                    "vel": rng.uniform(-6, 6, 2),
                    "size": rng.uniform(30, 80, 2),
                    "feat": self._unit(rng.normal(size=HP.feat_dim)),
                    "start": int(start),
                    "end": int(start + rng.integers(12, frames)),
                }
            )

    @staticmethod
    def _unit(v):
        return (v / np.linalg.norm(v)).astype(np.float32)

    def frame(self, t, dropout=0.15):
        boxes, confs, feats = [], [], []
        for o in self.objs:
            if not (o["start"] <= t < o["end"]):
                continue
            if self.rng.uniform() < dropout:
                continue
            c = o["pos"] + o["vel"] * (t - o["start"]) + self.rng.normal(0, 1.5, 2)
            sz = o["size"] * self.rng.uniform(0.95, 1.05)
            boxes.append([c[0] - sz[0] / 2, c[1] - sz[1] / 2, c[0] + sz[0] / 2, c[1] + sz[1] / 2])
            confs.append(float(self.rng.uniform(0.4, 0.95)))
            feats.append(self._unit(o["feat"] + self.rng.normal(0, 0.08, HP.feat_dim)))
        # occasional low-conf clutter (filtered by MIN_CONF)
        if self.rng.uniform() < 0.2:
            x, y = self.rng.uniform(50, 500, 2)
            boxes.append([x, y, x + 40, y + 40])
            confs.append(float(self.rng.uniform(0.05, 0.2)))
            feats.append(self._unit(self.rng.normal(size=HP.feat_dim)))
        if not boxes:
            return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                    np.zeros((0, HP.feat_dim), np.float32))
        return (np.asarray(boxes, np.float32), np.asarray(confs, np.float32),
                np.asarray(feats, np.float32))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("dropout", [0.15, 0.35])
def test_full_parity_with_oracle(seed, dropout):
    rng = np.random.default_rng(seed)
    scen = Scenario(rng, num_objects=5, frames=40)
    scen_dropout = dropout

    oracle = OracleDeepSort(
        max_dist=HP.max_dist,
        min_confidence=MIN_CONF,
        nms_max_overlap=NMS_OVERLAP,
        max_iou_distance=HP.max_iou_distance,
        max_age=HP.max_age,
        n_init=HP.n_init,
        nn_budget=HP.budget,
    )
    state = init_state(HP)

    for t in range(scen.frames):
        boxes, confs, feats = scen.frame(t, dropout=scen_dropout)
        if len(boxes) == 0:
            continue  # pipeline skips empty frames (modules/__init__.py:68-69)
        want = oracle.update(boxes.copy(), confs.copy(), feats.copy(), FRAME_HW)
        want_rows = sorted((int(r[4]),) + tuple(int(v) for v in r[:4]) for r in want)
        state, got_rows = jax_step(state, boxes, confs, feats)

        assert [r[0] for r in got_rows] == [r[0] for r in want_rows], (
            f"frame {t}: ids diverged: {got_rows} vs {want_rows}"
        )
        for g, w in zip(got_rows, want_rows):
            assert max(abs(a - b) for a, b in zip(g[1:], w[1:])) <= 1, (
                f"frame {t}: box mismatch {g} vs {w}"
            )


def test_empty_frame_is_noop():
    state = init_state(HP)
    # one detection to create a track
    boxes = np.array([[100, 100, 150, 160]], np.float32)
    state, _ = jax_step(state, boxes, np.array([0.9], np.float32),
                        np.ones((1, HP.feat_dim), np.float32) / np.sqrt(HP.feat_dim))
    age0 = int(np.asarray(state.age)[0])
    tsu0 = int(np.asarray(state.tsu)[0])
    # empty frame: nothing ages
    state2, out = jax_step(state, np.zeros((0, 4), np.float32),
                           np.zeros(0, np.float32), np.zeros((0, HP.feat_dim), np.float32))
    assert int(np.asarray(state2.age)[0]) == age0
    assert int(np.asarray(state2.tsu)[0]) == tsu0
    assert out == []


def test_track_ids_assigned_in_detection_order():
    state = init_state(HP)
    boxes = np.array(
        [[10, 10, 50, 60], [200, 200, 260, 280], [400, 100, 460, 180]], np.float32
    )
    confs = np.array([0.9, 0.8, 0.7], np.float32)
    feats = np.eye(3, HP.feat_dim, dtype=np.float32)
    for _ in range(HP.n_init):
        state, out = jax_step(state, boxes, confs, feats)
    ids = sorted(r[0] for r in out)
    assert ids == [1, 2, 3]
    # slot order: first detection got id 1
    tid = np.asarray(state.track_id)
    st = np.asarray(state.state)
    assert tid[st > 0].tolist() == [1, 2, 3]
