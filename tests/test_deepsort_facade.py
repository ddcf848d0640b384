"""Multi-class facade: crops -> ReID -> per-class trackers in one jitted step."""

import numpy as np

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import init_reid
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, deepsort_frame, init_states

HP = DeepSortParams(
    tracker=TrackerParams(capacity=8, feat_dim=512, budget=6, pending_cap=8,
                          max_dist=0.5, max_iou_distance=0.7, max_age=5, n_init=2),
    num_classes=3,
    min_confidence=0.25,
    nms_max_overlap=0.5,
)


def test_deepsort_frame_end_to_end(rng):
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(0))
    states = init_states(HP)
    frame = rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8)

    n = 8
    boxes = np.zeros((n, 4), np.float32)
    scores = np.zeros((n,), np.float32)
    classes = np.zeros((n,), np.int32)
    valid = np.zeros((n,), bool)
    # class 0: one object; class 2: one object; class 1: nothing
    boxes[0] = [40, 40, 90, 110]
    boxes[1] = [200, 100, 260, 180]
    scores[:2] = [0.9, 0.8]
    classes[:2] = [0, 2]
    valid[:2] = True

    for step in range(3):
        jitter = rng.normal(0, 1, size=(2, 4)).astype(np.float32)
        b = boxes.copy()
        b[:2] += jitter
        states, out = deepsort_frame(
            states, jnp.asarray(frame), jnp.asarray(b), jnp.asarray(scores),
            jnp.asarray(classes), jnp.asarray(valid), reid_params, reid_stats, HP,
        )

    mask = np.asarray(out.mask)  # [C, K]
    ids = np.asarray(out.ids)
    assert mask[0].sum() == 1 and mask[2].sum() == 1 and mask[1].sum() == 0
    # per-class trackers have independent id spaces, both starting at 1
    assert ids[0][mask[0]][0] == 1
    assert ids[2][mask[2]][0] == 1
    # class 1 tracker never advanced
    assert int(np.asarray(states.next_id)[1]) == 1
    # boxes land near the detections
    b0 = np.asarray(out.boxes)[0][mask[0]][0]
    assert abs(b0[0] - 40) < 15 and abs(b0[1] - 40) < 15


def test_low_conf_still_advances_class(rng):
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(0))
    states = init_states(HP)
    frame = rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8)
    n = 4
    boxes = np.zeros((n, 4), np.float32)
    boxes[0] = [40, 40, 90, 110]
    scores = np.array([0.9, 0, 0, 0], np.float32)
    classes = np.zeros((n,), np.int32)
    valid = np.array([True, False, False, False])

    for _ in range(2):
        states, out = deepsort_frame(
            states, jnp.asarray(frame), jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(classes), jnp.asarray(valid), reid_params, reid_stats, HP,
        )
    assert int(np.asarray(states.tsu)[0][0]) == 0  # matched track, class 0

    # now a low-conf detection only: tracker must ADVANCE (tsu -> 1) but not match
    scores2 = np.array([0.1, 0, 0, 0], np.float32)
    states, out = deepsort_frame(
        states, jnp.asarray(frame), jnp.asarray(boxes), jnp.asarray(scores2),
        jnp.asarray(classes), jnp.asarray(valid), reid_params, reid_stats, HP,
    )
    assert int(np.asarray(states.tsu)[0][0]) == 1
    # confirmed track still output at tsu == 1
    assert np.asarray(out.mask)[0].sum() == 1
