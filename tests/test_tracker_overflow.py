"""Capacity-edge behavior: more detections than track slots."""

import numpy as np

import jax.numpy as jnp

from vehicle_counting_tpu.tracking import TrackerParams, init_state, tracker_step


def test_capacity_overflow_counts_and_survives(rng):
    hp = TrackerParams(capacity=8, feat_dim=8, budget=4, pending_cap=8,
                       max_dist=0.3, max_iou_distance=0.6, max_age=4, n_init=2)
    state = init_state(hp)
    k = hp.capacity
    # 8 detections fill all slots
    boxes = np.zeros((k, 4), np.float32)
    for i in range(k):
        boxes[i] = [i * 70, 0, i * 70 + 50, 50]
    tlwh = jnp.asarray(np.concatenate([boxes[:, :2], boxes[:, 2:] - boxes[:, :2]], 1))
    conf = jnp.full((k,), 0.9, jnp.float32)
    feats = jnp.asarray(np.eye(k, 8, dtype=np.float32))
    valid = jnp.ones((k,), bool)
    state, _ = tracker_step(state, tlwh, conf, feats, valid, hp, jnp.int32(640), jnp.int32(480))
    assert int(np.asarray(state.next_id)) == k + 1
    assert int(np.asarray(state.overflow)) == 0

    # next frame: 8 existing objects match, but jitter one away and add noise
    # such that all 8 slots stay occupied and new dets cannot initiate
    boxes2 = boxes.copy() + 2.0
    state2, out = tracker_step(
        state, jnp.asarray(np.concatenate([boxes2[:, :2], boxes2[:, 2:] - boxes2[:, :2]], 1)),
        conf, feats, valid, hp, jnp.int32(640), jnp.int32(480),
    )
    assert int(np.asarray(state2.overflow)) == 0  # all matched, no births

    # force overflow: full slots + unmatched far-away detections
    far = boxes.copy()
    far[:, 0] += 3000  # nothing overlaps, features orthogonal to galleries
    feats_far = jnp.asarray(np.eye(k, 8, k=0, dtype=np.float32)[::-1].copy())
    state3, _ = tracker_step(
        state2, jnp.asarray(np.concatenate([far[:, :2], far[:, 2:] - far[:, :2]], 1)),
        conf, feats_far, valid, hp, jnp.int32(640), jnp.int32(480),
    )
    # every slot was tentative->still alive or matched; new dets have nowhere
    # to go once free slots are exhausted: overflow must count the drops
    assert int(np.asarray(state3.overflow)) >= 1
    # state stays finite and usable
    assert np.isfinite(np.asarray(state3.mean)).all()
