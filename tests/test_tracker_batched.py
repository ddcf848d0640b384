"""class_mode="batched" must be bit-identical to the sequential class scan.

The batched path vmaps tracker_step over the class axis (grid-batched
Hungarian launches, lifecycle math as [C, ...] ops); the scan path executes
classes sequentially with cond skips. They are the same math — any
divergence is a real bug (vmap select vs cond semantics, solver batching
rule, masked-update ordering).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states
from vehicle_counting_tpu.tracking.deepsort import deepsort_frame_core

H, W = 240, 320


def _random_frames(rng, n_frames, n_det, n_classes, crowd=0.6, absent_p=0.3):
    """Per-frame (boxes, scores, classes, valid) with churn + absent classes."""
    frames = []
    for _ in range(n_frames):
        cx = rng.uniform(20, W - 20, n_det)
        cy = rng.uniform(20, H - 20, n_det)
        bw = rng.uniform(10, 60, n_det)
        bh = rng.uniform(10, 60, n_det)
        boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        scores = rng.uniform(0.1, 0.95, n_det)  # some below min_confidence
        classes = rng.integers(0, n_classes, n_det)
        valid = rng.uniform(size=n_det) < crowd
        # whole classes absent some frames (exercises the present-skip quirk)
        for c in range(n_classes):
            if rng.uniform() < absent_p:
                valid &= classes != c
        frames.append(
            (
                boxes.astype(np.float32),
                scores.astype(np.float32),
                classes.astype(np.int32),
                valid,
            )
        )
    return frames


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_matches_scan(seed):
    rng = np.random.default_rng(seed)
    n_det, n_classes, n_frames = 24, 3, 12
    tp = TrackerParams(capacity=16, feat_dim=32, budget=6, pending_cap=4,
                       max_age=4, n_init=2)
    hp_scan = DeepSortParams(tracker=tp, num_classes=n_classes, class_mode="scan")
    hp_bat = DeepSortParams(tracker=tp, num_classes=n_classes, class_mode="batched")

    frames = _random_frames(rng, n_frames, n_det, n_classes)
    feats = rng.normal(size=(n_frames, n_det, tp.feat_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    core = jax.jit(deepsort_frame_core, static_argnames=("hp", "out_hw"))

    st_a = init_states(hp_scan)
    st_b = init_states(hp_bat)
    for t, (boxes, scores, classes, valid) in enumerate(frames):
        args = (
            jnp.asarray(feats[t]),
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(classes),
            jnp.asarray(valid),
        )
        st_a, out_a = core(st_a, *args, hp=hp_scan, out_hw=(H, W))
        st_b, out_b = core(st_b, *args, hp=hp_bat, out_hw=(H, W))

        for name in out_a._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(out_a, name)),
                np.asarray(getattr(out_b, name)),
                err_msg=f"frame {t} output {name}",
            )
        for leaf_a, leaf_b, path in zip(
            jax.tree.leaves(st_a), jax.tree.leaves(st_b),
            jax.tree_util.tree_leaves_with_path(st_a._asdict()),
        ):
            np.testing.assert_array_equal(
                np.asarray(leaf_a), np.asarray(leaf_b),
                err_msg=f"frame {t} state {path[0]}",
            )
