"""Crowded-scene ReID embedding: every valid detection gets real features.

Round-1 defect (VERDICT weak-4): detections beyond the first 64 valid got
zero features (cosine cost ~1 to everything) — a parity break vs the
reference, which embeds ALL crops (deep_sort.py:119-129). Now the embed is
chunked (hp.max_embed crops per CNN forward) with no truncation; these tests
pin that for single-frame and batch-global paths, at >100 detections/frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import init_reid, reid_forward
from vehicle_counting_tpu.ops.crops import gather_crops
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams
from vehicle_counting_tpu.tracking.deepsort import (
    embed_detections,
    embed_detections_batch,
)


@pytest.fixture(scope="module")
def reid():
    return init_reid(jax.random.PRNGKey(7))


def _random_dets(rng, n, h, w):
    x1 = rng.uniform(0, w - 30, n).astype(np.float32)
    y1 = rng.uniform(0, h - 30, n).astype(np.float32)
    bw = rng.uniform(8, 60, n).astype(np.float32)
    bh = rng.uniform(8, 60, n).astype(np.float32)
    return np.stack([x1, y1, np.minimum(x1 + bw, w - 1), np.minimum(y1 + bh, h - 1)], 1)


def test_all_valid_dets_embedded_beyond_chunk(rng, reid):
    """150 valid dets, chunk=64: dets 65..150 must get REAL features equal to
    a direct (unchunked) reid_forward on their own crops."""
    reid_params, reid_stats = reid
    h, w, n = 240, 320, 200
    frame = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    boxes = _random_dets(rng, n, h, w)
    valid = np.zeros(n, bool)
    valid[rng.choice(n, 150, replace=False)] = True

    hp = DeepSortParams(tracker=TrackerParams(), num_classes=4, max_embed=64)
    feats = np.asarray(
        embed_detections(frame, jnp.asarray(boxes), jnp.asarray(valid),
                         reid_params, reid_stats, hp)
    )

    # oracle: every valid crop through one big forward
    crops = gather_crops(frame, jnp.asarray(boxes), jnp.asarray(valid))
    ref, _ = reid_forward(reid_params, reid_stats, crops, train=False, reid=True)
    ref = np.asarray(ref)

    norms = np.linalg.norm(feats, axis=1)
    assert (norms[valid] > 0.99).all(), "some valid det got zero features"
    assert (norms[~valid] == 0).all()
    np.testing.assert_allclose(feats[valid], ref[valid], rtol=0, atol=2e-5)


def test_batch_embed_matches_per_frame(rng, reid):
    """Batch-global chunk stream == per-frame embedding, incl. a crowded frame."""
    reid_params, reid_stats = reid
    b, h, w, n = 3, 120, 160, 96
    frames = rng.integers(0, 255, (b, h, w, 3), np.uint8)
    boxes = np.stack([_random_dets(rng, n, h, w) for _ in range(b)])
    valid = np.zeros((b, n), bool)
    valid[0, :90] = True      # crowded
    valid[1, :3] = True       # sparse
    # frame 2: nothing valid

    hp = DeepSortParams(tracker=TrackerParams(), num_classes=4, max_embed=32)
    batch = np.asarray(
        embed_detections_batch(
            jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray(valid),
            reid_params, reid_stats, hp,
        )
    )
    for i in range(b):
        single = np.asarray(
            embed_detections(
                jnp.asarray(frames[i]), jnp.asarray(boxes[i]), jnp.asarray(valid[i]),
                reid_params, reid_stats, hp,
            )
        )
        np.testing.assert_allclose(batch[i], single, rtol=0, atol=2e-5)


def test_crop_transform_applied_in_batch(rng, reid):
    """letterbox crop_gain/crop_pad path agrees between batch and single."""
    reid_params, reid_stats = reid
    h, w, n = 100, 140, 8
    frames = rng.integers(0, 255, (2, h, w, 3), np.uint8)
    boxes = np.stack([_random_dets(rng, n, 160, 200) for _ in range(2)])
    valid = np.ones((2, n), bool)
    hp = DeepSortParams(tracker=TrackerParams(), num_classes=4, max_embed=4)
    kw = dict(crop_gain=0.5, crop_pad=(10.0, 5.0))
    batch = np.asarray(
        embed_detections_batch(
            jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray(valid),
            reid_params, reid_stats, hp, **kw,
        )
    )
    for i in range(2):
        single = np.asarray(
            embed_detections(
                jnp.asarray(frames[i]), jnp.asarray(boxes[i]), jnp.asarray(valid[i]),
                reid_params, reid_stats, hp, **kw,
            )
        )
        np.testing.assert_allclose(batch[i], single, rtol=0, atol=2e-5)
