"""Pallas per-crop DMA gather kernel vs the XLA gather path: array-equal.

The kernel (ops/pallas/crops.py) reproduces gather_crops_batch
(ops/crops.py) bit-for-bit: same f32 tap coordinates, same one-hot column
weights in the same compute dtype, <=2-term f32 accumulations (order
invariant), same vertical f32 mix and normalization. These CPU tests run
the kernel in interpret mode against the XLA reference on adversarial box
sets (clamped edges, tiny boxes, tall crops spanning both band tiers,
out-of-frame boxes, invalid rows).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.ops.crops import gather_crops_batch
from vehicle_counting_tpu.ops.pallas.crops import (
    T_SMALL,
    gather_crops_batch_pallas,
)


def _planar(frames):
    return jnp.transpose(frames, (0, 3, 1, 2))


def _random_boxes(rng, n, h, w):
    cx = rng.uniform(-30, w + 30, n)
    cy = rng.uniform(-30, h + 30, n)
    bw = rng.uniform(2, w, n)
    bh = rng.uniform(2, h, n)
    return np.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1
    ).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_xla_random(seed):
    rng = np.random.default_rng(seed)
    b, h, w, n = 3, 160, 256, 24
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    boxes = jnp.asarray(_random_boxes(rng, n, h, w))
    fidx = jnp.asarray(rng.integers(0, b, n), jnp.int32)
    valid = jnp.asarray(rng.random(n) > 0.2)

    ref = gather_crops_batch(frames, fidx, boxes, valid)
    out = gather_crops_batch_pallas(
        _planar(frames), fidx, boxes, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_kernel_matches_xla_edge_cases():
    h, w = 200, 320
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        [
            [0.0, 0.0, float(w), float(h)],          # whole frame (big tier)
            [5.0, 5.0, 6.0, 6.0],                    # 1x1 crop (full clamp)
            [-50.0, -50.0, 10.0, 10.0],              # clipped at origin
            [w - 3.0, h - 3.0, w + 40.0, h + 40.0],  # clipped at far edge
            [30.0, 10.0, 31.5, 190.0],               # tall sliver (big tier)
            [10.0, 60.0, 310.0, 62.0],               # wide sliver
            [400.0, 400.0, 500.0, 500.0],            # fully outside
            [12.25, 33.75, 95.5, 121.125],           # fractional coords
        ],
        jnp.float32,
    )
    n = boxes.shape[0]
    fidx = jnp.asarray([0, 1] * (n // 2), jnp.int32)
    valid = jnp.ones((n,), bool)

    ref = gather_crops_batch(frames, fidx, boxes, valid)
    out = gather_crops_batch_pallas(
        _planar(frames), fidx, boxes, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tier_boundary_heights():
    """Crop heights straddling the small-band threshold take both tiers."""
    h, w = 400, 256
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8))
    heights = [T_SMALL - 9, T_SMALL - 8, T_SMALL - 7, T_SMALL, T_SMALL + 40]
    boxes = jnp.asarray(
        [[20.0, 50.0, 120.0, 50.0 + float(hh)] for hh in heights], jnp.float32
    )
    n = boxes.shape[0]
    fidx = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), bool)

    ref = gather_crops_batch(frames, fidx, boxes, valid)
    out = gather_crops_batch_pallas(
        _planar(frames), fidx, boxes, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_embed_path_kernel_vs_xla():
    """embed_detections_batch produces identical features on both paths."""
    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams
    from vehicle_counting_tpu.tracking import deepsort as ds

    rng = np.random.default_rng(5)
    b, h, w, n = 2, 128, 192, 8
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    boxes = jnp.asarray(_random_boxes(rng, b * n, h, w)).reshape(b, n, 4)
    valid = jnp.asarray(rng.random((b, n)) > 0.3)
    params, stats = init_reid(jax.random.PRNGKey(0))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=8, feat_dim=512), num_classes=2,
        max_embed=8,
    )

    old = ds.FORCE_PALLAS_CROPS
    try:
        ds.FORCE_PALLAS_CROPS = False
        ref = ds.embed_detections_batch(
            frames, boxes, valid, params, stats, hp
        )
        ds.FORCE_PALLAS_CROPS = True
        out = ds.embed_detections_batch(
            frames, boxes, valid, params, stats, hp
        )
    finally:
        ds.FORCE_PALLAS_CROPS = old
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
