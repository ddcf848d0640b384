"""feat_dtype="bfloat16" gallery/pending storage.

On TPU the appearance einsum's default-precision f32 dot rounds both
operands to bf16 on the MXU, so storing the gallery pre-rounded is
bit-identical there while halving its HBM footprint and eliminating a
whole-buffer f32->bf16 conversion copy per frame (~36 us/frame at
[4,64,60,512] on v5e). These CPU tests prove the plumbing: buffers take the
requested dtype, every cast lands where it should, and track decisions
survive the bf16 rounding in a scenario with clear margins (appearance
costs far from MAX_DIST and from each other, like real embeddings).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states
from vehicle_counting_tpu.tracking.deepsort import deepsort_frame_core

H, W = 240, 320


def _drifting_frames(rng, n_frames, n_tracks, n_classes):
    """Persistent identities drifting slowly: steady-state tracking load."""
    cx = rng.uniform(40, W - 40, n_tracks)
    cy = rng.uniform(40, H - 40, n_tracks)
    bw = rng.uniform(20, 50, n_tracks)
    bh = rng.uniform(20, 50, n_tracks)
    cls = rng.integers(0, n_classes, n_tracks).astype(np.int32)
    base = rng.normal(size=(n_tracks, 32)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    out = []
    for _ in range(n_frames):
        cx = np.clip(cx + rng.normal(0, 2, n_tracks), 10, W - 10)
        cy = np.clip(cy + rng.normal(0, 2, n_tracks), 10, H - 10)
        boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        feats = base + rng.normal(0, 0.02, base.shape).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        scores = rng.uniform(0.5, 0.95, n_tracks).astype(np.float32)
        out.append((boxes.astype(np.float32), scores, feats))
    return cls, out


@pytest.mark.parametrize("mode", ["scan", "batched"])
def test_bf16_storage_matches_f32_decisions(mode):
    rng = np.random.default_rng(3)
    n_tracks, n_classes, n_frames = 12, 3, 10
    cls, frames = _drifting_frames(rng, n_frames, n_tracks, n_classes)
    mk = lambda fd: DeepSortParams(
        tracker=TrackerParams(capacity=16, feat_dim=32, budget=6,
                              pending_cap=4, max_age=4, n_init=2,
                              feat_dtype=fd),
        num_classes=n_classes, class_mode=mode,
    )
    hp32, hp16 = mk("float32"), mk("bfloat16")

    st32, st16 = init_states(hp32), init_states(hp16)
    assert st16.gallery.dtype == jnp.bfloat16
    assert st32.gallery.dtype == jnp.float32

    core = jax.jit(deepsort_frame_core, static_argnames=("hp", "out_hw"))
    valid = jnp.ones((n_tracks,), bool)
    for t, (boxes, scores, feats) in enumerate(frames):
        args = (jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(cls), valid)
        st32, out32 = core(st32, *args, hp=hp32, out_hw=(H, W))
        st16, out16 = core(st16, *args, hp=hp16, out_hw=(H, W))
        assert st16.gallery.dtype == jnp.bfloat16, f"frame {t} dtype drifted"
        for name in out32._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(out32, name)),
                np.asarray(getattr(out16, name)),
                err_msg=f"frame {t} output {name}",
            )
    # the bf16 gallery holds the same features up to storage rounding
    np.testing.assert_allclose(
        np.asarray(st16.gallery, np.float32), np.asarray(st32.gallery),
        atol=0.01,
    )
