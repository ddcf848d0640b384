"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>

Joins the multi-host runtime (CPU backend, 4 virtual devices per process),
runs the camera-sharded multicam batch step over the GLOBAL 8-device mesh
with this process feeding only its own cameras, then checks its local
slice of the outputs against a single-process per-camera oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=4"
).strip()

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main(coordinator: str, num_processes: int, pid: int) -> None:
    from vehicle_counting_tpu.parallel.mesh import (
        global_to_host_local,
        host_local_to_global,
        initialize_multihost,
        make_global_mesh,
    )

    initialize_multihost(coordinator, num_processes, pid)
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == 4
    n_global = len(jax.devices())

    from jax.sharding import PartitionSpec as P

    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
    from vehicle_counting_tpu.parallel.cameras import multicam_batch_step
    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

    mesh = make_global_mesh(("cam",))

    # identical replicated params on every process (same seed)
    ycfg = YoloConfig(variant="yolov5n", num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(2), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(3))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=8, budget=4, max_age=4, n_init=2),
        num_classes=2,
    )
    n_local = n_global // num_processes
    b, h, w = 2, 96, 96
    kw = dict(ycfg=ycfg, hp=hp, image_size=(96, 96), src_hw=(h, w), max_det=16)
    lut = np.concatenate(
        [np.arange(2, dtype=np.int32), np.full((78,), -1, np.int32)]
    )

    # this host's cameras: frames seeded by GLOBAL camera id
    local_frames = np.stack([
        np.random.default_rng(100 + pid * n_local + c)
        .integers(0, 255, (b, h, w, 3), np.uint8)
        for c in range(n_local)
    ])
    local_valid = np.ones((n_local, b), bool)
    states_one = init_states(hp)
    local_states = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (n_local,) + x.shape).copy(),
        states_one,
    )

    # host-local slices -> global sharded arrays (no DCN data movement)
    g_states = jax.tree.map(
        lambda x: host_local_to_global(mesh, P("cam"), x), local_states
    )
    g_frames = host_local_to_global(mesh, P("cam"), local_frames)
    g_valid = host_local_to_global(mesh, P("cam"), local_valid)

    new_states, touts = multicam_batch_step(
        mesh, yolo_params, reid_params, reid_stats,
        g_states, g_frames, g_valid, jnp.asarray(lut), **kw,
    )

    got_mask = global_to_host_local(touts.mask)
    got_ids = global_to_host_local(touts.ids)
    got_boxes = global_to_host_local(touts.boxes)

    # single-process oracle: each local camera through the plain batch step
    for c in range(n_local):
        st = jax.tree.map(lambda x: jnp.asarray(x[c]), local_states)
        _, _, want = pipeline_batch_step(
            yolo_params, reid_params, reid_stats, st,
            jnp.asarray(local_frames[c]), jnp.asarray(local_valid[c]),
            jnp.asarray(lut), **kw,
        )
        np.testing.assert_array_equal(got_mask[c], np.asarray(want.mask))
        np.testing.assert_array_equal(got_ids[c], np.asarray(want.ids))
        np.testing.assert_allclose(
            got_boxes[c], np.asarray(want.boxes), atol=1e-3
        )

    print(f"MULTIHOST OK pid={pid} local_cams={n_local} global_devices={n_global}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
