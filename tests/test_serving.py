"""AOT serving artifacts: export -> serialize -> load -> call parity.

The exported StableHLO program must reproduce the live jitted step
bit-exactly (same trace, same lowering), survive a disk round-trip with
integrity checks, and rebuild its tracker state / class LUT / weights from
the manifest alone — that's the whole deployment contract of
vehicle_counting_tpu.serving (the reference has no equivalent; it re-traces
torch modules per process, /root/reference/networks/yolo.py:58).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import init_reid
from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
from vehicle_counting_tpu.ops.letterbox import host_letterbox_yuv420
from vehicle_counting_tpu.serving import (
    ServingArtifact,
    export_detect_step,
    export_pipeline_step,
    load_weights_bundle,
    save_artifact,
    save_weights_bundle,
    serving_frames_shape,
)
from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

SRC_HW = (80, 160)
NET_HW = (96, 96)  # square test geometry (content_upload_exact holds)
BATCH = 2


@pytest.fixture(scope="module")
def tiny():
    ycfg = YoloConfig(variant="yolov5n", num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(0), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=8, budget=4, max_age=4, n_init=2),
        num_classes=2,
    )
    lut = np.full((80,), -1, np.int32)
    lut[:2] = [0, 1]
    return ycfg, yolo_params, reid_params, reid_stats, hp, jnp.asarray(lut)


def _frames(rng, n=BATCH):
    frames = rng.integers(0, 255, (n, *SRC_HW, 3), np.uint8)
    return jnp.asarray(host_letterbox_yuv420(frames, NET_HW, content_only=True))


def test_weights_bundle_roundtrip(tiny, tmp_path):
    ycfg, yolo_params, reid_params, reid_stats, hp, lut = tiny
    path = str(tmp_path / "w.npz")
    save_weights_bundle(path, {"yolo": yolo_params, "reid": reid_params,
                               "reid_stats": reid_stats})
    back = load_weights_bundle(path)
    for name, orig in [("yolo", yolo_params), ("reid", reid_params),
                       ("reid_stats", reid_stats)]:
        got = back[name]
        assert jax.tree.structure(jax.tree.map(np.asarray, orig)) == jax.tree.structure(got)
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_pipeline_step_export_matches_live(tiny, tmp_path, rng):
    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step

    ycfg, yolo_params, reid_params, reid_stats, hp, lut = tiny
    kw = dict(ycfg=ycfg, hp=hp, image_size=NET_HW, src_hw=SRC_HW,
              conf_thres=0.0, max_det=16, frames_format="letterboxed_yuv420")
    exp = export_pipeline_step(
        yolo_params, reid_params, reid_stats, batch=BATCH,
        conf_thres=0.0, max_det=16, ycfg=ycfg, hp=hp,
        image_size=NET_HW, src_hw=SRC_HW,
    )
    art_dir = save_artifact(
        str(tmp_path / "art"), exported={"pipeline_step": exp}, ycfg=ycfg,
        hp=hp, class_lut=np.asarray(lut),
        config={"batch": BATCH, "src_hw": list(SRC_HW),
                "image_size": list(NET_HW),
                "frames_format": "letterboxed_yuv420"},
        weights={"yolo": yolo_params, "reid": reid_params,
                 "reid_stats": reid_stats},
    )
    art = ServingArtifact.load(art_dir)

    frames = _frames(rng)
    valid = jnp.ones((BATCH,), bool)
    s0 = init_states(hp)

    # live jitted step (reference of truth)
    s_live, det_live, t_live = pipeline_batch_step(
        yolo_params, reid_params, reid_stats, s0, frames, valid, lut, **kw)
    # exported program, via the self-contained closure (bundled weights+lut)
    step = art.bound_pipeline_step()
    s_art, det_art, t_art = step(art.init_states(), frames, valid)

    for a, b in zip(jax.tree.leaves(det_live), jax.tree.leaves(det_art)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t_live), jax.tree.leaves(t_art)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # states chain across calls (second step stays in lockstep too)
    frames2 = _frames(rng)
    s_live2, det_live2, t_live2 = pipeline_batch_step(
        yolo_params, reid_params, reid_stats, s_live, frames2, valid, lut, **kw)
    s_art2, det_art2, t_art2 = step(s_art, frames2, valid)
    for a, b in zip(jax.tree.leaves(t_live2), jax.tree.leaves(t_art2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_live2), jax.tree.leaves(s_art2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # manifest sanity
    m = art.manifest
    assert m["functions"]["pipeline_step"]["platforms"] == ["cpu"]
    assert m["functions"]["pipeline_step"]["nr_devices"] == 1
    assert art.ycfg.variant == "yolov5n"
    assert art.hp == hp
    np.testing.assert_array_equal(np.asarray(art.class_lut()), np.asarray(lut))


def test_detect_step_export_matches_live(tiny, tmp_path, rng):
    from vehicle_counting_tpu.pipeline.step import detect_only_step

    ycfg, yolo_params, _, _, hp, _ = tiny
    exp = export_detect_step(
        yolo_params, ycfg=ycfg, batch=BATCH, image_size=NET_HW, src_hw=SRC_HW,
        conf_thres=0.0, max_det=16,
    )
    art_dir = save_artifact(
        str(tmp_path / "det"), exported={"detect_step": exp}, ycfg=ycfg,
        config={"batch": BATCH, "src_hw": list(SRC_HW),
                "image_size": list(NET_HW)},
        weights={"yolo": yolo_params},
    )
    art = ServingArtifact.load(art_dir)
    frames = _frames(rng)
    det_live = detect_only_step(
        yolo_params, frames, ycfg=ycfg, image_size=NET_HW, src_hw=SRC_HW,
        conf_thres=0.0, max_det=16, content_only=True)
    det_art = art.detect_step(art.load_weights()["yolo"], frames)
    for a, b in zip(jax.tree.leaves(det_live), jax.tree.leaves(det_art)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="no tracker config"):
        art.hp


def test_artifact_integrity_and_version_checks(tiny, tmp_path):
    ycfg, yolo_params, _, _, hp, _ = tiny
    exp = export_detect_step(
        yolo_params, ycfg=ycfg, batch=1, image_size=NET_HW, src_hw=SRC_HW,
        max_det=16,
    )
    art_dir = save_artifact(str(tmp_path / "a"), exported={"detect_step": exp},
                            ycfg=ycfg, config={})
    # corrupt the serialized program -> sha256 must catch it
    bin_path = os.path.join(art_dir, "detect_step.bin")
    blob = bytearray(open(bin_path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(bin_path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sha256"):
        ServingArtifact.load(art_dir)

    # a future format version must refuse to load
    man_path = os.path.join(art_dir, "manifest.json")
    man = json.load(open(man_path))
    man["format_version"] = 999
    json.dump(man, open(man_path, "w"))
    with pytest.raises(ValueError, match="newer"):
        ServingArtifact.load(art_dir)


def test_serving_frames_shape_contract():
    # 720p flagship: content-row I420 at the AutoShape geometry
    assert serving_frames_shape("letterboxed_yuv420", 128, (720, 1280),
                                (384, 640)) == (128, 540, 640)
    assert serving_frames_shape("raw_rgb", 4, (720, 1280), (384, 640)) == (
        4, 720, 1280, 3)
    assert serving_frames_shape("letterboxed_rgb", 4, (720, 1280),
                                (384, 640)) == (4, 384, 640, 3)
    with pytest.raises(ValueError):
        serving_frames_shape("nope", 1, SRC_HW, NET_HW)


def test_multicam_export_roundtrip(tiny, tmp_path, rng):
    """The camera-sharded multi-chip step survives serialize -> deserialize
    and reproduces the live shard_map program on a 4-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vehicle_counting_tpu.parallel.cameras import multicam_batch_step
    from vehicle_counting_tpu.serving import export_multicam_step

    ycfg, yolo_params, reid_params, reid_stats, hp, lut = tiny
    ncam, b = 4, 2
    devs = jax.devices()[:4]
    kw = dict(ycfg=ycfg, hp=hp, image_size=NET_HW, src_hw=SRC_HW,
              conf_thres=0.0, max_det=16, frames_format="letterboxed_yuv420")
    exp = export_multicam_step(
        yolo_params, reid_params, reid_stats, n_cameras=ncam, batch=b,
        devices=devs, **kw)
    exp2 = jax.export.deserialize(exp.serialize())
    assert exp2.nr_devices == 4

    mesh = Mesh(np.array(devs), ("cam",))
    cam_s = NamedSharding(mesh, P("cam"))
    repl = NamedSharding(mesh, P())
    frames = np.stack([np.asarray(_frames(rng, b)) for _ in range(ncam)])
    valid = np.ones((ncam, b), bool)
    states = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (ncam,) + x.shape).copy(),
        init_states(hp))

    live_states, live_touts = multicam_batch_step(
        mesh, yolo_params, reid_params, reid_stats,
        jax.device_put(states, cam_s), jax.device_put(frames, cam_s),
        jax.device_put(valid, cam_s), lut, **kw)

    got_states, got_touts = exp2.call(
        jax.device_put(yolo_params, repl), jax.device_put(reid_params, repl),
        jax.device_put(reid_stats, repl), jax.device_put(lut, repl),
        jax.device_put(states, cam_s), jax.device_put(frames, cam_s),
        jax.device_put(valid, cam_s))

    for a, c in zip(jax.tree.leaves(live_touts), jax.tree.leaves(got_touts)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree.leaves(live_states), jax.tree.leaves(got_states)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_framedp_export_roundtrip(tiny, tmp_path, rng):
    """The frame-parallel single-camera step survives serialize ->
    deserialize and reproduces the live shard_map program on a 4-device
    mesh (mirror of test_multicam_export_roundtrip for parallel/frames.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vehicle_counting_tpu.parallel.frames import make_framedp_step
    from vehicle_counting_tpu.serving import export_framedp_step

    ycfg, yolo_params, reid_params, reid_stats, hp, lut = tiny
    b = 4
    devs = jax.devices()[:4]
    kw = dict(ycfg=ycfg, hp=hp, image_size=NET_HW, src_hw=SRC_HW,
              conf_thres=0.0, max_det=16, frames_format="letterboxed_yuv420")
    exp = export_framedp_step(
        yolo_params, reid_params, reid_stats, batch=b, devices=devs, **kw)
    exp2 = jax.export.deserialize(exp.serialize())
    assert exp2.nr_devices == 4

    mesh = Mesh(np.array(devs), ("frame",))
    fr_s = NamedSharding(mesh, P("frame"))
    repl = NamedSharding(mesh, P())
    frames = np.asarray(_frames(rng, b))
    valid = np.ones((b,), bool)
    states = init_states(hp)

    live = make_framedp_step(mesh, **kw)
    live_states, live_det, live_touts = live(
        yolo_params, reid_params, reid_stats, lut,
        jax.device_put(states, repl), jax.device_put(frames, fr_s),
        jax.device_put(valid, fr_s))

    got_states, got_det, got_touts = exp2.call(
        jax.device_put(yolo_params, repl), jax.device_put(reid_params, repl),
        jax.device_put(reid_stats, repl), jax.device_put(lut, repl),
        jax.device_put(states, repl), jax.device_put(frames, fr_s),
        jax.device_put(valid, fr_s))

    for a, c in zip(jax.tree.leaves(live_det), jax.tree.leaves(got_det)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree.leaves(live_touts), jax.tree.leaves(got_touts)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree.leaves(live_states), jax.tree.leaves(got_states)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_cli_export_and_smoke(tmp_path, capsys):
    from vehicle_counting_tpu.serving.cli import main

    out = str(tmp_path / "cli_art")
    main(["export", "--out", out, "--variant", "yolov5n", "--batch", "2",
          "--image_size", "96", "--src_hw", "80", "160"])
    assert os.path.exists(os.path.join(out, "manifest.json"))
    assert os.path.exists(os.path.join(out, "pipeline_step.bin"))
    assert os.path.exists(os.path.join(out, "weights.npz"))
    main(["smoke", "--artifact", out, "--batches", "2"])
    smoke = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert smoke["smoke"] == "pipeline_step" and smoke["frames"] == 4
