"""Export / smoke-test serving artifacts.

    # build a self-contained artifact (weights bundled) for 720p @ yolov5s
    python -m vehicle_counting_tpu.serving.cli export --out /tmp/art \
        [--weight yolov5s.pt|.npz] [--reid_checkpoint ckpt.t7] \
        [--batch 128] [--src_hw 720 1280] [--detect_only] [--no_bundle]

    # load it back and run random batches through the exported program
    python -m vehicle_counting_tpu.serving.cli smoke --artifact /tmp/art

    # FRESH-process validation: rebuild the live jit from the artifact's
    # own config+weights, run chained seeded batches through BOTH the live
    # jit and the exported program, assert array-equality, and report the
    # amortized per-batch dispatch time of each (run this in a separate
    # process from the export to prove the deployment contract end to end)
    python -m vehicle_counting_tpu.serving.cli verify --artifact /tmp/art

Weight resolution matches run.py/CountingPipeline (download cache, random
init fallback when no egress), so artifacts built on the egress runbook's
converted checkpoints are the production path and random-init artifacts
exercise the identical code path in tests.
"""

from __future__ import annotations

import argparse
import json
import time
import types


def _build_pipeline(args):
    """CountingPipeline as a param/config factory (no videos touched).

    Params are built under the CPU backend: export only needs shapes, and
    eager random-init on the accelerator costs one remote compile per RNG
    shape (~17 min for yolov5s+reid over the axon tunnel, measured) while
    CPU init is seconds. Real checkpoints load as numpy regardless.
    """
    import jax

    from vehicle_counting_tpu.configs import default_cam_config, default_config
    from vehicle_counting_tpu.pipeline import CountingPipeline

    config = default_config()
    if args.variant:
        config.model_name = args.variant
    if args.image_size:
        config.image_size = [args.image_size, args.image_size]
    if args.batch:
        config.detect_batch = args.batch
    ns = types.SimpleNamespace(
        input_path="__no_videos__",
        output_path=args.out,
        weight=args.weight,
        mapping_dict=None,
        debug=False,
        profile=None,
        check_numerics=False,
    )
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None:
        return CountingPipeline(ns, config=config, cam_config=default_cam_config())
    with jax.default_device(cpu):
        return CountingPipeline(ns, config=config, cam_config=default_cam_config())


def cmd_export(args) -> str:
    import numpy as np

    from vehicle_counting_tpu.serving.artifact import (
        export_detect_step,
        export_pipeline_step,
        save_artifact,
    )

    pipe = _build_pipeline(args)
    if args.reid_checkpoint:
        from vehicle_counting_tpu.models.reid import load_reid_weights

        pipe.reid_params, pipe.reid_stats = load_reid_weights(args.reid_checkpoint)

    src_hw = (args.src_hw[0], args.src_hw[1])
    net_hw = pipe.net_hw(src_hw)
    batch = args.batch or pipe.batch_size
    hp = pipe._cam_params("default")
    kw = dict(
        ycfg=pipe.ycfg,
        batch=batch,
        image_size=net_hw,
        src_hw=src_hw,
        conf_thres=pipe.conf_thres,
        iou_thres=pipe.iou_thres,
        max_det=pipe.max_det,
        dtype=pipe.dtype,
        platforms=args.platforms or None,
    )
    t0 = time.perf_counter()
    exported = {
        "detect_step": export_detect_step(pipe.yolo_params, **kw),
    }
    if not args.detect_only:
        exported["pipeline_step"] = export_pipeline_step(
            pipe.yolo_params, pipe.reid_params, pipe.reid_stats,
            hp=hp, frames_format=args.frames_format, **kw,
        )
    dt = time.perf_counter() - t0

    weights = None
    if not args.no_bundle:
        weights = {
            "yolo": pipe.yolo_params,
            "reid": pipe.reid_params,
            "reid_stats": pipe.reid_stats,
        }
    save_artifact(
        args.out,
        exported=exported,
        ycfg=pipe.ycfg,
        hp=hp,
        config={
            "batch": batch,
            "src_hw": list(src_hw),
            "image_size": list(net_hw),
            "conf_thres": pipe.conf_thres,
            "iou_thres": pipe.iou_thres,
            "max_det": pipe.max_det,
            "dtype": np.dtype(pipe.dtype).name,
            "frames_format": args.frames_format,
        },
        class_lut=np.asarray(pipe.class_lut),
        weights=weights,
    )
    print(
        f"[serving] exported {sorted(exported)} to {args.out} in {dt:.1f}s "
        f"(batch={batch}, src_hw={src_hw}, net_hw={net_hw})"
    )
    return args.out


def cmd_smoke(args) -> None:
    import numpy as np

    import jax.numpy as jnp

    from vehicle_counting_tpu.serving.artifact import ServingArtifact

    art = ServingArtifact.load(args.artifact)
    cfg = art.manifest["config"]
    print(f"[serving] loaded {art.function_names} "
          f"(platforms={art.manifest['functions'][art.function_names[0]]['platforms']})")
    rng = np.random.default_rng(0)

    if "pipeline_step" in art.function_names:
        step = art.bound_pipeline_step()
        states = art.init_states()
        b = cfg["batch"]
        from vehicle_counting_tpu.serving.artifact import serving_frames_shape

        fshape = serving_frames_shape(
            cfg["frames_format"], b, tuple(cfg["src_hw"]), tuple(cfg["image_size"])
        )
        frames = jnp.asarray(rng.integers(0, 255, fshape, np.uint8))
        valid = jnp.ones((b,), bool)
        t0 = time.perf_counter()
        for _ in range(args.batches):
            states, det, touts = step(states, frames, valid)
        np.asarray(touts.mask)
        dt = time.perf_counter() - t0
        frames_n = args.batches * b
        print(json.dumps({
            "smoke": "pipeline_step", "batches": args.batches,
            "frames": frames_n, "wall_s": round(dt, 3),
            "fps": round(frames_n / dt, 1),
            "tracks_last_batch": int(np.asarray(touts.mask).sum()),
            "dets_last_batch": int(np.asarray(det["valid"]).sum()),
        }))
    else:
        w = art.load_weights()
        b = cfg["batch"]
        from vehicle_counting_tpu.serving.artifact import serving_frames_shape

        fshape = serving_frames_shape(
            "letterboxed_yuv420", b, tuple(cfg["src_hw"]), tuple(cfg["image_size"])
        )
        frames = jnp.asarray(rng.integers(0, 255, fshape, np.uint8))
        t0 = time.perf_counter()
        for _ in range(args.batches):
            det = art.detect_step(w["yolo"], frames)
        np.asarray(det["valid"])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "smoke": "detect_step", "batches": args.batches,
            "frames": args.batches * b, "wall_s": round(dt, 3),
            "fps": round(args.batches * b / dt, 1),
            "dets_last_batch": int(np.asarray(det["valid"]).sum()),
        }))


def cmd_verify(args) -> None:
    """Fresh-process artifact validation vs the live jit (VERDICT r4 #1).

    Loads the artifact (deserialized StableHLO), reconstructs the LIVE
    jitted pipeline step from the manifest's static config and the bundled
    weights, then runs `--batches` chained seeded batches through both,
    asserting ARRAY-EQUALITY of every output (det, track outs, final
    states) and timing each path (chained dispatches, one readback per
    chain — the amortized per-batch dispatch cost, tunnel floor excluded).
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
    from vehicle_counting_tpu.serving.artifact import (
        ServingArtifact,
        serving_frames_shape,
    )

    art = ServingArtifact.load(args.artifact)
    if "pipeline_step" not in art.function_names:
        raise SystemExit(
            "verify needs a pipeline_step artifact with bundled weights "
            f"(this one has {art.function_names}); re-export without "
            "--detect_only/--no_bundle")
    cfg = art.manifest["config"]
    w = art.load_weights()
    lut = art.class_lut()
    hp = art.hp
    ycfg = art.ycfg
    dtype = jnp.dtype(cfg["dtype"])
    kw = dict(
        ycfg=ycfg, hp=hp,
        image_size=tuple(cfg["image_size"]), src_hw=tuple(cfg["src_hw"]),
        conf_thres=cfg["conf_thres"], iou_thres=cfg["iou_thres"],
        max_det=cfg["max_det"], dtype=dtype,
        frames_format=cfg["frames_format"],
    )
    b = cfg["batch"]
    fshape = serving_frames_shape(
        cfg["frames_format"], b, tuple(cfg["src_hw"]), tuple(cfg["image_size"])
    )
    rng = np.random.default_rng(args.seed)
    batches = [
        jnp.asarray(rng.integers(0, 255, fshape, np.uint8))
        for _ in range(args.batches)
    ]
    valid = jnp.ones((b,), bool)

    def live(states, frames):
        return pipeline_batch_step(
            w["yolo"], w["reid"], w["reid_stats"], states, frames, valid,
            lut, **kw)

    art_step = art.jitted("pipeline_step")

    def exported(states, frames):
        return art_step(
            w["yolo"], w["reid"], w["reid_stats"], states, frames, valid,
            lut)

    def run_chain(step):
        # pass 1 (collect outputs; includes compile + the chained-state
        # retrace — exported calls retrace once more when the carried
        # states switch from host-built to program-output layouts)
        states = art.init_states()
        outs = []
        t0 = time.perf_counter()
        for fr in batches:
            states, det, touts = step(states, fr)
            outs.append((det, touts))
        np.asarray(touts.mask)  # axon: only readback truly syncs
        first_pass_s = time.perf_counter() - t0
        # pass 2: fully-warm steady-state timing of the same chain
        states2 = art.init_states()
        t0 = time.perf_counter()
        for fr in batches:
            states2, det2, touts2 = step(states2, fr)
        np.asarray(touts2.mask)
        steady_s = time.perf_counter() - t0
        return states, outs, first_pass_s, steady_s

    s_live, o_live, c_live, t_live = run_chain(live)
    s_art, o_art, c_art, t_art = run_chain(exported)

    mismatches = 0
    for i, ((dl, tl), (da, ta)) in enumerate(zip(o_live, o_art)):
        for x, y in zip(jax.tree.leaves((dl, tl)), jax.tree.leaves((da, ta))):
            if not np.array_equal(np.asarray(x), np.asarray(y)):
                mismatches += 1
    for x, y in zip(jax.tree.leaves(s_live), jax.tree.leaves(s_art)):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            mismatches += 1

    report = {
        "verify": "pipeline_step",
        "backend": jax.default_backend(),
        "kernel_modes": art.manifest.get("kernel_modes", {}),
        "batches": args.batches,
        "batch": b,
        "bit_exact": mismatches == 0,
        "mismatched_arrays": mismatches,
        "live_first_pass_s": round(c_live, 3),
        "artifact_first_pass_s": round(c_art, 3),
        "live_ms_per_batch": round(1e3 * t_live / args.batches, 3),
        "artifact_ms_per_batch": round(1e3 * t_art / args.batches, 3),
        "live_ms_per_frame": round(1e3 * t_live / args.batches / b, 4),
        "artifact_ms_per_frame": round(1e3 * t_art / args.batches / b, 4),
    }
    print(json.dumps(report))
    if mismatches:
        raise SystemExit(f"artifact outputs diverge from the live jit "
                         f"({mismatches} arrays)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="vct-serving")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="build a serving artifact directory")
    pe.add_argument("--out", required=True)
    pe.add_argument("--weight", default=None, help=".pt/.npz detector checkpoint")
    pe.add_argument("--reid_checkpoint", default=None, help="ckpt.t7/.npz ReID weights")
    pe.add_argument("--variant", default=None, help="yolov5n/s/m/l/x (default: config)")
    pe.add_argument("--batch", type=int, default=None)
    pe.add_argument("--image_size", type=int, default=None,
                    help="detector size (max dim; AutoShape geometry applies)")
    pe.add_argument("--src_hw", type=int, nargs=2, default=[720, 1280])
    pe.add_argument("--frames_format", default="letterboxed_yuv420",
                    choices=["raw_rgb", "letterboxed_rgb", "letterboxed_yuv420"])
    pe.add_argument("--detect_only", action="store_true")
    pe.add_argument("--no_bundle", action="store_true",
                    help="skip bundling weights into the artifact")
    pe.add_argument("--platforms", nargs="*", default=None,
                    help="export platforms (default: current backend)")
    pe.set_defaults(fn=cmd_export)

    ps = sub.add_parser("smoke", help="load an artifact and run random batches")
    ps.add_argument("--artifact", required=True)
    ps.add_argument("--batches", type=int, default=3)
    ps.set_defaults(fn=cmd_smoke)

    pv = sub.add_parser(
        "verify",
        help="fresh-process check: exported program array-equal to the live "
             "jit rebuilt from the artifact's config+weights, with timings")
    pv.add_argument("--artifact", required=True)
    pv.add_argument("--batches", type=int, default=8)
    pv.add_argument("--seed", type=int, default=0)
    pv.set_defaults(fn=cmd_verify)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
