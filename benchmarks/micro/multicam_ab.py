#!/usr/bin/env python
"""Camera-sharded step vs serial pipeline step at mesh size 1 (VERDICT r4 #3).

Measures, on the real chip, what the multicam scaling claim ("per-chip
throughput = single-camera bench / local cameras") assumes:

  serial       pipeline_batch_step, [B] frames           (the bench program)
  mc1          multicam shard_map, 1 camera  x [B]       (wrapper overhead)
  mc2          multicam shard_map, 2 cameras x [B]       (shard-local scan
                                                          serialization)
  mc2_masked   2 cameras, second all-invalid             (exhausted-camera
                                                          ride-along cost)

plus the HOST drain cost at 40 cameras (the per-batch readback->rows loop
in pipeline/multicam.py, vectorized in round 5).

All device numbers are chained-dispatch ms/frame with one readback per
chain (the axon tunnel only syncs on readback). The detection load is
calibrated to ~--dets tracked detections/frame with the same recipe as
stage_bench's e2e stage, and the SAME calibrated inputs feed every variant.

Usage: python benchmarks/micro/multicam_ab.py [--batch 128] [--reps 5]
           [--chain 8] [--dets 30]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--dets", type=int, default=30)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry/variant for a CPU functional check")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vehicle_counting_tpu.pipeline import enable_compilation_cache

    enable_compilation_cache()

    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
    from vehicle_counting_tpu.ops.letterbox import autoshape_hw, host_letterbox_yuv420
    from vehicle_counting_tpu.parallel.cameras import make_multicam_step
    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

    B, H, W = args.batch, 720, 1280
    det_hw = autoshape_hw((H, W), 640)
    variant = "yolov5s"
    if args.smoke:
        H, W, det_hw, variant = 180, 320, autoshape_hw((180, 320), 160), "yolov5n"
    ycfg = YoloConfig(variant=variant, num_classes=80)
    yolo_params = init_yolov5(jax.random.PRNGKey(0), ycfg)
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=64, budget=60, max_age=30, n_init=3,
                              feat_dtype="bfloat16"),
        num_classes=4,
    )

    from vehicle_counting_tpu.ops.letterbox import content_upload_exact

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (B, H, W, 3), np.uint8)
    co = content_upload_exact((H, W), det_hw)
    yuv = host_letterbox_yuv420(raw, det_hw, content_only=co)
    frames = jax.device_put(jnp.asarray(yuv))
    valid = jnp.ones((B,), bool)

    def make_kw(conf):
        return dict(
            ycfg=ycfg, hp=hp, image_size=det_hw, src_hw=(H, W),
            conf_thres=conf, iou_thres=0.45, max_det=300, dtype=jnp.bfloat16,
            frames_format="letterboxed_yuv420",
        )

    # calibrate (stage_bench e2e recipe): identity-lut pass, keep the 4
    # dominant random-init classes, threshold at the --dets'th score
    states0 = init_states(hp)
    lut_id = jnp.arange(80, dtype=jnp.int32)
    _, det0, _ = pipeline_batch_step(
        yolo_params, reid_params, reid_stats, states0, frames, valid, lut_id,
        **make_kw(0.0))
    sc0 = np.asarray(det0["scores"][0])
    cl0 = np.asarray(det0["classes"][0])
    ok0 = np.asarray(det0["valid"][0])
    top4 = [c for c, _ in collections.Counter(cl0[ok0].tolist()).most_common(4)]
    lut_h = np.full((80,), -1, np.int32)
    for dd, srcc in enumerate(top4):
        lut_h[srcc] = dd
    lut = jnp.asarray(lut_h)
    pool = np.sort(sc0[ok0 & np.isin(cl0, top4)])
    conf = float(pool[-min(args.dets, pool.size)]) if pool.size else 0.0
    kw = make_kw(conf)
    print(f"[mc_ab] calibrated conf={conf:.4f} (~{args.dets} dets/frame)")

    def time_ms_per_frame(fn, sync, frames_per_call):
        fn(); sync()
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                fn()
            sync()
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0 / (frames_per_call * args.chain)

    results = {}

    # --- serial -----------------------------------------------------------
    states = init_states(hp)
    out = [None]

    def run_serial():
        out[0] = pipeline_batch_step(
            yolo_params, reid_params, reid_stats, states, frames, valid, lut,
            **kw)

    results["serial"] = time_ms_per_frame(
        run_serial, lambda: np.asarray(out[0][2].mask[0, 0, :1]), B)
    print(f"[mc_ab] serial {results['serial']:.3f} ms/frame")

    # --- multicam variants on a 1-device mesh ----------------------------
    mesh = Mesh(np.array(jax.devices()[:1]), ("cam",))
    step = make_multicam_step(mesh, **kw)

    for name, ncam, valid_mask in (
        ("mc1", 1, None),
        ("mc2", 2, None),
        ("mc2_masked", 2, [True, False]),
    ):
        st = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (ncam,) + x.shape).copy(),
            init_states(hp))
        fr = jnp.broadcast_to(frames, (ncam,) + frames.shape).copy()
        va = np.ones((ncam, B), bool)
        if valid_mask is not None:
            for i, v in enumerate(valid_mask):
                va[i] = v
        va = jnp.asarray(va)
        out_mc = [None]

        def run_mc(st=st, fr=fr, va=va):
            out_mc[0] = step(
                yolo_params, reid_params, reid_stats, lut, st, fr, va)

        # live cameras for the per-frame denominator (masked cameras do
        # ride the program; report per-LIVE-frame cost so the ride-along
        # tax is visible in the number)
        live = sum(valid_mask) if valid_mask is not None else ncam
        results[name] = time_ms_per_frame(
            run_mc, lambda: np.asarray(out_mc[0][1].mask[0, 0, 0, :1]),
            live * B)
        print(f"[mc_ab] {name} {results[name]:.3f} ms/live-frame "
              f"(cams={ncam}, live={live})")

    # --- frame-parallel step at mesh=1 (shard_map wrapper overhead) ------
    from vehicle_counting_tpu.parallel.frames import make_framedp_step

    fp_mesh = Mesh(np.array(jax.devices()[:1]), ("frame",))
    fp_step = make_framedp_step(fp_mesh, **kw)
    st_fp = init_states(hp)
    out_fp = [None]

    def run_fp():
        out_fp[0] = fp_step(
            yolo_params, reid_params, reid_stats, lut, st_fp, frames, valid)

    results["framedp1"] = time_ms_per_frame(
        run_fp, lambda: np.asarray(out_fp[0][2].mask[0, 0, :1]), B)
    results["overhead_framedp1_vs_serial_ms"] = round(
        results["framedp1"] - results["serial"], 4)
    print(f"[mc_ab] framedp1 {results['framedp1']:.3f} ms/frame "
          f"(frame-sharded step on a 1-device mesh)")

    # --- host drain at 40 cameras ----------------------------------------
    ncam, C, K = 40, 4, 64
    mask = np.zeros((ncam, B, C, K), bool)
    r2 = np.random.default_rng(1)
    for i in range(ncam):  # ~30 tracks/frame
        for b in range(B):
            c = r2.integers(0, C, 30)
            k = r2.integers(0, K, 30)
            mask[i, b, c, k] = True
    tids = r2.integers(0, 1000, (ncam, B, C, K))
    boxes = r2.uniform(0, 700, (ncam, B, C, K, 4))
    ids = np.tile(np.arange(B, dtype=np.int64)[None], (ncam, 1))
    rows = [
        {"frames": [], "tracks": [], "labels": [], "boxes": []}
        for _ in range(ncam)
    ]
    t0 = time.perf_counter()
    for i in range(ncam):
        bb, c, k = np.nonzero(mask[i])
        if bb.size:
            rows[i]["frames"].extend(ids[i, bb].tolist())
            rows[i]["tracks"].extend(tids[i, bb, c, k].tolist())
            rows[i]["labels"].extend(c.tolist())
            rows[i]["boxes"].extend(boxes[i, bb, c, k])
    drain_s = time.perf_counter() - t0
    results["drain40_ms_per_batch"] = drain_s * 1000.0
    print(f"[mc_ab] host drain, 40 cams x B={B} x ~30 tracks: "
          f"{drain_s * 1000.0:.1f} ms/batch "
          f"({drain_s * 1e6 / (ncam * B):.1f} us/frame)")

    results["overhead_mc1_vs_serial_ms"] = round(
        results["mc1"] - results["serial"], 4)
    results["mc2_vs_2x_serial_ratio"] = round(
        results["mc2"] / results["serial"], 4)
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
