#!/usr/bin/env python
"""Device-resident stage decomposition of the fused pipeline step.

Reports per-stage ms/frame on the current backend with data already resident
in HBM (no host<->device transfer in the timed region — bench.py measures
the streaming e2e number; this isolates compute):

  detect   letterbox-from-I420 + YOLOv5 bf16 forward + decode + NMS + restore
  embed    batch-global chunked crop gather + ReID CNN (~30 valid dets/frame)
  tracker  per-class DeepSORT scan over the batch (churn + steady variants)
  e2e      the full fused pipeline_batch_step

"churn" feeds random boxes every frame (most tracks die/birth each frame:
IoU stage dominates, cascade rows empty); "steady" feeds slowly-drifting
persistent boxes (confirmed tracks, matching cascade + gallery active) —
the realistic steady-state load. Timing: each timed call re-dispatches the
same compiled program; sync via small-output readback (np.asarray), the only
operation that truly synchronizes on networked backends (CLAUDE.md).

Usage: python stage_bench.py [--reps 5] [--batch 32] [--stages detect,...]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


TRACE_DIR = [None]


def _time_ms_per_frame(fn, sync, b, reps, chain):
    """min over reps of (chain dispatches; one sync) in ms/frame.

    Chaining amortizes the per-sync tunnel round trip (~25 ms on networked
    dev backends, where only data readback synchronizes) the same way
    bench.py's batch windows do.
    """
    fn()
    sync()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    if TRACE_DIR[0]:
        import jax

        with jax.profiler.trace(TRACE_DIR[0]):
            for _ in range(chain):
                fn()
            sync()
    return best * 1000.0 / (b * chain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dets", type=int, default=30, help="target valid dets/frame")
    ap.add_argument("--stages", default="detect,embed,tracker,e2e")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of each measured stage")
    ap.add_argument("--reid_dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--max_embed", type=int, default=64, help="ReID crops per CNN forward")
    ap.add_argument("--class_mode", default="batched", choices=["scan", "batched"])
    ap.add_argument("--num_classes", type=int, default=4)
    ap.add_argument(
        "--dominant_frac", type=float, default=0.0,
        help="fraction of detections forced into class 0 (realistic traffic "
        "is class-skewed; 0 keeps the uniform class draw)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vehicle_counting_tpu.pipeline import enable_compilation_cache

    enable_compilation_cache()

    from functools import partial

    from vehicle_counting_tpu.models.reid import init_reid
    from vehicle_counting_tpu.models.detector import fused_detect_tail
    from vehicle_counting_tpu.models.yolo import (
        YoloConfig, init_yolov5, yolov5_forward,
    )
    from vehicle_counting_tpu.ops.letterbox import (
        host_letterbox_yuv420, letterbox_params, restore_boxes,
        yuv420_content_to_full, yuv420_to_rgb_u8,
    )

    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
    from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states
    from vehicle_counting_tpu.tracking.deepsort import (
        deepsort_frame_core, embed_detections_batch,
    )

    B, H, W = args.batch, 720, 1280
    # AutoShape-actual network input (stride-aligned minimal pad): 384x640
    # for 720p@640 — the pipeline's default geometry since round 4
    from vehicle_counting_tpu.ops.letterbox import autoshape_hw

    det_hw = autoshape_hw((H, W), 640)
    ycfg = YoloConfig(variant="yolov5s", num_classes=80)
    yolo_params = jax.device_put(init_yolov5(jax.random.PRNGKey(0), ycfg))
    reid_params, reid_stats = init_reid(jax.random.PRNGKey(1))
    reid_params = jax.device_put(reid_params)
    reid_stats = jax.device_put(reid_stats)
    hp = DeepSortParams(
        tracker=TrackerParams(capacity=64, feat_dtype="bfloat16"),
        num_classes=args.num_classes,
        max_embed=args.max_embed, class_mode=args.class_mode,
    )

    rng = np.random.default_rng(0)
    frames_host = host_letterbox_yuv420(
        rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8), det_hw,
        content_only=True,
    )
    frames = jax.device_put(frames_host)
    gain, pad_x, pad_y, _, _ = letterbox_params((H, W), det_hw)

    stages = set(args.stages.split(","))
    results = {}
    TRACE_DIR[0] = args.trace

    # ---- synthetic detections: args.dets valid boxes/frame over 4 classes --
    n_det = 300
    k = args.dets

    def boxes_for(seed):
        r = np.random.default_rng(seed)
        cx = r.uniform(100, W - 100, size=(B, n_det))
        cy = r.uniform(100, H - 100, size=(B, n_det))
        bw = r.uniform(40, 160, size=(B, n_det))
        bh = r.uniform(40, 160, size=(B, n_det))
        return np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)

    det_valid = np.zeros((B, n_det), bool)
    det_valid[:, :k] = True
    classes_h = np.asarray(
        np.random.default_rng(1).integers(0, args.num_classes, size=(B, n_det)), np.int32
    )
    if args.dominant_frac > 0:
        dom = np.random.default_rng(9).random(size=(B, n_det)) < args.dominant_frac
        classes_h = np.where(dom, 0, classes_h).astype(np.int32)
    scores_h = np.asarray(
        np.random.default_rng(2).uniform(0.3, 0.9, size=(B, n_det)), np.float32
    )
    boxes_churn = jax.device_put(jnp.asarray(boxes_for(3), jnp.float32))
    dv = jax.device_put(jnp.asarray(det_valid))
    cls = jax.device_put(jnp.asarray(classes_h))
    sco = jax.device_put(jnp.asarray(scores_h))

    if "detect" in stages:
        @jax.jit
        def detect_only(params, fr):
            full = yuv420_content_to_full(fr, (H, W), det_hw)
            rgb = yuv420_to_rgb_u8(full)  # the pipeline's exact u8 pixel path
            heads = yolov5_forward(params, (rgb.astype(jnp.float32) / 255.0).astype(jnp.bfloat16), ycfg, dtype=jnp.bfloat16)
            det = fused_detect_tail(
                heads, ycfg, conf_thres=0.25, iou_thres=0.45, max_det=300,
            )
            det["boxes"] = restore_boxes(det["boxes"], (H, W), det_hw)
            return det

        out = [None]

        def run():
            out[0] = detect_only(yolo_params, frames)

        results["detect"] = _time_ms_per_frame(
            run, lambda: np.asarray(out[0]["valid"]), B, args.reps, args.chain
        )

    if "detect_fwd" in stages:
        @jax.jit
        def fwd_only(params, fr):
            full = yuv420_content_to_full(fr, (H, W), det_hw)
            rgb = yuv420_to_rgb_u8(full)  # the pipeline's exact u8 pixel path
            heads = yolov5_forward(params, (rgb.astype(jnp.float32) / 255.0).astype(jnp.bfloat16), ycfg, dtype=jnp.bfloat16)
            # tiny reduction so the heads are consumed without the tail
            return [h.sum() for h in heads]

        out = [None]

        def run():
            out[0] = fwd_only(yolo_params, frames)

        results["detect_fwd"] = _time_ms_per_frame(
            run, lambda: np.asarray(out[0][0]), B, args.reps, args.chain
        )

    if "detect_tail" in stages:
        # decode+NMS+restore alone, from materialized heads
        @jax.jit
        def heads_only(params, fr):
            full = yuv420_content_to_full(fr, (H, W), det_hw)
            rgb = yuv420_to_rgb_u8(full).astype(jnp.float32)
            return yolov5_forward(params, (rgb / 255.0).astype(jnp.bfloat16), ycfg, dtype=jnp.bfloat16)

        heads = jax.block_until_ready(heads_only(yolo_params, frames))

        @jax.jit
        def tail_only(heads):
            det = fused_detect_tail(
                heads, ycfg, conf_thres=0.25, iou_thres=0.45, max_det=300,
            )
            det["boxes"] = restore_boxes(det["boxes"], (H, W), det_hw)
            return det

        out = [None]

        def run():
            out[0] = tail_only(heads)

        results["detect_tail"] = _time_ms_per_frame(
            run, lambda: np.asarray(out[0]["valid"]), B, args.reps, args.chain
        )

    if "embed" in stages:
        full = yuv420_content_to_full(frames, (H, W), det_hw)
        crop_source = yuv420_to_rgb_u8(full)
        crop_source = jax.device_put(jax.block_until_ready(crop_source))
        out = [None]

        embed_jit = jax.jit(
            partial(
                embed_detections_batch,
                hp=hp, crop_gain=float(gain), crop_pad=(float(pad_x), float(pad_y)),
                dtype=jnp.dtype(args.reid_dtype).type if args.reid_dtype != "float32" else None,
            )
        )

        def run():
            out[0] = embed_jit(crop_source, boxes_churn, dv, reid_params, reid_stats)

        results["embed"] = _time_ms_per_frame(
            run, lambda: np.asarray(out[0][0, 0, :1]), B, args.reps, args.chain
        )

    if stages & {"embed_gather", "embed_gather_pallas", "embed_cnn"}:
        from vehicle_counting_tpu.ops.crops import gather_crops_batch
        from vehicle_counting_tpu.models.reid import reid_forward as _rf

        full = yuv420_content_to_full(frames, (H, W), det_hw)
        crop_source = yuv420_to_rgb_u8(full)
        crop_source = jax.device_put(jax.block_until_ready(crop_source))
        n_crops = B * k  # total valid crops (30/frame)
        fidx = jnp.asarray(np.repeat(np.arange(B), k), jnp.int32)
        bsel = boxes_churn[:, :k].reshape(B * k, 4) * float(gain) + jnp.asarray(
            [pad_x, pad_y, pad_x, pad_y], jnp.float32
        )
        vsel = jnp.ones((n_crops,), bool)

        if "embed_gather" in stages:
            gdt = jnp.bfloat16 if args.reid_dtype == "bfloat16" else None

            @jax.jit
            def gather_only(src, fi, bx, v):
                crops = gather_crops_batch(src, fi, bx, v, dtype=gdt)
                return crops.sum()  # consume without the CNN

            out = [None]

            def run():
                out[0] = gather_only(crop_source, fidx, bsel, vsel)

            results["embed_gather"] = _time_ms_per_frame(
                run, lambda: np.asarray(out[0]), B, args.reps, args.chain
            )

        if "embed_gather_pallas" in stages:
            from vehicle_counting_tpu.ops.pallas.crops import (
                gather_crops_batch_pallas, pallas_crops_supported,
            )

            if not pallas_crops_supported():
                print("  embed_gather_pallas: kernel unsupported on this backend")
            else:
                gdt = jnp.bfloat16 if args.reid_dtype == "bfloat16" else None

                @jax.jit
                def gather_pallas(src, fi, bx, v):
                    fp = jnp.transpose(src, (0, 3, 1, 2))
                    return gather_crops_batch_pallas(fp, fi, bx, v, dtype=gdt).sum()

                out = [None]

                def run():
                    out[0] = gather_pallas(crop_source, fidx, bsel, vsel)

                results["embed_gather_pallas"] = _time_ms_per_frame(
                    run, lambda: np.asarray(out[0]), B, args.reps, args.chain
                )

        if "embed_cnn" in stages:
            crops_fixed = jax.block_until_ready(
                gather_crops_batch(crop_source, fidx, bsel, vsel)
            )
            dt = jnp.dtype(args.reid_dtype).type if args.reid_dtype != "float32" else None

            @jax.jit
            def cnn_only(p, st, c):
                f, _ = _rf(p, st, c, train=False, reid=True, dtype=dt)
                return f

            out = [None]

            def run():
                out[0] = cnn_only(reid_params, reid_stats, crops_fixed)

            results["embed_cnn"] = _time_ms_per_frame(
                run, lambda: np.asarray(out[0][0, :1]), B, args.reps, args.chain
            )

    if stages & {"tracker", "tracker_churn", "tracker_steady"}:
        feats_h = np.random.default_rng(4).normal(size=(B, n_det, 512))
        feats_h /= np.linalg.norm(feats_h, axis=-1, keepdims=True)
        feats = jax.device_put(jnp.asarray(feats_h, jnp.float32))

        # honor the pipeline's VCT_SCAN_UNROLL knob so the tracker stage
        # A/Bs the same unroll the production scan would use
        from vehicle_counting_tpu.pipeline.step import _SCAN_UNROLL

        @partial(jax.jit, static_argnames=("hp_",))
        def tracker_scan(states_, feats_, boxes_, scores_, classes_, valid_, hp_):
            def body(st, inp):
                f, bx, sc, cl, v = inp
                st, o = deepsort_frame_core(st, f, bx, sc, cl, v, hp_, (H, W))
                return st, o

            return jax.lax.scan(
                body, states_, (feats_, boxes_, scores_, classes_, valid_),
                unroll=_SCAN_UNROLL,
            )

        for name, seeds in (("tracker_churn", (5, 6)), ("tracker_steady", None)):
            if "tracker" not in stages and name not in stages:
                continue
            states = init_states(hp)
            if seeds is None:
                base = boxes_for(7)[0]  # one frame's boxes, drift slowly
                drift = np.cumsum(
                    np.random.default_rng(8).normal(0, 2.0, size=(B, n_det, 4)), 0
                )
                steady = jnp.asarray(base[None] + drift, jnp.float32)
                bx = jax.device_put(steady)
                # warm the tracker into confirmed steady state
                states, _ = tracker_scan(states, feats, bx, sco, cls, dv, hp)
                states = jax.block_until_ready(states)
            else:
                bx = boxes_churn
            out = [None]

            def run():
                out[0] = tracker_scan(states, feats, bx, sco, cls, dv, hp)

            results[name] = _time_ms_per_frame(
                run, lambda: np.asarray(out[0][1].mask[0, 0, :1]), B, args.reps, args.chain
            )

    if "e2e" in stages:
        import collections

        states = init_states(hp)
        valid = jnp.ones((B,), bool)

        def make_kw(conf):
            return dict(
                ycfg=ycfg, hp=hp, image_size=det_hw, src_hw=(H, W),
                conf_thres=conf, iou_thres=0.45, max_det=300, dtype=jnp.bfloat16,
                frames_format="letterboxed_yuv420",
            )

        # calibrate to ~args.dets tracked detections/frame (same recipe as
        # bench.py: identity lut pass, take the 4 dominant random-init
        # classes, threshold at the 30th score)
        lut_id = jnp.arange(80, dtype=jnp.int32)
        _, det0, _ = pipeline_batch_step(
            yolo_params, reid_params, reid_stats, states, frames, valid, lut_id,
            **make_kw(0.0),
        )
        sc0 = np.asarray(det0["scores"][0]); cl0 = np.asarray(det0["classes"][0])
        ok0 = np.asarray(det0["valid"][0])
        top4 = [c for c, _ in collections.Counter(cl0[ok0].tolist()).most_common(4)]
        lut_h = np.full((80,), -1, np.int32)
        for dd, srcc in enumerate(top4):
            lut_h[srcc] = dd
        lut = jnp.asarray(lut_h)
        pool = np.sort(sc0[ok0 & np.isin(cl0, top4)])
        conf = float(pool[-min(k, pool.size)]) if pool.size else 0.0
        kw = make_kw(conf)
        out = [None]

        def run():
            out[0] = pipeline_batch_step(
                yolo_params, reid_params, reid_stats, states, frames, valid, lut, **kw
            )

        results["e2e"] = _time_ms_per_frame(
            run, lambda: np.asarray(out[0][2].mask[0, 0, :1]), B, args.reps, args.chain
        )

    print(f"backend={jax.default_backend()} batch={B} dets/frame~{k}")
    for name, ms in results.items():
        print(f"  {name:15s} {ms:7.3f} ms/frame   ({1000.0 / ms:7.1f} fps)")


if __name__ == "__main__":
    main()
