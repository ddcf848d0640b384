#!/usr/bin/env python
"""Vehicle counting CLI — same surface as the reference run.py.

    python run.py --input_path <video-or-dir> --output_path <dir> \
        [--weight ckpt.pt] [--debug] [--mapping coco] [--no_visualize]

Reference flags (run.py:6-12): --weight, --input_path, --output_path, --gpus,
--debug, --mapping. `--gpus` is accepted for compatibility but device
selection is JAX-managed on TPU. The COCO->vehicle MAPPING_DICT
(run.py:38-46) is applied with `--mapping coco` (and automatically for
80-class checkpoints). `--multicam` runs every video concurrently, cameras
sharded over the device mesh (pipeline/multicam.py) instead of the
reference's strictly serial per-video loop (modules/__init__.py:29).
"""

import argparse
import os

parser = argparse.ArgumentParser(description="Perform Counting vehicles (TPU-native)")
parser.add_argument("--weight", type=str, default=None, help="checkpoint of yolo (.pt/.npz)")
parser.add_argument("--input_path", type=str, required=True, help="video file or directory")
parser.add_argument("--output_path", type=str, required=True, help="directory for CSV/MP4 outputs")
parser.add_argument("--gpus", type=str, default="0", help="accepted for parity; unused on TPU")
parser.add_argument("--debug", action="store_true", help="print per-stage timing per video")
parser.add_argument("--profile", nargs="?", const="/tmp/vct_trace", default=None,
                    metavar="DIR", help="capture a jax.profiler trace to DIR")
parser.add_argument("--check_numerics", action="store_true",
                    help="numeric sanitizer: jax_debug_nans + finite-output checks")
parser.add_argument("--mapping", default=None, help="'coco' -> COCO->vehicle class mapping")
parser.add_argument("--config", type=str, default=None, help="path to configs.yaml override")
parser.add_argument("--cam_config", type=str, default=None, help="path to cam_configs.yaml override")
parser.add_argument("--no_visualize", action="store_true", help="skip the annotated-MP4 second pass")
parser.add_argument("--detect_only", action="store_true", help="detection-only pass: per-frame detections CSV, no tracking")
parser.add_argument("--multicam", action="store_true",
                    help="process all videos CONCURRENTLY, cameras sharded over the "
                         "device mesh (same CSV/MP4 artifacts). Videos are grouped by "
                         "(frame geometry, per-camera tracking_config); each group runs "
                         "as one compiled program, so every camera keeps its own "
                         "cam_configs.yaml DeepSORT params. Incompatible with "
                         "--detect_only (use --frame_parallel to scale detection).")
parser.add_argument("--frame_parallel", action="store_true",
                    help="shard each batch's frames over ALL devices for the "
                         "frame-independent detect+embed stages (parallel/frames.py; "
                         "the recurrent tracker scan runs replicated). Single-camera "
                         "scale-out; requires detect_batch %% n_devices == 0. Note: in "
                         "the default bfloat16 config, detections whose score sits "
                         "within ~1e-3 of the confidence/NMS thresholds may flip vs "
                         "the serial program (batch-extent reassociation); float32 "
                         "compute_dtype guarantees identical discrete outputs.")


def main(args, config, cam_config):
    from vehicle_counting_tpu.models.detector import COCO_VEHICLE_MAPPING
    from vehicle_counting_tpu.pipeline import CountingPipeline

    args.mapping_dict = COCO_VEHICLE_MAPPING if args.mapping == "coco" else None

    if getattr(args, "multicam", False) and args.detect_only:
        # fail loudly instead of silently falling through to the serial
        # detect-only loop: the user asked for camera sharding and would
        # otherwise never learn the flag was ignored
        raise SystemExit(
            "--multicam is incompatible with --detect_only (camera sharding "
            "drives the full detect+track step). For multi-device detection "
            "use --frame_parallel instead."
        )
    if getattr(args, "frame_parallel", False):
        if getattr(args, "multicam", False):
            print("[run] note: --frame_parallel is ignored in --multicam mode "
                  "(the mesh is already sharded over cameras)")
        config.frame_parallel = True
        import jax

        n_dev = len(jax.devices())
        batch = int(config.detect_batch or 8)
        if n_dev > 1 and batch % n_dev:
            raise SystemExit(
                f"--frame_parallel requires detect_batch ({batch}) divisible "
                f"by the device count ({n_dev}); set detect_batch in "
                f"configs.yaml accordingly."
            )

    print(config)
    if getattr(args, "multicam", False) and not args.detect_only:
        from vehicle_counting_tpu.pipeline.multicam import MultiCamCountingPipeline

        pipeline = MultiCamCountingPipeline(args, config, cam_config)
        results = pipeline.run(visualize=not args.no_visualize)
        for r in results:
            if r.get("csv"):
                print(f"{r['csv']}: counts={r['counts']}")
            else:
                print(f"FAILED {r.get('camera')}: {r.get('error')}")
        return results
    pipeline = CountingPipeline(args, config, cam_config)
    if args.detect_only:
        results = [pipeline.run_video_detect_only(p) for p in pipeline.all_video_paths]
        for r in results:
            print(f"{r['csv']}: {r['frames']} frames @ {r['fps']:.1f} fps")
        return results
    results = pipeline.run(visualize=not args.no_visualize)
    for r in results:
        if r.get("csv"):
            print(f"{r['csv']}: {r['frames']} frames @ {r['fps']:.1f} fps; counts={r['counts']}")
        else:
            print(f"FAILED {r.get('video')}: {r.get('error')}")
    return results


if __name__ == "__main__":
    from vehicle_counting_tpu.configs import Config, default_cam_config, default_config

    args = parser.parse_args()
    config = Config(args.config) if args.config else (
        Config(os.path.join("configs", "configs.yaml"))
        if os.path.exists(os.path.join("configs", "configs.yaml"))
        else default_config()
    )
    cam_config = Config(args.cam_config) if args.cam_config else (
        Config(os.path.join("configs", "cam_configs.yaml"))
        if os.path.exists(os.path.join("configs", "cam_configs.yaml"))
        else default_cam_config()
    )
    main(args, config, cam_config)
