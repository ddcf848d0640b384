"""End-to-end counting pipeline orchestration (reference: modules/__init__.py).

Per video (the unit of fault isolation, modules/__init__.py:29): open the
stream, build per-class tracker states from the camera's tracking_config,
stream fixed-size frame batches through ONE fused jitted device step
(detect+track, pipeline/step.py), accumulate the small [B, C, K] track
outputs on host, then run zone filtering + direction assignment + CSV
(counting/) and the annotated-video second pass (counting/visualize.py).

Artifacts match the reference exactly: {output}/{cam}.csv with the 10-column
schema, zone annotation at {zone_path}/{cam}.json, camera params from
cam_config.cam[cam] (modules/__init__.py:88-101).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from vehicle_counting_tpu.configs import Config, default_cam_config, default_config
from vehicle_counting_tpu.counting import VehicleCounter, count_directions
from vehicle_counting_tpu.counting.visualize import visualize_merged
from vehicle_counting_tpu.data import VideoReader, VideoWriter, list_videos
from vehicle_counting_tpu.models.detector import COCO_VEHICLE_MAPPING, VEHICLE_CLASS_NAMES


def enable_compilation_cache(path: str = "~/.cache/vct_jax_cache") -> None:
    """Persistent XLA compilation cache: the fused step compiles once ever."""
    import jax

    try:
        if jax.default_backend() != "tpu":
            # CPU AOT artifacts are machine-feature specific; caching them
            # across heterogeneous hosts just produces reload warnings
            return
        path = f"{path}_{jax.default_backend()}"
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without these flags


def prefetch(fetch, prep):
    """Overlap host work with device compute: one-batch-ahead prefetch.

    Runs `prep(fetch())` for the NEXT batch in a worker thread while the
    caller consumes the current one, so decode + letterbox + host->device
    upload overlap the device dispatch/readback (the reference's per-frame
    loop serializes all of these, modules/__init__.py:54). `fetch` returns
    the next raw batch or None at end-of-stream; `prep` maps it to what the
    caller consumes (typically device-put arrays). Shared by run_video and
    run_video_detect_only.
    """
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)

    def produce():
        batch = fetch()
        return None if batch is None else prep(batch)

    try:
        fut = pool.submit(produce)
        while True:
            got = fut.result()
            if got is None:
                return
            fut = pool.submit(produce)
            yield got
    finally:
        pool.shutdown()


class CountingPipeline:
    """Mirror of the reference CountingPipeline surface (modules/__init__.py:7-101)."""

    def __init__(self, args, config: Optional[Config] = None, cam_config: Optional[Config] = None):
        import jax
        import jax.numpy as jnp

        from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5
        from vehicle_counting_tpu.models.reid import init_reid, load_reid_weights
        from vehicle_counting_tpu.tracking import DeepSortParams, TrackerParams, init_states

        enable_compilation_cache()

        self.config = config or default_config()
        self.cam_config = cam_config or default_cam_config()
        self.args = args
        self.video_path = args.input_path
        self.saved_path = args.output_path
        self.zone_path = self.cam_config.zone_path
        os.makedirs(self.saved_path or ".", exist_ok=True)

        # ---- detector ------------------------------------------------------
        weight = getattr(args, "weight", None)
        variant = self.config.model_name or "yolov5s"
        if not weight:
            # reference behavior: download the COCO v6.0 checkpoint when no
            # --weight is given (networks/yolo.py:14-17)
            from vehicle_counting_tpu.utils.download import get_model_weights

            weight = get_model_weights(variant)
        if weight:
            from vehicle_counting_tpu.models.convert import load_yolov5_weights

            self.yolo_params = load_yolov5_weights(weight)
            nc = self.yolo_params["24"]["m"][0]["b"].shape[0] // 3 - 5
        else:
            print("[pipeline] no weights available; using random-init detector")
            nc = 80
            self.yolo_params = init_yolov5(jax.random.PRNGKey(0), YoloConfig(variant=variant, num_classes=nc))
        self.ycfg = YoloConfig(variant=variant, num_classes=nc)

        # ---- class mapping -------------------------------------------------
        mapping: Optional[Dict[int, int]] = getattr(args, "mapping_dict", None)
        if mapping is None and nc > 8:
            # COCO checkpoints need the vehicle mapping to keep per-class
            # tracker count sane; the reference CLI ships the same dict
            # (run.py:38-46).
            mapping = COCO_VEHICLE_MAPPING
        if mapping:
            self.class_names = list(VEHICLE_CLASS_NAMES)[: max(mapping.values()) + 1]
            lut = np.full((nc,), -1, np.int32)
            for src, dst in mapping.items():
                lut[src] = dst
        else:
            self.class_names = [str(i) for i in range(nc)]
            lut = np.arange(nc, dtype=np.int32)
        self.class_lut = jnp.asarray(lut)
        self.num_classes = len(self.class_names)

        # ---- ReID ----------------------------------------------------------
        ckpt = self.cam_config.checkpoint or self.config.reid_checkpoint
        if ckpt and os.path.exists(ckpt):
            self.reid_params, self.reid_stats = load_reid_weights(ckpt)
        else:
            self.reid_params, self.reid_stats = init_reid(jax.random.PRNGKey(1))

        # ---- shapes / thresholds ------------------------------------------
        image_size = self.config.image_size or [640, 640]
        self.image_size = (int(image_size[0]), int(image_size[1]))
        # default: AutoShape's stride-aligned minimal pad — what the
        # reference's network actually sees (networks/yolo.py:70 calls
        # AutoShape with no size; 720p -> 384x640, not the 640 square).
        # square_letterbox: true in configs.yaml restores the square pad.
        self.square_letterbox = bool(getattr(self.config, "square_letterbox", None))
        self.conf_thres = float(self.config.min_conf or 0.25)
        self.iou_thres = float(self.config.min_iou or 0.45)
        self.max_det = int(self.config.max_det) if (self.config.max_det or 0) > 0 else 300
        self.batch_size = int(self.config.detect_batch or 8)
        self.capacity = int(self.config.max_tracks_per_class or 64)
        self.dtype = jnp.float32 if self.config.compute_dtype == "float32" else jnp.bfloat16

        if os.path.isdir(self.video_path):
            self.all_video_paths = list_videos(self.video_path)
        else:
            self.all_video_paths = [self.video_path]

        # ---- observability (SURVEY.md §5 tracing/profiling) -----------------
        self.debug = bool(getattr(args, "debug", False))
        profile = getattr(args, "profile", None)
        self.profile_dir = (
            None if not profile
            else (profile if isinstance(profile, str) else "/tmp/vct_trace")
        )
        self.check_numerics = bool(getattr(args, "check_numerics", False))
        if self.check_numerics:
            # numeric sanitizer: XLA re-runs the offending op de-optimized and
            # raises at the first NaN produced inside the jitted step
            jax.config.update("jax_debug_nans", True)
        self.last_timer = None  # StageTimer of the most recent run_video

        self._DeepSortParams = DeepSortParams
        self._TrackerParams = TrackerParams
        self._init_states = init_states

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def get_cam_name(path: str) -> str:
        return os.path.basename(path)[:-4]  # modules/__init__.py:23-26

    def net_hw(self, src_hw):
        """Static detector input shape for a video's source shape."""
        from vehicle_counting_tpu.ops.letterbox import autoshape_hw

        if self.square_letterbox:
            return self.image_size
        return autoshape_hw(src_hw, self.image_size)

    def _cam_params(self, cam_name: str):
        cams = self.cam_config.cam or {}
        cfg = cams.get(cam_name) or cams.get("default")
        tc = (cfg or {}).get("tracking_config", {})
        tracker = self._TrackerParams(
            capacity=self.capacity,
            feat_dim=512,
            budget=int(tc.get("NN_BUDGET", 60)),
            pending_cap=8,
            max_dist=float(tc.get("MAX_DIST", 0.2)),
            max_iou_distance=float(tc.get("MAX_IOU_DISTANCE", 0.6)),
            max_age=int(tc.get("MAX_AGE", 30)),
            n_init=int(tc.get("N_INIT", 3)),
            # bf16 storage is bit-identical on TPU (the appearance dot rounds
            # to bf16 regardless) and saves a whole-gallery conversion copy
            # per frame; full f32 when the pipeline computes in f32
            feat_dtype=(
                "float32" if self.config.compute_dtype == "float32" else "bfloat16"
            ),
        )
        return self._DeepSortParams(
            tracker=tracker,
            num_classes=self.num_classes,
            min_confidence=float(tc.get("MIN_CONFIDENCE", 0.25)),
            nms_max_overlap=float(tc.get("NMS_MAX_OVERLAP", 0.5)),
        )

    # -- main ----------------------------------------------------------------
    def run_video(self, video_path: str, visualize: bool = True) -> Dict:
        """Process one video; returns {'csv': path, 'counts': {...}, 'fps': float}."""
        import time

        import jax
        import jax.numpy as jnp

        from vehicle_counting_tpu.utils.profiling import StageTimer, trace

        cam_name = self.get_cam_name(video_path)
        reader = VideoReader(video_path, batch_size=self.batch_size)
        info = reader.video_info
        hp = self._cam_params(cam_name)
        states = self._init_states(hp)

        zone_file = os.path.join(self.zone_path, cam_name + ".json")
        counter = VehicleCounter(self.class_names, zone_file)

        timer = StageTimer()
        self.last_timer = timer
        rows = {"frames": [], "tracks": [], "labels": [], "boxes": []}
        num_frames = 0
        t_start = time.perf_counter()

        # thin upload: host-letterbox to the detector size so the PCIe/tunnel
        # transfer shrinks ~(src_area / dst_area); crops come from the
        # letterboxed frame, coordinates stay in source pixels
        thin = self.config.thin_upload
        thin = True if thin is None else bool(thin)

        from vehicle_counting_tpu.ops.letterbox import (
            content_upload_exact,
            host_letterbox_yuv420,
        )
        from vehicle_counting_tpu.utils.transfer import parallel_device_put

        # ship only the letterbox content rows when that's bit-exact (~1.8x
        # less transfer at 720p->640; the device re-inserts the gray padding)
        net_hw = self.net_hw((info["height"], info["width"]))
        content_only = thin and content_upload_exact(
            (info["height"], info["width"]), net_hw
        )

        # frame-parallel single-camera scale-out (config `frame_parallel`):
        # shard the batch's frames over ALL devices for the detect+embed
        # stages, tracker scan replicated on the gathered results
        # (parallel/frames.py). No-op on one device.
        fp_step = None
        fp_shard = None
        if self.config.frame_parallel:
            n_dev = len(jax.devices())
            if n_dev > 1 and self.batch_size % n_dev == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from vehicle_counting_tpu.parallel.frames import make_framedp_step
                from vehicle_counting_tpu.parallel.mesh import make_mesh

                fp_step = make_framedp_step(
                    make_mesh(None, axis_names=("frame",)),
                    ycfg=self.ycfg, hp=hp, image_size=net_hw,
                    src_hw=(info["height"], info["width"]),
                    conf_thres=self.conf_thres, iou_thres=self.iou_thres,
                    max_det=self.max_det, dtype=self.dtype,
                    frames_format="letterboxed_yuv420" if thin else "raw_rgb",
                )
                # upload frames already sharded over the 'frame' axis: a
                # default-device put would commit the full pixel batch to one
                # device and the shard_map jit would then reshard it — an
                # extra copy through the bottleneck host->device link
                fp_shard = NamedSharding(fp_step.mesh, P("frame"))
            elif n_dev > 1:
                print(
                    f"[pipeline] frame_parallel skipped: detect_batch "
                    f"{self.batch_size} not divisible by {n_dev} devices"
                )

        it = reader.batches()

        def fetch():
            with timer.stage("decode"):
                return next(it, None)

        def prep(batch):
            """Letterbox + upload (runs in the prefetch worker thread so the
            whole host side overlaps device compute; its stage times overlap
            the main thread's dispatch/readback stages)."""
            frames, frame_ids, valid = batch
            if thin:
                with timer.stage("letterbox"):
                    frames = host_letterbox_yuv420(
                        frames, net_hw, content_only=content_only
                    )
            with timer.stage("upload"):
                if fp_shard is not None:
                    fdev = jax.device_put(frames, fp_shard)
                else:
                    fdev = parallel_device_put(frames)
            return fdev, frame_ids, valid

        def drain(pending):
            """Read back one batch's (small) track outputs into rows."""
            nonlocal num_frames
            touts, frame_ids, valid = pending
            with timer.stage("readback"):
                mask = np.asarray(touts.mask)    # [B, C, K]
                ids = np.asarray(touts.ids)
                boxes = np.asarray(touts.boxes)
            if self.check_numerics and not np.isfinite(boxes[mask]).all():
                raise FloatingPointError(
                    f"non-finite track boxes in batch at frame {frame_ids[0]}"
                )
            num_frames += int(valid.sum())
            self.frames_done = num_frames  # progress probe (benchmarks/soak.py)
            b, c, k = np.nonzero(mask)
            if b.size:
                rows["frames"].extend(np.asarray(frame_ids)[b].tolist())
                rows["tracks"].extend(ids[b, c, k].tolist())
                rows["labels"].extend(c.tolist())
                rows["boxes"].extend(boxes[b, c, k])

        # prefetch pipeline: host letterbox + upload run one batch ahead in a
        # thread; readback lags one batch — decode/prep/transfer/compute/
        # readback all overlap instead of serializing per batch.
        import contextlib

        from vehicle_counting_tpu.pipeline import step as step_mod

        profile_ctx = (
            trace(self.profile_dir) if self.profile_dir else contextlib.nullcontext()
        )
        pending = None
        with profile_ctx:
            for fdev, frame_ids, valid in prefetch(fetch, prep):
                with timer.stage("dispatch"):
                    if fp_step is not None:
                        states, det, touts = fp_step(
                            self.yolo_params, self.reid_params, self.reid_stats,
                            self.class_lut, states, fdev, jnp.asarray(valid),
                        )
                    else:
                        states, det, touts = step_mod.pipeline_batch_step(
                            self.yolo_params, self.reid_params, self.reid_stats, states,
                            fdev, jnp.asarray(valid), self.class_lut,
                            ycfg=self.ycfg, hp=hp,
                            image_size=net_hw, src_hw=(info["height"], info["width"]),
                            conf_thres=self.conf_thres, iou_thres=self.iou_thres,
                            max_det=self.max_det, dtype=self.dtype,
                            frames_format="letterboxed_yuv420" if thin else "raw_rgb",
                        )
                if pending is not None:
                    drain(pending)
                pending = (touts, frame_ids, valid)
            if pending is not None:
                drain(pending)
        if self.profile_dir:
            print(f"[profile] jax trace written to {self.profile_dir}")

        elapsed = time.perf_counter() - t_start
        reader_fps = num_frames / elapsed if elapsed > 0 else 0.0

        csv_path = os.path.join(self.saved_path, cam_name + ".csv")
        with timer.stage("count"):
            counter.run(rows["frames"], rows["tracks"], rows["labels"],
                        np.asarray(rows["boxes"]) if rows["boxes"] else np.zeros((0, 4)),
                        output_path=csv_path)

        counts = {}
        import pandas as pd

        df = pd.read_csv(csv_path)
        if len(df):
            counts = {k: v.tolist() for k, v in count_directions(df, self.num_classes).items()}

        if visualize:
            with timer.stage("visualize"):
                reader.reinitialize_stream()
                writer = VideoWriter(info, os.path.join(self.saved_path, cam_name + ".mp4"))
                visualize_merged(reader, csv_path, counter.directions, counter.polygons,
                                 self.num_classes, writer)
                writer.release()
        reader.release()
        if self.debug:
            print(f"[debug] {cam_name} per-stage timing "
                  f"(decode/letterbox/upload overlap dispatch/readback):\n{timer.summary()}")
        return {"csv": csv_path, "counts": counts, "fps": reader_fps, "frames": num_frames}

    def run_video_detect_only(self, video_path: str) -> Dict:
        """Detection-only pass (BASELINE config 1): per-frame detections CSV.

        Columns: frame_id, x1, y1, x2, y2, score, label — one row per
        detection in source pixels. Same overlap structure as run_video
        (prefetch worker letterboxes + uploads one batch ahead, readback
        lags one batch) and the same thin-upload I420 pixel path, so the
        measured fps is the detector's, not a serialization artifact.
        """
        import time

        import jax.numpy as jnp
        import pandas as pd

        from vehicle_counting_tpu.pipeline.step import detect_only_step
        from vehicle_counting_tpu.ops.letterbox import (
            content_upload_exact,
            host_letterbox_yuv420,
        )
        from vehicle_counting_tpu.utils.transfer import parallel_device_put

        cam_name = self.get_cam_name(video_path)
        reader = VideoReader(video_path, batch_size=self.batch_size)
        info = reader.video_info
        src_hw = (info["height"], info["width"])
        net_hw = self.net_hw(src_hw)
        content_only = content_upload_exact(src_hw, net_hw)

        # frame-parallel detect-only: detection is a pure per-frame map, so
        # uploading the batch frame-sharded lets GSPMD partition the jitted
        # detect step over all devices — no shard_map needed (the multichip
        # dryrun step 3 proves this lowering at the flagship geometry)
        fp_shard = None
        if self.config.frame_parallel:
            import jax

            n_dev = len(jax.devices())
            if n_dev > 1 and self.batch_size % n_dev == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from vehicle_counting_tpu.parallel.mesh import make_mesh

                fp_shard = NamedSharding(
                    make_mesh(None, axis_names=("frame",)), P("frame")
                )
            elif n_dev > 1:
                print(
                    f"[pipeline] frame_parallel skipped: detect_batch "
                    f"{self.batch_size} not divisible by {n_dev} devices"
                )
        rows = {k: [] for k in ("frame_id", "x1", "y1", "x2", "y2", "score", "label")}
        lut = np.asarray(self.class_lut)
        num_frames = 0
        t0 = time.perf_counter()

        it = reader.batches()

        def fetch():
            return next(it, None)

        def prep(batch):
            frames, frame_ids, valid = batch
            yuv = host_letterbox_yuv420(frames, net_hw, content_only=content_only)
            if fp_shard is not None:
                import jax

                return jax.device_put(yuv, fp_shard), frame_ids, valid
            return parallel_device_put(yuv), frame_ids, valid

        def drain(pending_):
            nonlocal num_frames
            out, frame_ids, valid = pending_
            boxes = np.asarray(out["boxes"])
            scores = np.asarray(out["scores"])
            classes = np.asarray(out["classes"])
            ok = np.asarray(out["valid"])
            num_frames += int(valid.sum())
            for b in range(len(valid)):
                if not valid[b]:
                    continue
                for i in np.where(ok[b])[0]:
                    mapped = lut[classes[b, i]] if classes[b, i] < len(lut) else -1
                    if mapped < 0:
                        continue
                    rows["frame_id"].append(int(frame_ids[b]))
                    rows["x1"].append(float(boxes[b, i, 0]))
                    rows["y1"].append(float(boxes[b, i, 1]))
                    rows["x2"].append(float(boxes[b, i, 2]))
                    rows["y2"].append(float(boxes[b, i, 3]))
                    rows["score"].append(float(scores[b, i]))
                    rows["label"].append(int(mapped))

        pending = None
        for ydev, frame_ids, valid in prefetch(fetch, prep):
            out = detect_only_step(
                self.yolo_params, ydev,
                ycfg=self.ycfg, image_size=net_hw, src_hw=src_hw,
                conf_thres=self.conf_thres, iou_thres=self.iou_thres,
                max_det=self.max_det, dtype=self.dtype,
                content_only=content_only,
            )
            if pending is not None:
                drain(pending)
            pending = (out, frame_ids, valid)
        if pending is not None:
            drain(pending)

        elapsed = time.perf_counter() - t0
        csv_path = os.path.join(self.saved_path, cam_name + "_detections.csv")
        pd.DataFrame(rows).to_csv(csv_path, index=False)
        reader.release()
        return {"csv": csv_path, "frames": num_frames,
                "fps": num_frames / elapsed if elapsed > 0 else 0.0}

    def run(self, visualize: bool = True) -> List[Dict]:
        results = []
        for video_path in self.all_video_paths:
            try:
                results.append(self.run_video(video_path, visualize=visualize))
            except Exception as e:  # per-video isolation (SURVEY.md §5 failure handling)
                print(f"[pipeline] ERROR on {video_path}: {e}")
                results.append({"csv": None, "error": str(e), "video": video_path})
        return results
