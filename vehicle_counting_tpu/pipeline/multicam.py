"""Concurrent multi-camera counting over a device mesh.

The reference processes a directory of videos strictly one-by-one
(modules/__init__.py:29). TPU-native scale-out (SURVEY.md §5): all cameras
step TOGETHER — one device batch per round carries `batch` frames from EVERY
camera, sharded over the mesh 'cam' axis via parallel/cameras.py, so N chips
process N cameras' pipelines concurrently with zero collectives. Host keeps
one reader/accumulator per camera; cameras that run out of frames ride along
with valid=False until the longest video finishes.

Constraint: cameras in one group share frame geometry and DeepSORT
hyper-parameters (one compiled program). Mixed fleets are split into groups
automatically — run() partitions the videos by (frame geometry, per-camera
tracking_config) and runs one concurrent loop per group, so each camera gets
EXACTLY its own cam_configs.yaml hyper-parameters (the reference's per-video
DeepSORT params, modules/__init__.py:34-38), never camera 0's.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


class MultiCamCountingPipeline:
    """Camera-concurrent variant of CountingPipeline (same artifacts)."""

    def __init__(self, args, config=None, cam_config=None, mesh=None):
        from vehicle_counting_tpu.pipeline import CountingPipeline

        # reuse all of CountingPipeline's construction (detector, reid, maps)
        self.base = CountingPipeline(args, config, cam_config)
        self.mesh = mesh

    def run(self, visualize: bool = False) -> List[Dict]:
        """Partition videos into (geometry, hyper-param) groups and run each
        group's concurrent loop; results return in the original path order."""
        from vehicle_counting_tpu.data import VideoReader

        base = self.base
        paths = base.all_video_paths
        if not paths:
            return []
        results: List[Dict] = [None] * len(paths)
        readers, cam_names = {}, {}
        groups: Dict[tuple, List[int]] = {}
        for i, p in enumerate(paths):
            try:
                # per-video isolation at open time too (serial loop contract)
                readers[i] = VideoReader(p, batch_size=base.batch_size)
            except Exception as e:
                results[i] = {"csv": None, "error": str(e), "video": p,
                              "camera": base.get_cam_name(p)}
                continue
            cam_names[i] = base.get_cam_name(p)
            info = readers[i].video_info
            key = ((info["height"], info["width"]), base._cam_params(cam_names[i]))
            groups.setdefault(key, []).append(i)
        for (_, hp), idxs in groups.items():
            try:
                group_res = self._run_group(
                    [readers[i] for i in idxs], [cam_names[i] for i in idxs],
                    hp, visualize=visualize,
                )
            except Exception as e:
                # group-level fault isolation: a failure inside one group's
                # compute loop (decode/letterbox error surfacing via the
                # producer future, a device fault) must not sink the other
                # groups; record per-camera errors and release the readers
                group_res = [
                    {"csv": None, "error": str(e), "camera": cam_names[i],
                     "video": readers[i].video_path}
                    for i in idxs
                ]
                for i in idxs:
                    try:
                        readers[i].release()
                    except Exception:
                        pass
            for i, res in zip(idxs, group_res):
                results[i] = res
        return results

    def _run_group(self, readers, cam_names, hp, visualize: bool = False) -> List[Dict]:
        import jax
        import jax.numpy as jnp

        from vehicle_counting_tpu.counting import VehicleCounter, count_directions
        from vehicle_counting_tpu.data import VideoWriter
        from vehicle_counting_tpu.parallel.cameras import multicam_batch_step
        from vehicle_counting_tpu.parallel.mesh import make_mesh

        base = self.base
        n_cam = len(readers)
        mesh = self.mesh or make_mesh(None, axis_names=("cam",))
        n_dev = mesh.devices.size
        # pad camera count to a multiple of the mesh size
        pad_cams = (-n_cam) % n_dev

        infos = [r.video_info for r in readers]
        h, w = infos[0]["height"], infos[0]["width"]

        one = base._init_states(hp)
        total = n_cam + pad_cams
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (total,) + x.shape).copy(), one
        )

        # a camera with a missing/bad zone file still rides through the
        # compute loop (frames are shared work); it fails alone at output
        counters, counter_errors = [], []
        for c in cam_names:
            try:
                counters.append(VehicleCounter(
                    base.class_names, os.path.join(base.zone_path, c + ".json")))
                counter_errors.append(None)
            except Exception as e:
                counters.append(None)
                counter_errors.append(e)
        rows = [
            {"frames": [], "tracks": [], "labels": [], "boxes": []} for _ in range(n_cam)
        ]
        iters = [r.batches() for r in readers]
        done = [False] * n_cam
        b = base.batch_size

        from concurrent.futures import ThreadPoolExecutor

        from vehicle_counting_tpu.ops.letterbox import (
            content_rows,
            content_upload_exact,
            host_letterbox_yuv420,
        )

        # thin upload (same policy as CountingPipeline.run_video): host
        # letterbox to content-row I420 when bit-exact for this geometry
        thin = base.config.thin_upload
        thin = True if thin is None else bool(thin)
        net_hw = base.net_hw((h, w))
        content_only = thin and content_upload_exact((h, w), net_hw)
        if thin:
            dh, dw = net_hw
            ch = content_rows((h, w), net_hw)[1] if content_only else dh
            frame_shape = (total, b, ch * 3 // 2, dw)
            frames_format = "letterboxed_yuv420"
        else:
            frame_shape = (total, b, h, w, 3)
            frames_format = "raw_rgb"

        # upload frames pre-sharded over the 'cam' axis: a default-device
        # put would commit every camera's pixels to one device and the
        # shard_map jit would then reshard them — an extra full copy
        # through the bottleneck host->device link (no-op at mesh size 1)
        cam_shard = None
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            cam_shard = NamedSharding(mesh, P("cam"))

        def produce():
            """Decode all cameras' next batches (worker thread overlaps compute)."""
            frames = np.zeros(frame_shape, np.uint8)
            ids = np.zeros((total, b), np.int64)
            valid = np.zeros((total, b), bool)
            for i, it in enumerate(iters):
                if done[i]:
                    continue
                try:
                    f, fid, v = next(it)
                    if thin:
                        f = host_letterbox_yuv420(
                            f, net_hw, content_only=content_only
                        )
                    frames[i], ids[i], valid[i] = f, fid, v
                except StopIteration:
                    done[i] = True
            if not valid.any():
                return None
            if cam_shard is not None:
                return jax.device_put(frames, cam_shard), ids, valid
            from vehicle_counting_tpu.utils.transfer import parallel_device_put

            return parallel_device_put(frames), ids, valid

        def drain(pending):
            touts, ids = pending
            mask = np.asarray(touts.mask)   # [total, B, C, K]
            tids = np.asarray(touts.ids)
            boxes = np.asarray(touts.boxes)
            # vectorized per camera: one nonzero + fancy-index per batch
            # instead of a Python loop per track row (matters at high
            # camera counts where the drain runs on the host critical path)
            for i in range(n_cam):
                bb, c, k = np.nonzero(mask[i])
                if not bb.size:
                    continue
                rows[i]["frames"].extend(ids[i, bb].tolist())
                rows[i]["tracks"].extend(tids[i, bb, c, k].tolist())
                rows[i]["labels"].extend(c.tolist())
                rows[i]["boxes"].extend(boxes[i, bb, c, k])

        pool = ThreadPoolExecutor(max_workers=1)
        pending = None
        try:
            fut = pool.submit(produce)
            while True:
                produced = fut.result()
                if produced is None:
                    break
                fdev, ids, valid = produced
                fut = pool.submit(produce)
                states, touts = multicam_batch_step(
                    mesh, base.yolo_params, base.reid_params, base.reid_stats,
                    states, fdev, jnp.asarray(valid), base.class_lut,
                    ycfg=base.ycfg, hp=hp, image_size=net_hw, src_hw=(h, w),
                    conf_thres=base.conf_thres, iou_thres=base.iou_thres,
                    max_det=base.max_det, dtype=base.dtype,
                    frames_format=frames_format,
                )
                if pending is not None:
                    drain(pending)
                pending = (touts, ids)
            if pending is not None:
                drain(pending)
        finally:
            pool.shutdown()

        results = []
        import pandas as pd

        for i, cam in enumerate(cam_names):
            # per-camera fault isolation, same contract as the serial loop
            # (pipeline/__init__.py — SURVEY.md §5 failure handling): one
            # camera's bad zone file / render error doesn't sink its group
            try:
                if counter_errors[i] is not None:
                    raise counter_errors[i]
                csv_path = os.path.join(base.saved_path, cam + ".csv")
                counters[i].run(
                    rows[i]["frames"], rows[i]["tracks"], rows[i]["labels"],
                    np.asarray(rows[i]["boxes"]) if rows[i]["boxes"] else np.zeros((0, 4)),
                    output_path=csv_path,
                )
                df = pd.read_csv(csv_path)
                counts = (
                    {k: v.tolist() for k, v in count_directions(df, base.num_classes).items()}
                    if len(df)
                    else {}
                )
                if visualize:
                    from vehicle_counting_tpu.counting.visualize import visualize_merged

                    readers[i].reinitialize_stream()
                    writer = VideoWriter(infos[i], os.path.join(base.saved_path, cam + ".mp4"))
                    visualize_merged(readers[i], csv_path, counters[i].directions,
                                     counters[i].polygons, base.num_classes, writer)
                    writer.release()
                results.append({"csv": csv_path, "counts": counts, "camera": cam})
            except Exception as e:
                results.append({"csv": None, "error": str(e), "camera": cam,
                                "video": readers[i].video_path})
            finally:
                readers[i].release()
        return results
