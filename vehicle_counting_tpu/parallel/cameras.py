"""Camera-parallel pipeline: whole per-camera tracker pipelines over a mesh.

Each camera's detect+track stream is independent (the reference processes
videos strictly serially, modules/__init__.py:29-101); here N cameras run
concurrently, sharded over the mesh 'cam' axis with `shard_map`. No
collectives are needed — each shard runs the full fused batch step on its
own cameras, with model params replicated. Inside a shard, local cameras
are processed by a lax.scan so the tracker's cond-based cascade skipping
stays real control flow (a vmap would turn it into executed-both-ways
selects).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vehicle_counting_tpu.models.yolo import YoloConfig
from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
from vehicle_counting_tpu.tracking.deepsort import DeepSortParams


# memoized: multicam_batch_step runs once per batch in the multicam drive
# loop; a fresh shard_map+jit wrapper per batch would RETRACE the whole
# flagship program every batch (jit caches are keyed on function identity —
# measured seconds/batch of pure host retrace before this cache)
@functools.lru_cache(maxsize=32)
def make_multicam_step(
    mesh: Mesh,
    *,
    ycfg: YoloConfig,
    hp: DeepSortParams,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "raw_rgb",
):
    """The jitted camera-sharded step with static config bound.

    Returned callable: (yolo_params, reid_params, reid_stats, class_lut,
    states, frames, frame_valid) -> (new_states, track_outs); exposing the
    jit directly (rather than applying it, as multicam_batch_step does) is
    what serving/artifact.py needs to AOT-export the multi-chip program.
    """

    def local(yolo_p, reid_p, reid_s, lut, states_l, frames_l, valid_l):
        def body(_, xs):
            st, fr, va = xs
            st2, _det, touts = pipeline_batch_step.__wrapped__(
                yolo_p, reid_p, reid_s, st, fr, va, lut,
                ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
                conf_thres=conf_thres, iou_thres=iou_thres,
                max_det=max_det, dtype=dtype, frames_format=frames_format,
            )
            return None, (st2, touts)

        _, (new_states, touts) = jax.lax.scan(body, None, (states_l, frames_l, valid_l))
        return new_states, touts

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("cam"), P("cam"), P("cam")),
        out_specs=(P("cam"), P("cam")),
        check_vma=False,
    )
    return jax.jit(sharded)


def multicam_batch_step(
    mesh: Mesh,
    yolo_params,
    reid_params,
    reid_stats,
    states,          # stacked per-camera TrackerState: leaves [N_cam, C, ...]
    frames,          # [N_cam, B, H, W, 3]
    frame_valid,     # [N_cam, B]
    class_lut,       # [nc]
    *,
    ycfg: YoloConfig,
    hp: DeepSortParams,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "raw_rgb",
):
    """One batch step for every camera at once, cameras sharded over 'cam'."""
    step = make_multicam_step(
        mesh, ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        dtype=dtype, frames_format=frames_format,
    )
    return step(
        yolo_params, reid_params, reid_stats, class_lut, states, frames, frame_valid
    )
