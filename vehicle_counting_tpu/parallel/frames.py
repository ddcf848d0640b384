"""Frame-parallel single-camera step: detect+embed sharded over the mesh.

The reference's whole per-frame loop is serial on one GPU
(modules/__init__.py:54-84). Camera sharding (parallel/cameras.py) scales
across videos, but a SINGLE camera's throughput is capped by one chip. This
module scales the single-camera pipeline over a mesh 'frame' axis:

  - detection + ReID embedding are frame-INDEPENDENT (each frame's boxes and
    each crop's embedding never read another frame), so the batch's frames
    shard over the mesh and each device runs detect_embed_core on B/n frames
    — the expensive 80%+ of the step (detect 0.26 + embed 0.35 of 0.76
    ms/frame at the flagship geometry) scales with chips;
  - the per-frame outputs are SMALL ([B, N, 4+1+1] boxes/scores/classes plus
    [B, N, F] features — ~9 MB at B=128 vs 44 MB of input pixels), so one
    tiled all_gather over ICI rebuilds the full batch on every device;
  - the recurrent DeepSORT scan (lax.scan over frames — inherently
    sequential, the tracker state is a frame recurrence) then runs
    REPLICATED on the gathered results: every device computes the identical
    scan, so states/outputs stay replicated with no further collectives.

Numerics contract (tests/test_framedp.py pins it on the CPU mesh): integer
and boolean outputs — detected classes, NMS keeps, track IDs, masks — are
EQUAL to the single-device step run at detect_batch = B/n with states
chained (each shard's convs run at batch extent B/n on identical inputs and
measure bitwise-equal under shard_map; the chunked embed's per-crop results
do not depend on chunk composition; all_gather in axis order preserves the
frame order the scan consumes). Float outputs agree to elementwise-fusion
ULPs (~1e-5 measured): XLA fuses/FMA-contracts the decode/restore tails
differently across program boundaries, and convolutions are additionally
not bitwise-stable across batch EXTENTS (~1e-8 measured on CPU) — the exact
same dials as changing detect_batch on one device, not sharding artifacts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vehicle_counting_tpu.models.yolo import YoloConfig
from vehicle_counting_tpu.pipeline.step import detect_embed_core, tracker_scan
from vehicle_counting_tpu.tracking.deepsort import DeepSortParams

AXIS = "frame"


# memoized: callers construct the step per video/batch loop; a fresh
# shard_map+jit wrapper per call would retrace the whole program each time
# (jit caches are keyed on function identity)
@functools.lru_cache(maxsize=32)
def make_framedp_step(
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
    """The jitted frame-sharded pipeline step with static config bound.

    Returned callable:
        (yolo_params, reid_params, reid_stats, class_lut, states,
         frames [B,...], frame_valid [B]) -> (new_states, det, track_outs)
    with B divisible by the mesh's 'frame' axis size. new_states /
    track_outs are replicated; det stays frame-sharded (host readback
    gathers it transparently).
    """
    n = mesh.shape[AXIS]

    def local(yolo_p, reid_p, reid_s, lut, states, frames_l, valid_l):
        det, feats = detect_embed_core(
            yolo_p, reid_p, reid_s, frames_l, valid_l, lut,
            ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
            conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            dtype=dtype, frames_format=frames_format,
        )
        # gather the small per-frame tensors; tiled all_gather concatenates
        # in axis order == the original batch order the P('frame') in_spec
        # split, so the recurrent scan sees frames in sequence
        gather = lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True)
        det_g = {k: gather(v) for k, v in det.items()}
        new_states, track_outs = tracker_scan(
            states, det_g, gather(feats), hp=hp, src_hw=src_hw
        )
        return new_states, det, track_outs

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P(AXIS), P()),
        check_vma=False,
    )

    jitted = jax.jit(sharded)

    def step(yolo_params, reid_params, reid_stats, class_lut, states, frames,
             frame_valid):
        if frames.shape[0] % n:
            raise ValueError(
                f"frame-parallel batch size {frames.shape[0]} must be a "
                f"multiple of the mesh '{AXIS}' axis size {n}"
            )
        return jitted(
            yolo_params, reid_params, reid_stats, class_lut, states, frames,
            frame_valid,
        )

    # the raw jit, for AOT export (serving/artifact.py) — jax.export wants
    # the jitted callable, not the shape-checking wrapper
    step.jitted = jitted
    step.mesh = mesh
    return step
