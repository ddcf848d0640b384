"""On-chip micro-benchmark: XLA row-gather crops vs the Pallas DMA kernel.

Measures the standalone crop gather+resize cost (the `embed_gather` stage of
stage_bench.py) for both paths at the pipeline's shapes: letterboxed
640x640 u8 source, B frames, ~30 valid detections/frame, chunks of 128.

Usage: python benchmarks/micro/crops_bench.py [--batch 32] [--dets 30]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dets", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vehicle_counting_tpu.pipeline import enable_compilation_cache

    enable_compilation_cache()

    from vehicle_counting_tpu.ops.crops import gather_crops_batch
    from vehicle_counting_tpu.ops.pallas.crops import (
        gather_crops_batch_pallas,
        pallas_crops_supported,
    )

    b, k = args.batch, args.dets
    h = w = 640
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    )
    n_crops = b * k
    fidx = jnp.asarray(np.repeat(np.arange(b), k), jnp.int32)
    cx = rng.uniform(60, w - 60, n_crops)
    cy = rng.uniform(60, h - 60, n_crops)
    bw = rng.uniform(20, 80, n_crops)
    bh = rng.uniform(20, 80, n_crops)
    boxes = jnp.asarray(
        np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    valid = jnp.ones((n_crops,), bool)

    print(f"backend={jax.default_backend()} B={b} dets={k} "
          f"pallas_supported={pallas_crops_supported()}")

    @jax.jit
    def xla_path(fr, fi, bx, v):
        return gather_crops_batch(fr, fi, bx, v, dtype=jnp.bfloat16).sum()

    @jax.jit
    def pallas_path(fr, fi, bx, v):
        fp = jnp.transpose(fr, (0, 3, 1, 2))
        return gather_crops_batch_pallas(
            fp, fi, bx, v, dtype=jnp.bfloat16
        ).sum()

    def time_ms(fn):
        out = fn(frames, fidx, boxes, valid)
        np.asarray(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = fn(frames, fidx, boxes, valid)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0 / (b * args.chain)

    ms_x = time_ms(xla_path)
    print(f"  xla row-gather   {ms_x:7.3f} ms/frame")
    if pallas_crops_supported():
        ms_p = time_ms(pallas_path)
        print(f"  pallas DMA       {ms_p:7.3f} ms/frame ({ms_x / ms_p:.2f}x)")
        # value check on-chip
        a = np.asarray(xla_path(frames, fidx, boxes, valid))
        p = np.asarray(pallas_path(frames, fidx, boxes, valid))
        print(f"  sums: xla={a:.6f} pallas={p:.6f} (bf16 col weights)")


if __name__ == "__main__":
    main()
