"""On-chip micro-bench: YUV420->u8 RGB conversion variants (all EXACT).

The pipeline's pixel path (pipeline/step.py) converts letterboxed I420 to
uint8 RGB once per batch (yuv420_to_rgb + astype(uint8), ~40 us/frame of
the detect stage at B=128). Variants must produce IDENTICAL u8 outputs:

  v0  current: f32 cast -> f32 2x2 chroma repeat -> combos -> clip -> stack
      -> u8
  v1  chroma repeat in u8 BEFORE the cast (repeat/cast commute exactly)
  v2  v1 + per-channel u8 conversion before the stack (clip+cast fuse into
      each combo; the [B,H,W,3] materialization happens in u8 not f32)

Usage: python benchmarks/micro/yuv_bench.py [--batch 128]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vehicle_counting_tpu.pipeline import enable_compilation_cache

    enable_compilation_cache()
    from vehicle_counting_tpu.ops.letterbox import yuv420_to_rgb

    b, h, w = args.batch, 640, 640
    rng = np.random.default_rng(0)
    yuv = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (b, h * 3 // 2, w), np.uint8))
    )

    @jax.jit
    def v0(x):
        return yuv420_to_rgb(x).astype(jnp.uint8)

    def upsample_u8(c):  # [B, H/2, W/2] u8 -> [B, H, W] u8, nearest
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

    @jax.jit
    def v1(x):
        y = (x[:, :h, :].astype(jnp.float32) - 16.0) * 1.163999557
        u8_ = x[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
        v8_ = x[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
        u = upsample_u8(u8_).astype(jnp.float32) - 128.0
        v = upsample_u8(v8_).astype(jnp.float32) - 128.0
        r = y + 1.596026612 * v
        g = y - 0.391762290 * u - 0.812967647 * v
        bl = y + 2.017232143 * u
        return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0).astype(
            jnp.uint8
        )

    @jax.jit
    def v2(x):
        y = (x[:, :h, :].astype(jnp.float32) - 16.0) * 1.163999557
        u8_ = x[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
        v8_ = x[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
        u = upsample_u8(u8_).astype(jnp.float32) - 128.0
        v = upsample_u8(v8_).astype(jnp.float32) - 128.0
        r = jnp.clip(y + 1.596026612 * v, 0.0, 255.0).astype(jnp.uint8)
        g = jnp.clip(
            y - 0.391762290 * u - 0.812967647 * v, 0.0, 255.0
        ).astype(jnp.uint8)
        bl = jnp.clip(y + 2.017232143 * u, 0.0, 255.0).astype(jnp.uint8)
        return jnp.stack([r, g, bl], axis=-1)

    def t(fn):
        out = fn(yuv)
        np.asarray(out[0, :1, :1])
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = fn(yuv)
            np.asarray(out[0, :1, :1])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / (b * args.chain)

    r0, r1, r2 = v0(yuv), v1(yuv), v2(yuv)
    print("v1 == v0:", bool(jnp.array_equal(r0, r1)))
    print("v2 == v0:", bool(jnp.array_equal(r0, r2)))
    print(f"v0 current        {t(v0):7.4f} ms/frame")
    print(f"v1 u8 upsample    {t(v1):7.4f} ms/frame")
    print(f"v2 + u8 channels  {t(v2):7.4f} ms/frame")


if __name__ == "__main__":
    main()
