"""int8 vs bf16 conv throughput on representative YOLOv5s shapes.

v5e's MXU peaks at ~394 int8 TOP/s vs ~197 bf16 TF/s, and the detect
stack's big mid convs sit at their bf16 compute roofline (ROADMAP r4). If
XLA lowers int8 convs at the 2x rate, a quantized serving mode buys real
device time. This measures the END-TO-END replacement cost per block:

  bf16:  conv(bf16, f32 accum) + bias + SiLU -> bf16        (today's block)
  int8:  conv(int8 -> int32) + scale*bias dequant + SiLU -> requantize int8

i.e. the int8 loop carries the quantize-for-the-next-layer cost, like a
real quantized network would. Each variant loops the block `--iters` times
inside ONE jit (cin==cout shapes feed back), so the tunnel dispatch floor
amortizes out; time comes from np.asarray readback of a 1-element reduce.

Kill criteria (pre-committed): adopt an int8 detect path only if the big
mid-stack shapes show >= 1.3x; otherwise record the negative and stop.

    python benchmarks/micro/int8_conv.py [--iters 24] [--reps 4]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

# (label, B, H, W, C, k)  — yolov5s @ 384x640, B=128 equivalents; C==Cout
SHAPES = [
    ("c3_64 @96x160 3x3", 128, 96, 160, 64, 3),
    ("c3_128 @48x80 3x3", 128, 48, 80, 128, 3),
    ("c3_256 @24x40 3x3", 128, 24, 40, 256, 3),
    ("c3_512 @12x20 3x3", 128, 12, 20, 512, 3),
    ("pw_256 @24x40 1x1", 128, 24, 40, 256, 1),
]
DN = ("NHWC", "HWIO", "NHWC")


def bf16_block(y, w, b):
    z = jax.lax.conv_general_dilated(
        y, w, (1, 1), [(w.shape[0] // 2,) * 2] * 2, dimension_numbers=DN,
        preferred_element_type=jnp.float32)
    return jax.nn.silu(z + b).astype(jnp.bfloat16)


def int8_block(y, w, b, sx, sw):
    z = jax.lax.conv_general_dilated(
        y, w, (1, 1), [(w.shape[0] // 2,) * 2] * 2, dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    zf = jax.nn.silu(z.astype(jnp.float32) * (sx * sw) + b)
    # requantize for the next layer (per-tensor symmetric)
    return jnp.clip(jnp.round(zf * 16.0), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def loop(y, w, b, *, iters: int, mode: str):
    def body(_, y):
        if mode == "bf16":
            return bf16_block(y, w, b)
        return int8_block(y, w, b, 1.0 / 16.0, 0.01)

    y = jax.lax.fori_loop(0, iters, body, y)
    return jnp.float32(y.astype(jnp.float32).sum())


def run(label, B, H, W, C, k, iters, reps):
    rng = np.random.default_rng(0)
    flops = 2.0 * B * H * W * C * C * k * k * iters
    rows = {}
    for mode in ("bf16", "int8"):
        if mode == "bf16":
            y = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
            w = jnp.asarray(rng.normal(0, 0.05, (k, k, C, C)), jnp.bfloat16)
        else:
            y = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
            w = jnp.asarray(rng.integers(-127, 128, (k, k, C, C)), jnp.int8)
        b = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        np.asarray(loop(y, w, b, iters=iters, mode=mode))  # compile+warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(y, w, b, iters=iters, mode=mode))
            best = min(best, time.perf_counter() - t0)
        rows[mode] = best
        print(f"  {mode}: {best * 1e3:8.2f} ms  {flops / best / 1e12:7.1f} T{'F' if mode == 'bf16' else 'OP'}/s")
    print(f"  -> int8 speedup x{rows['bf16'] / rows['int8']:.2f}   [{label}]")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for shape in SHAPES:
        print(f"{shape[0]}: x[{shape[1]},{shape[2]},{shape[3]},{shape[4]}]")
        run(*shape, args.iters, args.reps)


if __name__ == "__main__":
    main()
