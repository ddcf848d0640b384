"""YOLO layer-1 conv (3x3/s2 32->64 @ 320x320): XLA vs the Pallas kernel.

Round-3 roofline: this is the ONE detect conv shape XLA runs far off
roofline (54.0 us/frame at 31 TF/s; HBM floor ~12.2 us/frame, MXU floor
~9.6). ops/pallas/conv_s2.py attacks it with quad lane packing + one
block-structured vreg-aligned [16Q, 768] @ [768, 128] matmul per 16-row
band (an earlier [16Q, 480] sub-vreg form measured 77 us/frame).

MEASURED RESULT (v5e, B=128): XLA 36.3/35.7 vs Pallas 70.3/68.0 us/frame
— the kernel LOSES 1.9x; see the conv_s2.py docstring for the analysis.

Timing per CLAUDE.md rules: chained dispatches per readback to amortize the
tunnel dispatch floor; correctness asserted on-chip first (tolerance — the
kernel's f32 accumulation order differs from the XLA conv's).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.pipeline import enable_compilation_cache

enable_compilation_cache()

from vehicle_counting_tpu.models.layers import conv_block
from vehicle_counting_tpu.ops.pallas.conv_s2 import conv1_s2_silu_pallas

B, H, W = (int(a) for a in (sys.argv[1:4] or [128, 320, 320]))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, 32)) * 0.5, jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.1, jnp.float32)
b = jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32)
params = {"w": w, "b": b}


def xla(x):
    return conv_block(params, x, stride=2, dtype=jnp.bfloat16)


def pallas(x):
    return conv1_s2_silu_pallas(x, w, b)


# on-chip correctness first (tolerance: summation-order only)
r0 = np.asarray(jax.jit(xla)(x[:2]), np.float32)
r1 = np.asarray(jax.jit(pallas)(x[:2]), np.float32)
rel = np.abs(r0 - r1) / np.maximum(np.abs(r0), 1e-2)
print(f"on-chip parity: max rel {rel.max():.2e}  "
      f"bitwise frac {(r0 == r1).mean():.6f}")
assert rel.max() < 0.05, "kernel does not match the XLA conv"


def run(fn, name, reps=8):
    f = jax.jit(lambda x: fn(x).astype(jnp.float32).sum())
    np.asarray(f(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(x)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    per_frame = best / reps / B * 1e6
    print(f"{name:24s} {per_frame:8.2f} us/frame")


run(xla, "xla conv_block")
run(pallas, "pallas conv1_s2")
run(xla, "xla conv_block (again)")
run(pallas, "pallas conv1_s2 (again)")
