"""Probe: layer-1 conv (3x3/s2 32->64 @320) as space-to-depth + 2x2/s1 conv.

A stride-2 3x3 conv is exactly a stride-1 2x2 conv over the space-to-depth
(block 2x2) view: phase-packed channels 2*2*32=128, weights [2,2,128,64]
with 9 of 16 tap positions nonzero. 128-channel convs are the regime XLA
runs near roofline on this chip (round-3 roofline table), vs 31 TF/s for
the native 32-channel layout. Cost: 512/288 = 1.78x padded FLOPs + the
space-to-depth transpose (which XLA may or may not fuse).

MEASURED RESULT (v5e, B=128): native 36.6/36.9 vs s2d 62.1/60.5 us/frame
— the s2d form LOSES 1.7x; XLA's native layer-1 lowering stands.
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

B, H, W = (int(a) for a in (sys.argv[1:4] or [128, 320, 320]))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, 32)) * 0.5, jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.1, jnp.float32)
b = jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32)
params = {"w": w, "b": b}


def xla(x):
    return conv_block(params, x, stride=2, dtype=jnp.bfloat16)


def pack_w_s2d(w):
    # w [3,3,32,64] -> w2 [2,2,128,64]; phase (py,px) block (by,bx):
    # input row 2y+2*by-2+py relative tap dy = 2*(by-1)+py+1... derive:
    # out(y,x) taps in(2y+dy-1, 2x+dx-1), dy,dx in 0..2 (pad 1).
    # s2d block index by covers rows {2(y-1+by), 2(y-1+by)+1} with pad
    # block at by=0. Row 2y+dy-1 = 2(y-1+by)+py  =>  dy = 2*by+py-1.
    w2 = jnp.zeros((2, 2, 2, 2, 32, 64), w.dtype)  # [by,bx,py,px,ci,co]
    for by in range(2):
        for py in range(2):
            dy = 2 * by + py - 1
            if not 0 <= dy <= 2:
                continue
            for bx in range(2):
                for px in range(2):
                    dx = 2 * bx + px - 1
                    if not 0 <= dx <= 2:
                        continue
                    w2 = w2.at[by, bx, py, px].set(w[dy, dx])
    return w2.reshape(2, 2, 128, 64)


w2 = pack_w_s2d(w)


def s2d(x):
    bsz, h, wd, c = x.shape
    xb = x.reshape(bsz, h // 2, 2, wd // 2, 2, c)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, h // 2, wd // 2, 4 * c)
    y = jax.lax.conv_general_dilated(
        xb.astype(jnp.bfloat16),
        w2.astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b.astype(jnp.float32)
    y = jax.nn.silu(y)
    return y.astype(jnp.bfloat16)


r0 = np.asarray(jax.jit(xla)(x[:2]), np.float32)
r1 = np.asarray(jax.jit(s2d)(x[:2]), np.float32)
rel = np.abs(r0 - r1) / np.maximum(np.abs(r0), 1e-2)
print(f"parity: max rel {rel.max():.2e}  bitwise frac {(r0 == r1).mean():.6f}")
assert rel.max() < 0.05


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
    print(f"{name:24s} {best / reps / B * 1e6:8.2f} us/frame")


run(xla, "xla native 3x3/s2")
run(s2d, "xla s2d 2x2/s1")
run(xla, "xla native (again)")
run(s2d, "xla s2d (again)")
