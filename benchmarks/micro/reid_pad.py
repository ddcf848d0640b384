"""ReID layer-1 conv: does padding the odd 25x25 spatial to a TPU-friendly
size beat XLA's native tiling?

The production e2e trace (round 3) shows the two 3x3 64->64 convs at
[3840, 25, 25, 64] costing 46.7 + 46.2 us/frame at ~15% of MXU peak and
~340 GiB/s — 8x off both rooflines, i.e. layout/tiling overhead. Computing
the SAME conv on a zero-padded input and slicing the output back is exact:
pad=1 convs already read zeros beyond row/col 24, so output rows/cols
0..24 see identical taps (verified below), and the extra rows are dropped.
"""
import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.pipeline import enable_compilation_cache

enable_compilation_cache()

from vehicle_counting_tpu.models.layers import conv2d

N, S, C = 3840, 25, 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, S, S, C)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)


def run(fn, name):
    f = jax.jit(fn)
    r = f(x, w)
    np.asarray(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            r = f(x, w)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    per_frame = best / 8 / (N // 30) * 1e6  # 30 crops/frame
    print(f"{name:28s} {per_frame:8.1f} us/frame")
    return r


def native(x, w):
    return conv2d(x, w, dtype=jnp.bfloat16).sum(dtype=jnp.float32)


def padded(pad_to):
    def fn(x, w):
        p = pad_to - S
        xp = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)))
        y = conv2d(xp, w, dtype=jnp.bfloat16)
        return y[:, :S, :S, :].sum(dtype=jnp.float32)

    return fn


# exactness check (tiny shapes, CPU-independent): padded == native
xe = jnp.asarray(rng.standard_normal((4, S, S, C)), jnp.bfloat16)
a = conv2d(xe, w, dtype=jnp.bfloat16)
xp = jnp.pad(xe, ((0, 0), (0, 7), (0, 7), (0, 0)))
b = conv2d(xp, w, dtype=jnp.bfloat16)[:, :S, :S, :]
assert np.array_equal(np.asarray(a), np.asarray(b)), "pad-conv-slice not exact"
print("exactness: pad-conv-slice == native (bitwise)")

run(native, "native 25x25")
for pad_to in (26, 28, 32):
    run(padded(pad_to), f"padded {pad_to}x{pad_to}")
