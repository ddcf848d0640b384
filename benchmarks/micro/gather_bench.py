"""Microbench: row-gather variants for the ReID crop path on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

B, H, W = 128, 640, 640
D = 30 * B  # crops per batch
OH = 50

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8))
fidx = jnp.asarray(rng.integers(0, B, size=(D,), dtype=np.int32))
yidx = jnp.asarray(rng.integers(0, H, size=(D, 2 * OH), dtype=np.int32))


@jax.jit
def g_2level(frames, fidx, yidx):
    return frames[fidx[:, None], yidx]  # [D, 2OH, W, 3]


@jax.jit
def g_flat(frames, fidx, yidx):
    ff = frames.reshape(B * H, W, 3)
    return ff[fidx[:, None] * H + yidx]


@jax.jit
def g_flat_i32(frames, fidx, yidx):
    ff = jax.lax.bitcast_convert_type(
        frames.reshape(B * H, W * 3 // 4, 4), jnp.int32
    )  # [B*H, W*3/4] i32... bitcast adds trailing dim handling
    rows = ff[fidx[:, None] * H + yidx]
    return rows


def timeit(f, *args):
    o = f(*args)
    np.asarray(jax.tree.leaves(o)[0][0, 0, 0])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(8):
            o = f(*args)
        np.asarray(jax.tree.leaves(o)[0][0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 8)
    return best * 1e6 / B  # us/frame


print("2level  :", round(timeit(g_2level, frames, fidx, yidx), 1), "us/frame")
print("flat    :", round(timeit(g_flat, frames, fidx, yidx), 1), "us/frame")
try:
    print("flat_i32:", round(timeit(g_flat_i32, frames, fidx, yidx), 1), "us/frame")
except Exception as e:
    print("flat_i32 failed:", str(e)[:200])
