"""Experiment: space-to-depth stem conv vs direct 6x6/s2 conv on v5e.

A 6x6/s2/p2 conv on [B,640,640,3] is exactly a 3x3/s1/p1 conv on the
2x2-space-to-depth input [B,320,320,12] with permuted weights. Measure both.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    B = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 640, 640, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((6, 6, 3, 32)) * 0.1, jnp.bfloat16)

    @jax.jit
    def direct(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).sum()

    # s2d: out pixel (i,j) covers input rows 2i-2..2i+3 = blocks i-1..i+1 at
    # phase u%2; weight tap (u,v) on channel c maps to block tap
    # ((u+2)//2-1? ...) — build w2 by scatter from the direct weights:
    # in[2i+u-2, 2j+v-2] = blocked[i + (u-2+2)//2 - ... ] — do it by brute
    # force index map: u-2 = 2*du + pu with pu in {0,1}: du = (u-2)>>1 ... u-2
    # in [-2,3] -> (u-2): -2->du=-1,pu=0; -1->du=-1,pu=1; 0->0,0; 1->0,1;
    # 2->1,0; 3->1,1. So block tap p = du+1 in 0..2, channel = (pu, pv, c).
    w2 = np.zeros((3, 3, 12, 32), np.float32)
    wh = np.asarray(w, np.float32)
    for u in range(6):
        du, pu = divmod(u - 2 + 2, 2)  # (u-2+2)=u: du = u>>1, pu = u&1
        for v in range(6):
            dv, pv = divmod(v, 2)
            w2[du, dv, (pu * 2 + pv) * 3:(pu * 2 + pv) * 3 + 3, :] = wh[u, v, :, :]
    w2 = jnp.asarray(w2, jnp.bfloat16)

    @jax.jit
    def s2d(x, w2):
        b, h, wd, c = x.shape
        xb = x.reshape(b, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xb = xb.reshape(b, h // 2, wd // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            xb, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).sum()

    # correctness first (small slice, f32)
    ref = np.asarray(direct(x[:1], w), np.float64)
    got = np.asarray(s2d(x[:1], w2), np.float64)
    print("equiv rel err:", abs(ref - got) / max(abs(ref), 1e-9))

    def bench(f, *args):
        out = f(*args)
        np.asarray(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best / 8 / B * 1e6  # us/frame

    print(f"direct 6x6/s2 : {bench(direct, x, w):8.1f} us/frame")
    print(f"s2d 3x3       : {bench(s2d, x, w2):8.1f} us/frame")


if __name__ == "__main__":
    main()
