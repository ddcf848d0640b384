"""On-chip micro-benchmark: exact top-k variants for the detect tail.

fused_detect_tail (models/detector.py) needs the top pre_nms_topk=512
score-sorted candidates of A~25200 anchors per image. Variants (all EXACT,
including lax.top_k's lower-index tie rule):

  topk        current: lax.top_k([B, A], 512)
  twophase    reshape A -> [G, S] groups, per-group top_k(512), then
              top_k over the G*512 merged candidates. Exact: every global
              top-512 element is in its group's top-512; merged ties keep
              ascending original index because groups are index-ordered and
              within-group top_k is index-ordered (stable re-merge by
              carrying original indices).

Usage: python benchmarks/micro/topk_bench.py [--batch 32]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--a", type=int, default=25200)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vehicle_counting_tpu.pipeline import enable_compilation_cache

    enable_compilation_cache()

    b, a, k, g = args.batch, args.a, args.k, args.groups
    rng = np.random.default_rng(0)
    # realistic detect-tail distribution: most scores fail the conf gate
    # (masked to -1), a few hundred positives
    sc = np.full((b, a), -1.0, np.float32)
    for i in range(b):
        pos = rng.choice(a, size=300, replace=False)
        sc[i, pos] = rng.uniform(0.0, 1.0, 300).astype(np.float32)
    scores = jax.device_put(jnp.asarray(sc))

    @jax.jit
    def topk(s):
        v, i = jax.lax.top_k(s, k)
        return v.sum() + i.sum()

    s_pad = g * ((a + g - 1) // g)

    @jax.jit
    def twophase(s):
        sp = jnp.pad(s, ((0, 0), (0, s_pad - a)), constant_values=-jnp.inf)
        grp = sp.reshape(b, g, s_pad // g)
        v1, i1 = jax.lax.top_k(grp, k)  # [B, G, k] per-group
        base = (jnp.arange(g, dtype=jnp.int32) * (s_pad // g))[None, :, None]
        iorig = i1 + base
        vf = v1.reshape(b, g * k)
        iorigf = iorig.reshape(b, g * k)
        v2, i2 = jax.lax.top_k(vf, k)
        # exact tie parity: merged positions are ordered by (group,
        # in-group rank) == ascending original index among equal values,
        # so phase 2's lower-position tie rule reproduces the global
        # lower-index rule (proven + tested in models/detector.exact_topk)
        idx = jnp.take_along_axis(iorigf, i2, axis=1)
        return v2.sum() + idx.sum()

    def time_ms(fn):
        out = fn(scores)
        np.asarray(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = fn(scores)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0 / (b * args.chain)

    print(f"backend={jax.default_backend()} B={b} A={a} k={k} G={g}")
    print(f"  lax.top_k        {time_ms(topk):7.3f} ms/frame")
    print(f"  two-phase        {time_ms(twophase):7.3f} ms/frame")


if __name__ == "__main__":
    main()
