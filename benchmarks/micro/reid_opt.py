#!/usr/bin/env python
"""Probe ReID CNN inference-layout options on the current backend.

The bf16 embed_cnn profile (stage_bench --reid_dtype bfloat16) shows
~265 us/frame at B=128/30 crops with the stem maxpool (reduce_window, f32)
as the single largest op (44.5 us/frame) and conv fusions that materialize
f32 buffers between blocks. Bandwidth speed-of-light for the activations is
~60-110 us/frame, so we test:

  base   current reid_forward, dtype=bf16
  poolbf cast to bf16 BEFORE the stem maxpool (exact: max commutes with the
         monotone bf16 rounding; the next conv casts anyway)
  blockbf poolbf + cast block outputs to bf16 at the producer (residual
         passthrough becomes bf16 -- tiny numeric shift on the bf16 path
         only; the f32 parity path is untouched)
  slicemax blockbf + maxpool decomposed into 9 strided-slice maxes

MEASURED OUTCOME (v5e, 2026-08-18): on the monolithic 3840-crop forward the
producer casts win (296 -> 244 us/frame; slicemax loses badly, 456). But in
the PIPELINE's chunked embed path (stage_bench --stages embed, bf16) the
same change REGRESSES: 0.298 -> 0.313 ms/frame at max_embed=128 and
0.364 -> 0.390 at 64 — at chunk-sized batches XLA's existing convert
placement is already better and the extra producer converts add fusion
boundaries. NOT adopted in models/reid.py (see ROADMAP negative results).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from vehicle_counting_tpu.models.reid import init_reid, reid_forward
    from vehicle_counting_tpu.models import reid as reid_mod
    from vehicle_counting_tpu.models.layers import conv2d, max_pool

    B, K = 128, 30
    N = B * K
    params, stats = init_reid(jax.random.PRNGKey(1))
    params = jax.device_put(params)
    stats = jax.device_put(stats)
    rng = np.random.default_rng(0)
    crops = jax.device_put(
        jnp.asarray(rng.normal(size=(N, 50, 50, 3)), jnp.float32)
    )

    dt = jnp.bfloat16

    def fwd_variant(p, s, x, *, pool_cast, block_cast, slice_pool):
        def mp(y):
            if slice_pool:
                # 3x3/s2/p1 maxpool as 9 shifted strided views
                ypad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                               constant_values=-np.inf)
                h, w = y.shape[1], y.shape[2]
                oh, ow = (h + 1) // 2, (w + 1) // 2
                out = None
                for dy in range(3):
                    for dx in range(3):
                        v = jax.lax.slice(
                            ypad,
                            (0, dy, dx, 0),
                            (ypad.shape[0], dy + 2 * oh - 1, dx + 2 * ow - 1,
                             ypad.shape[3]),
                            (1, 2, 2, 1),
                        )
                        out = v if out is None else jnp.maximum(out, v)
                return out
            return max_pool(y, 3, 2, 1)

        def bn(x_, pp, ss):
            inv = jax.lax.rsqrt(ss["var"] + 1e-5)
            return (x_ - ss["mean"]) * inv * pp["scale"] + pp["bias"]

        y = conv2d(x, p["stem"]["w"], dtype=dt) + p["stem"]["b"]
        y = jax.nn.relu(bn(y, p["stem"]["bn"], s["stem"]))
        if pool_cast:
            y = y.astype(dt)
        y = mp(y)

        from vehicle_counting_tpu.models.reid import STAGES

        for si, (cin, cout, ds) in enumerate(STAGES):
            for bi in range(2):
                name = f"layer{si + 1}_{bi}"
                stride = 2 if (ds and bi == 0) else 1
                pp, ss = p[name], s[name]
                z = conv2d(y, pp["conv1"]["w"], stride=stride, dtype=dt)
                z = jax.nn.relu(bn(z, pp["bn1"], ss["bn1"]))
                z = conv2d(z, pp["conv2"]["w"], dtype=dt)
                z = bn(z, pp["bn2"], ss["bn2"])
                if "down" in pp:
                    xx = conv2d(y, pp["down"]["w"], stride=stride, padding=0, dtype=dt)
                    xx = bn(xx, pp["down"]["bn"], ss["down"])
                else:
                    xx = y
                y = jax.nn.relu(xx + z)
                if block_cast:
                    y = y.astype(dt)

        y = jax.lax.reduce_window(
            y.astype(jnp.float32), 0.0, jax.lax.add, (1, 4, 4, 1), (1, 1, 1, 1), "VALID"
        ) / 16.0
        emb = y.reshape(y.shape[0], -1)
        nrm = jnp.linalg.norm(emb, axis=1, keepdims=True)
        return emb / jnp.maximum(nrm, 1e-12)

    variants = {
        "base": jax.jit(lambda p, s, x: reid_forward(p, s, x, train=False, reid=True, dtype=dt)[0]),
        "poolbf": jax.jit(lambda p, s, x: fwd_variant(p, s, x, pool_cast=True, block_cast=False, slice_pool=False)),
        "blockbf": jax.jit(lambda p, s, x: fwd_variant(p, s, x, pool_cast=True, block_cast=True, slice_pool=False)),
        "slicemax": jax.jit(lambda p, s, x: fwd_variant(p, s, x, pool_cast=True, block_cast=True, slice_pool=True)),
    }
    # re-derive base through fwd_variant to confirm the restatement matches
    variants["restate"] = jax.jit(
        lambda p, s, x: fwd_variant(p, s, x, pool_cast=False, block_cast=False, slice_pool=False)
    )

    ref = np.asarray(variants["base"](params, stats, crops))
    for name, fn in variants.items():
        out = np.asarray(fn(params, stats, crops))
        err = float(np.abs(out - ref).max())
        # time: chain 8 dispatches per sync
        fn(params, stats, crops)
        np.asarray(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            o = None
            for _ in range(8):
                o = fn(params, stats, crops)
            np.asarray(o[0, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:10s} {best * 1e6 / (8 * B):7.1f} us/frame   max|d-base|={err:.2e}")


if __name__ == "__main__":
    main()
