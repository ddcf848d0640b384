"""ReID stem(+pool) fuse: kill-criteria measurement BEFORE writing a kernel.

VERDICT r3 next-5 allows ONE bounded stem+pool(+layer1) Pallas attempt with
pre-committed kill criteria. The reid_block record (two measured washes)
already pinned the chip constant that decides this: the c_out=64 MXU matmul
stream tops out at ~57 TF/s effective (ops/pallas/reid_block.py header).
A fused stem kernel following the proven [pixels-on-sublanes, channels-on-
lanes] patch design would pay a [G*pitch, 27->128-lane-padded] @ [128, 64]
matmul — 41 MFLOP/crop padded (vs 8.6 real) — BEFORE any patch-build VPU
work or the pool. This script measures:

  1. the XLA baseline: stem conv+bias+BN+ReLU+maxpool exactly as
     models/reid.reid_forward runs it, at the production chunk config;
  2. the padded-K stem matmul floor: [G*2500, 128] @ [128, 64] bf16 —
     the cheapest possible MXU cost of the kernel's conv, with ZERO
     patch-build/pool cost attached;
  3. the same floor for a hypothetical layer1-merged kernel's stem part.

KILL RULE (pre-committed): if (2) alone is >= ~70% of (1), the kernel
cannot meaningfully win even with a free patch build — formally close the
stem chapter in ROADMAP instead of writing a third kernel.

MEASURED OUTCOME (v5e, round 4) — chapter CLOSED, stem stays on XLA:
    XLA stem+bias+BN+relu+maxpool                    86-89 us/frame
    kernel stem matmul floor (K=128 pad / K=32)      26 us/frame
    XLA conv with c_in zero-padded to 8/16/32        89 us/frame (no change)
    XLA im2col dot [.,27]@[27,64] + pool            180 us/frame (2x worse)
    XLA im2col dot + strided-max pool               392 us/frame
The matmul floor passes the 70% rule, but the PATCH BUILD kills every
implementable packing: (a) vreg-aligned 128-lane tap slabs multiply K to
1152 (9x floor = 230 us); 32-lane slabs to 288 (2.25x = 57 us); (b) an
exact 27-lane build needs per-tap lane rolls + masks on [2550, 128] tiles
— 27 vector ops/crop = 264 M element-ops/frame at 30 crops, >= ~70
us/frame AT VPU PEAK, 3.5x over the pre-committed 20 us/frame patch-build
kill bar before a line of Mosaic is written (reid_block's cheap patch
concat relied on half-vreg 64-lane slabs; 3-lane slabs have no aligned
form); (c) the K-on-sublanes form (W [64, 27] @ patches^T with pixels on
lanes) makes the patch build ~free but emits [64ch, pixels] planar output
whose transpose back to [pixels, 64] for layer1 costs a one-hot matmul
larger than the conv itself. XLA's conv (86 us, ~3x its own roofline due
to the c_in=3 stream) remains the best implementable form on this chip.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.pipeline import enable_compilation_cache

enable_compilation_cache()

from vehicle_counting_tpu.models.layers import conv2d, max_pool
from vehicle_counting_tpu.models.reid import _bn, init_reid

N = 3840          # crops/run (B=128 x 30 dets/frame)
FRAMES = N // 30
rng = np.random.default_rng(0)
crops = jnp.asarray(rng.standard_normal((N, 50, 50, 3)), jnp.float32)
params, stats = init_reid(jax.random.PRNGKey(0))


def run(fn, name, *args):
    f = jax.jit(fn)
    np.asarray(f(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            r = f(*args)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    per_frame = best / 8 / FRAMES * 1e6
    print(f"{name:44s} {per_frame:8.1f} us/frame")
    return per_frame


# 1. XLA baseline: the production stem+pool (bf16 convs, f32 BN)
def stem_pool(x):
    y = conv2d(x, params["stem"]["w"], dtype=jnp.bfloat16) + params["stem"]["b"]
    y, _ = _bn(y, params["stem"]["bn"], stats["stem"], False)
    y = jax.nn.relu(y)
    return max_pool(y, 3, 2, 1).sum(dtype=jnp.float32)


# 2. padded-K matmul floor: what the kernel's conv MUST cost at minimum.
#   [N*2500, 128] @ [128, 64] bf16, f32 accumulation. The lhs is
#   materialized once OUTSIDE the timed region? No - a real kernel builds
#   patches in VMEM per step, but we charge ZERO for that here; the MXU
#   stream cost is what we measure, so the lhs is a constant input.
lhs = jnp.asarray(
    rng.standard_normal((N * 2500 // 8, 128)), jnp.bfloat16
)  # 1/8 of the pixels per call, x8 calls below keeps the buffer sane
w128 = jnp.asarray(rng.standard_normal((128, 64)), jnp.bfloat16)


def stem_matmul_floor(a, w):
    return jax.lax.dot(
        a, w, preferred_element_type=jnp.float32
    ).sum(dtype=jnp.float32)


# 3. exact-K (un-padded 32-lane) variant for reference — the MXU still
#   processes K=128 per pass, so this should measure the same.
lhs32 = lhs[:, :32]
w32 = w128[:32]

# Pure-XLA restructurings (exact by construction; measured before any
# Mosaic work — reid_block's lesson is that kernel fights end in washes):


def stem_pool_cpad(cin_pad):
    """Zero-pad input channels 3 -> cin_pad (x + 0*w == x exactly): does
    XLA's conv engine run faster at a friendlier c_in?"""
    wz = jnp.zeros((3, 3, cin_pad, 64), jnp.float32)
    wz = wz.at[:, :, :3, :].set(params["stem"]["w"])

    def fn(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad - 3)))
        y = conv2d(xp, wz, dtype=jnp.bfloat16) + params["stem"]["b"]
        y, _ = _bn(y, params["stem"]["bn"], stats["stem"], False)
        y = jax.nn.relu(y)
        return max_pool(y, 3, 2, 1).sum(dtype=jnp.float32)

    return fn


def stem_pool_im2col(x):
    """stem conv as an explicit [N*2500, 27] @ [27, 64] dot (XLA-built
    patches): same bf16 operands, f32 accumulation; summation order
    differs from the conv lowering (conv tolerance, like reid_block)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.bfloat16)
    slabs = [
        xp[:, dy : dy + 50, dx : dx + 50, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(slabs, axis=-1).reshape(N * 2500, 27)
    wf = params["stem"]["w"].reshape(27, 64).astype(jnp.bfloat16)
    y = jax.lax.dot(patches, wf, preferred_element_type=jnp.float32)
    y = y.reshape(N, 50, 50, 64) + params["stem"]["b"]
    y, _ = _bn(y, params["stem"]["bn"], stats["stem"], False)
    y = jax.nn.relu(y)
    return max_pool(y, 3, 2, 1).sum(dtype=jnp.float32)


def stem_pool_im2col_pooledfirst(x):
    """im2col dot + pool expressed as max of 9 strided views of the conv
    output (identical values; lets XLA pick a different fusion shape)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.bfloat16)
    slabs = [
        xp[:, dy : dy + 50, dx : dx + 50, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(slabs, axis=-1).reshape(N * 2500, 27)
    wf = params["stem"]["w"].reshape(27, 64).astype(jnp.bfloat16)
    y = jax.lax.dot(patches, wf, preferred_element_type=jnp.float32)
    y = y.reshape(N, 50, 50, 64) + params["stem"]["b"]
    y, _ = _bn(y, params["stem"]["bn"], stats["stem"], False)
    y = jax.nn.relu(y)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    m = None
    for dy in range(3):
        for dx in range(3):
            v = yp[:, dy : dy + 50 : 2, dx : dx + 50 : 2, :]
            m = v if m is None else jnp.maximum(m, v)
    return m.sum(dtype=jnp.float32)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  N={N} crops ({FRAMES} frames)")
    base = run(stem_pool, "XLA stem+bias+BN+relu+maxpool", crops)

    def floor8(a, w):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(8):
            acc = acc + stem_matmul_floor(a, w)
        return acc

    f_pad = run(floor8, "kernel stem matmul floor (K=128 pad)", lhs, w128)
    f_32 = run(floor8, "kernel stem matmul floor (K=32)", lhs32, w32)
    print(
        f"kill rule: floor {f_pad:.1f} vs 0.7 * baseline "
        f"{0.7 * base:.1f} -> {'KILL' if f_pad >= 0.7 * base else 'proceed'}"
    )
    for cp in (8, 16, 32):
        run(stem_pool_cpad(cp), f"XLA conv, c_in zero-padded to {cp}", crops)
    run(stem_pool_im2col, "XLA im2col dot [.,27]@[27,64] + pool", crops)
    run(stem_pool_im2col_pooledfirst, "XLA im2col dot + strided-max pool", crops)
