"""Fused ReID stage-1 BasicBlock (conv3x3+BN+ReLU ×2 + residual) in Pallas.

The production e2e profile (round 3) shows the two 64-channel 3x3 convs at
25x25 costing ~93 us/frame (B=128, 30 crops/frame) at ~15% of MXU peak and
~340 GiB/s — 8x off both rooflines. The culprit is layout: XLA's conv
lowering materializes each conv's input/output through HBM in a tiling that
the odd 25x25 spatial + 64-channel minor dim serve badly. This kernel keeps
the WHOLE residual block in VMEM per crop group and sidesteps the im2col
relayout wall with a spatial-on-sublanes layout:

  * activations live as [625 (y*25+x, sublanes), 64 (channels, lanes)] —
    a free XLA reshape from [N, 25, 25, 64];
  * a 3x3 tap shift is then a SUBLANE shift by 25*(dy-1) + (dx-1) (zero
    fill handles the y border; a precomputed {0,1} column mask handles the
    x border), so the im2col patch matrix [625, 576] is 9 shifted copies
    lane-concatenated — no lane<->sublane relayout anywhere;
  * each conv is one [625, 576] @ [576, 64] MXU matmul with f32
    accumulation (same operand dtypes as the XLA bf16 conv; summation
    order differs, so outputs match to conv tolerance, not bitwise);
  * inference BN folds to y = x*a + b (a = rsqrt(var+eps)*scale,
    b = bias - mean*a), computed in f32 like models/reid._bn.

Reference semantics: networks/deepsort/deep/model.py:12-45 BasicBlock
(inference path) of /root/reference, via models/reid._basic_block.

Mosaic notes (CLAUDE.md): lane-dim concats of 64-lane slabs build the patch
matrix; masks multiply as {0,1} bf16 (i1 vector selects do not legalize);
iota arithmetic stays i32. The grid batches G crops per step with plain
VMEM BlockSpecs (no manual DMA — blocks are contiguous).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 25                 # spatial side (50x50 crop after stem+pool)
P = S * S              # 625 pixels on sublanes
C = 64                 # channels on lanes
G = 4                  # crops per grid step (bf16 patches 2x[2500, 576] +
                       # activations must fit the 16 MB scoped VMEM; G=8
                       # f32 OOM'd at 59 MB — bf16-only callers enforced
                       # in models/reid's dispatch)


def _shift_mask_tables():
    """Static (dy, dx) -> (sublane shift, x-border validity mask)."""
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append((25 * (dy - 1) + (dx - 1), dx - 1))
    return taps


def _block_kernel(x_ref, w1_ref, w2_ref, ab_ref, out_ref, *, use_bf16: bool):
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    taps = _shift_mask_tables()
    gp = G * P

    # All G crops merged on the sublane axis [G*P, C]: a tap shift is one
    # sublane shift of the merged array, with a per-tap {0,1} mask zeroing
    # rows whose shifted source crosses a crop or x border (the first
    # per-crop-serial version of this kernel measured SLOWER than XLA —
    # 0.352 vs 0.300 ms/frame embed_cnn — because G small patch builds and
    # matmuls serialized; merged, the VPU work runs once and each conv is
    # a single [G*625, 576] @ [576, 64] MXU matmul per step).
    pm = jax.lax.broadcasted_iota(jnp.int32, (gp, C), 0)
    p_in = pm - (pm // P) * P          # within-crop pixel index
    x_of_p = p_in - (p_in // S) * S    # within-row x
    masks = []
    for s, dxm in taps:
        ok = (x_of_p + dxm >= 0) & (x_of_p + dxm <= S - 1)
        # same-crop condition for the sublane shift by s
        if s > 0:
            ok = ok & (p_in < P - s)
        elif s < 0:
            ok = ok & (p_in >= -s)
        masks.append(ok.astype(cdt))

    a1 = ab_ref[0, 0:1, :]  # [1, C] f32 folded-BN rows
    b1 = ab_ref[0, 1:2, :]
    a2 = ab_ref[0, 2:3, :]
    b2 = ab_ref[0, 3:4, :]

    def patches(v):  # v [G*P, C] cdt -> [G*P, 9*C]
        slabs = []
        for (s, _), m in zip(taps, masks):
            if s > 0:
                sh = jnp.concatenate(
                    [v[s:, :], jnp.zeros((s, C), cdt)], axis=0
                )
            elif s < 0:
                sh = jnp.concatenate(
                    [jnp.zeros((-s, C), cdt), v[: gp + s, :]], axis=0
                )
            else:
                sh = v
            slabs.append(sh * m)
        return jnp.concatenate(slabs, axis=1)  # [G*P, 9C]

    xg = x_ref[...].astype(cdt)  # [G*P, C] (crops merged in XLA — an
    # in-kernel [G, 625, 64] -> [2500, 64] reshape is a Mosaic
    # "unsupported shape cast": 625 is not sublane-aligned)
    h1 = jax.lax.dot(
        patches(xg), w1_ref[...].astype(cdt),
        preferred_element_type=jnp.float32,
    )
    h1 = jnp.maximum(
        h1 * jnp.broadcast_to(a1, (gp, C)) + jnp.broadcast_to(b1, (gp, C)),
        0.0,
    ).astype(cdt)
    h2 = jax.lax.dot(
        patches(h1), w2_ref[...].astype(cdt),
        preferred_element_type=jnp.float32,
    )
    y = (
        h2 * jnp.broadcast_to(a2, (gp, C))
        + jnp.broadcast_to(b2, (gp, C))
        + xg.astype(jnp.float32)
    )
    out_ref[...] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("use_bf16", "interpret"))
def reid_block64_pallas(
    x,          # [N, 25, 25, 64] activations (bf16 on TPU)
    w1,         # [3, 3, 64, 64] HWIO conv1 weights
    w2,         # [3, 3, 64, 64]
    a1, b1,     # [64] f32 folded BN1 (a = rsqrt(var+eps)*scale, b = bias - mean*a)
    a2, b2,     # [64] f32 folded BN2
    use_bf16: bool = True,
    interpret: bool = False,
):
    """relu(bn2(conv2(relu(bn1(conv1(x))))) + x), whole block in VMEM."""
    n = x.shape[0]
    pad = (-n) % G
    xf = x.reshape(n, P, C)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, P, C), xf.dtype)], axis=0)
    # crops merged on the sublane axis OUTSIDE the kernel (row-major merge,
    # free in XLA; in-kernel it would be an unsupported Mosaic shape cast)
    xf = xf.reshape((n + pad) * P, C)
    w1p = w1.reshape(9 * C, C)
    w2p = w2.reshape(9 * C, C)
    ab = jnp.stack(
        [a1, b1, a2, b2], axis=0
    ).astype(jnp.float32)[None]  # [1, 4, C]

    out = pl.pallas_call(
        partial(_block_kernel, use_bf16=use_bf16),
        grid=((n + pad) // G,),
        in_specs=[
            pl.BlockSpec((G * P, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G * P, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(((n + pad) * P, C), x.dtype),
        interpret=interpret,
    )(xf, w1p, w2p, ab)
    return out[: n * P].reshape(n, S, S, C)


_SUPPORTED = None


def pallas_reid_block_supported() -> bool:
    """Probe once whether this backend compiles + runs the block kernel."""
    global _SUPPORTED
    if _SUPPORTED is None:
        mode = os.environ.get("FORCE_PALLAS_REID_BLOCK")
        if mode == "0":
            _SUPPORTED = False
            return _SUPPORTED
        try:
            import numpy as np

            x = jnp.asarray(
                np.random.default_rng(0).standard_normal((G, S, S, C)),
                jnp.bfloat16,
            )
            w = jnp.zeros((3, 3, C, C), jnp.bfloat16)
            o = jnp.ones((C,), jnp.float32)
            z = jnp.zeros((C,), jnp.float32)
            r = reid_block64_pallas(x, w, w, o, z, o, z)
            # data READBACK, not block_until_ready: on networked backends
            # (axon) only readback synchronizes, so a compile failure would
            # otherwise surface after the probe returned True
            np.asarray(r)
            _SUPPORTED = True
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED
