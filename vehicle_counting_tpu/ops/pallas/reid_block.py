"""Fused ReID stage-1 BasicBlock (conv3x3+BN+ReLU ×2 + residual) in Pallas.

The production e2e profile (round 3) shows the two 64-channel stage-1
blocks at 25x25 costing ~96 us/frame (B=128, 30 crops/frame) at ~57 TF/s
effective — the MXU lane ceiling at c_out=64 is 98.5 TF/s, so the blocks
run at ~58% of even the halved peak. MEASURED CONCLUSION (round 3, two
kernel generations): the blocks are at their MXU floor, not a VPU or HBM
one — this kernel's first version (9 shift-copies + 9 mask-multiplies
per conv) measured a WASH vs XLA at the production config (embed_cnn
0.300 vs 0.299 ms/frame, bf16 chunk-64 B=128), and the current version
below, which HALVES the patch-build VPU work (gap-padded crops + 2
pre-masked arrays instead of 9 per-tap masks), measures a wash AGAIN
(0.301 vs 0.301; G=8 per step 0.304). Cutting VPU work bought nothing,
so the ~57 TF/s effective is the practical ceiling of the c_out=64
matmul stream on this chip, and XLA's lowering already sits on it.
Default stays OFF (FORCE_PALLAS_REID_BLOCK=1 re-enables); the kernel
stays for future shapes/hardware and as the measured record.

Kernel design (the cheapest VPU sequence we found):

  * activations live as [pixels (y*25+x, sublanes), 64 (channels, lanes)]
    — a free XLA reshape from [N, 25, 25, 64];
  * crops are merged on the sublane axis with a 25-pixel ZERO GAP between
    consecutive crops (crop pitch 650 = 625 content + 25 zeros, padded in
    XLA where it is free). Every 3x3 tap shift s = 25*(dy-1)+(dx-1) that
    crosses a crop's top/bottom border then lands in zero rows — the
    pad-1 semantics — so NO per-tap same-crop masks are needed;
  * x-border wraps are killed by pre-masking just TWO arrays once per
    conv: vl = v * (x != 24) feeds the dx=0 taps (an output column 0
    would wrap onto the previous row's x=24, which no in-range output
    reads through dx=0), and vr = v * (x != 0) feeds the dx=2 taps
    (symmetric). dx=1 taps read v unmasked. This replaces the first
    version's 9 shift-copies + 9 mask-multiplies per conv with 2
    mask-multiplies + 9 shifted-slice concats — about half the VPU work;
  * each conv is one [G*650, 576] @ [576, 64] MXU matmul with f32
    accumulation (same operand dtypes as the XLA bf16 conv; summation
    order differs, so outputs match to conv tolerance, not bitwise);
  * inference BN folds to y = x*a + b (a = rsqrt(var+eps)*scale,
    b = bias - mean*a) in f32 like models/reid._bn; gap rows are
    re-zeroed after conv1's ReLU (they must act as conv2's zero pad) and
    left as don't-care in the output (the XLA wrapper slices them off).

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
P = S * S              # 625 content pixels on sublanes
GAP = S                # zero rows between crops (pad-1 semantics for dy)
PP = P + GAP           # crop pitch on the merged sublane axis
C = 64                 # channels on lanes
G = 4                  # crops per grid step (bf16 patches [G*650, 576] +
                       # activations fit comfortably in the 16 MB scoped
                       # VMEM; f32 patches OOM'd at G=8 in the first
                       # version — bf16-only callers enforced in
                       # models/reid's dispatch)


def _block_kernel(x_ref, w1_ref, w2_ref, ab_ref, out_ref, *, use_bf16: bool):
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    gp = G * PP

    pm = jax.lax.broadcasted_iota(jnp.int32, (gp, C), 0)
    q = pm - (pm // PP) * PP           # within-crop merged row index
    x_of_q = q - (q // S) * S          # within-row x (don't-care in gaps)
    ml = (x_of_q != S - 1).astype(cdt)  # feeds dx=0 taps
    mr = (x_of_q != 0).astype(cdt)      # feeds dx=2 taps
    gm = (q < P).astype(cdt)            # content rows (re-zero gaps)

    a1 = ab_ref[0, 0:1, :]  # [1, C] f32 folded-BN rows
    b1 = ab_ref[0, 1:2, :]
    a2 = ab_ref[0, 2:3, :]
    b2 = ab_ref[0, 3:4, :]

    def patches(v):  # v [G*PP, C] cdt, gap rows zero -> [G*PP, 9*C]
        vl = v * ml
        vr = v * mr
        src = (vl, v, vr)
        slabs = []
        for dy in range(3):
            for dx in range(3):
                s = S * (dy - 1) + (dx - 1)
                b = src[dx]
                if s > 0:
                    sh = jnp.concatenate(
                        [b[s:, :], jnp.zeros((s, C), cdt)], axis=0
                    )
                elif s < 0:
                    sh = jnp.concatenate(
                        [jnp.zeros((-s, C), cdt), b[: gp + s, :]], axis=0
                    )
                else:
                    sh = b
                slabs.append(sh)
        return jnp.concatenate(slabs, axis=1)  # [G*PP, 9C]

    xg = x_ref[...].astype(cdt)  # [G*PP, C] (crops merged + gap-padded in
    # XLA — an in-kernel [G, PP, C] -> [G*PP, C] reshape is a Mosaic
    # "unsupported shape cast": PP is not sublane-aligned)
    h1 = jax.lax.dot(
        patches(xg), w1_ref[...].astype(cdt),
        preferred_element_type=jnp.float32,
    )
    h1 = jnp.maximum(
        h1 * jnp.broadcast_to(a1, (gp, C)) + jnp.broadcast_to(b1, (gp, C)),
        0.0,
    ).astype(cdt)
    # gap rows must stay zero: they are conv2's top/bottom pad
    h1 = h1 * gm
    h2 = jax.lax.dot(
        patches(h1), w2_ref[...].astype(cdt),
        preferred_element_type=jnp.float32,
    )
    y = (
        h2 * jnp.broadcast_to(a2, (gp, C))
        + jnp.broadcast_to(b2, (gp, C))
        + xg.astype(jnp.float32)
    )
    # output gap rows are don't-care (sliced off by the wrapper)
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
    # gap-pad each crop to pitch PP, then merge on the sublane axis OUTSIDE
    # the kernel (row-major pad+merge, free in XLA; in-kernel it would be
    # an unsupported Mosaic shape cast)
    xf = jnp.pad(xf, ((0, 0), (0, GAP), (0, 0)))
    xf = xf.reshape((n + pad) * PP, C)
    w1p = w1.reshape(9 * C, C)
    w2p = w2.reshape(9 * C, C)
    ab = jnp.stack(
        [a1, b1, a2, b2], axis=0
    ).astype(jnp.float32)[None]  # [1, 4, C]

    out = pl.pallas_call(
        partial(_block_kernel, use_bf16=use_bf16),
        grid=((n + pad) // G,),
        in_specs=[
            pl.BlockSpec((G * PP, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G * PP, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(((n + pad) * PP, C), x.dtype),
        interpret=interpret,
    )(xf, w1p, w2p, ab)
    return out.reshape(n + pad, PP, C)[:n, :P].reshape(n, S, S, C)


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
