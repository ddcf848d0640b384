"""Fused conv3x3/s2 (32->64) + bias + SiLU Pallas kernel for YOLO layer 1.

STATUS: MEASURED NEGATIVE RESULT — kept for the record, NOT wired into the
detector. On the v5e (B=128, 320x320x32 in, chained-dispatch marginal per
CLAUDE.md timing rules, benchmarks/micro/conv1_bench.py):

    xla conv_block      36.3 / 35.7 us/frame   (two runs)
    this kernel         70.3 / 68.0 us/frame   (1.9x SLOWER)

and the two design alternatives also lose:
  * an earlier [16Q, 480] patch form (sub-vreg 32-lane slab packing,
    1.67x padded FLOPs): 77.4 us/frame — sub-vreg lane shuffles dominate;
  * space-to-depth + 2x2/s1 XLA conv (128-ch regime, 1.78x padded FLOPs,
    benchmarks/micro/conv1_s2d_probe.py): 62.1/60.5 us/frame — the s2d
    transpose + padded FLOPs cost more than XLA's native-layout loss.
The wall-marginal for XLA's native lowering (36 us/frame) is also well
under the 54 us/frame xprof device-self estimate that motivated the
attack; against the ~12 us analytic floor the remaining headroom cannot
be bought with padded-FLOP MXU forms (any vreg-aligned packing of the
32-channel taps pads 1.7-2.7x, erasing the layout win). Layer-1 stays on
XLA's native conv. ROADMAP "Known gaps" updated accordingly.

Original motivation: the round-3 per-conv roofline (tools/xprof_summary
--convs, B=128 yolov5s-640) shows every detect conv at or near its
compute/HBM roofline EXCEPT layer 1 (3x3 stride-2, 32->64 at 320x320 in):
54.0 us/frame at 31 TF/s, Compute-bound — XLA's chosen layout leaves the
MXU half idle at c_out=64 and pays extra relayout passes. Analytic
floors: ~12.2 us/frame HBM (6.55 MB in + 3.28 MB out bf16 at 819 GB/s),
~9.6 us MXU.

Design (TPU-first, no im2col relayout):

  * QUAD LANE PACKING: a free XLA reshape views each input row
    [W, 32] as [W/4, 128] — four consecutive pixels' channels fill one
    128-lane vreg ("quad"). Another free reshape splits row phases:
    x5 = x.reshape(B, H/2, 2, W/4, 128) (stride-2 taps read one even row
    and two odd rows, all CONTIGUOUS slices of the phase-split view).
  * Per grid step: 16 output rows of one image. Two banded DMAs pull the
    even-row band [16, Q, 128] and odd-row band [17, Q, 128] HBM->VMEM
    (double-buffered across steps, crops.py's prestart/wait pattern).
  * The three tap-row arrays R0/R1/R2 (kernel rows dy=0..2) are contiguous
    slices of the flattened bands; the stride-2 column taps fall INSIDE a
    quad except out-px 2q's dx=-1 tap (= previous quad's pixel 3), which
    is a one-sublane shift + 32-lane slab, masked at q==0 (left zero pad).
  * ONE block-structured MXU matmul per step computes both output-pixel
    phases: patch [16*Q, 768] @ W768 [768, 128] -> [16*Q, 128] f32, where
    lanes = [out 2q (64ch) | out 2q+1 (64ch)] and W768 places each
    w[dy, dx] block so every tap lands once. The patch is VREG-ALIGNED
    end to end: lanes 0:384 = [R0|R1|R2] (three full-vreg concats), lanes
    384:768 = the same concat shifted one sublane (previous quad) and
    row-masked at quad 0 — only lanes 96:128 of each shifted vreg carry
    nonzero weights (the dx=-1 tap of out px 2q), the rest multiply into
    zeros. 2.67x padded FLOPs but zero sub-vreg lane shuffles; an earlier
    [16Q, 480] form with 32-lane slab slices measured 77 us/frame on the
    TPU (sub-vreg packing + a 3.75-vreg contraction), WORSE than XLA's 42.
    Bias + SiLU run in f32 on the VPU; output casts to the conv compute
    dtype and a free reshape restores [B, H/2, W/2, 64].

Numerics: identical operands/accumulation dtype as the XLA path
(bf16 x bf16 products are exact in f32; f32 accumulation order differs),
so outputs match conv_block to f32 rounding, not bitwise — same tolerance
class as any XLA conv algorithm change.

Reference behavior being reproduced: ultralytics YOLOv5 v6.0 Conv(32,64,3,2)
layer 1 (the reference imports it via torch.hub, /root/reference/networks/
yolo.py:58), as implemented natively in models/yolo.py:185.

Mosaic notes (CLAUDE.md): value reshapes only merge into sublane-ALIGNED
dims (Q=W/4 is a multiple of 16 for all gated widths); i1 vector selects
don't legalize (masks multiply as {0,1} in the compute dtype); dynamic DMA
starts slice an untiled dim (full [Q, 128] tiles per row), so any start is
legal.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CIN = 32
COUT = 64
RB = 16          # output rows per grid step


def _pack_weights(w):
    """[3, 3, 32, 64] HWIO -> [768, 128] block-structured matmul weights.

    Rows r*128 + j*32 + c hold input-quad pixel j (kernel row r); rows
    384 + r*128 + 96 + c hold the shifted previous-quad pixel 3 (other
    shifted-vreg rows are zero). Columns 0:64 produce out px 2q (taps
    4q-1, 4q, 4q+1 = dx 0,1,2), columns 64:128 out px 2q+1 (taps 4q+1,
    4q+2, 4q+3).
    """
    main = jnp.zeros((3, 4, CIN, 128), w.dtype)
    main = main.at[:, 0, :, 0:64].set(w[:, 1])     # px 4q   -> even, dx=1
    main = main.at[:, 1, :, 0:64].set(w[:, 2])     # px 4q+1 -> even, dx=2
    main = main.at[:, 1, :, 64:128].set(w[:, 0])   # px 4q+1 -> odd,  dx=0
    main = main.at[:, 2, :, 64:128].set(w[:, 1])   # px 4q+2 -> odd,  dx=1
    main = main.at[:, 3, :, 64:128].set(w[:, 2])   # px 4q+3 -> odd,  dx=2
    s = jnp.zeros((3, 4, CIN, 128), w.dtype)
    s = s.at[:, 3, :, 0:64].set(w[:, 0])           # px 4q-1 -> even, dx=0
    return jnp.concatenate([main.reshape(384, 128), s.reshape(384, 128)], 0)


def _conv1_kernel_body(x5_ref, w_ref, bias_ref, out_ref, band_e, band_o,
                       sems, *, nb: int, q: int):
    """One step = RB output rows of one image (step index i = b*nb + yb)."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    m = RB * q
    cdt = out_ref.dtype

    def dma(step, slot, wait):
        b = step // nb
        yb = step - b * nb
        y0 = yb * RB
        ce = pltpu.make_async_copy(
            x5_ref.at[b, pl.ds(y0, RB), 0, :, :],
            band_e.at[slot],
            sems.at[slot, 0],
        )
        (ce.wait if wait else ce.start)()

        # odd band rows y0-1 .. y0+15; the first block of each image has no
        # row -1 (top zero pad): DMA rows 0..15 into band rows 1..16 and
        # zero band row 0 at compute time
        def _odd(src_start, dst_start, n):
            co = pltpu.make_async_copy(
                x5_ref.at[b, pl.ds(src_start, n), 1, :, :],
                band_o.at[slot, pl.ds(dst_start, n)],
                sems.at[slot, 1],
            )
            (co.wait if wait else co.start)()

        if nb > 1:  # nb == 1 => every block is the top block (dead branch
            # would still shape-check its 17-row slice against oh == 16)
            pl.when(yb > 0)(lambda: _odd(y0 - 1, 0, RB + 1))
        pl.when(yb == 0)(lambda: _odd(0, 1, RB))

    slot = jax.lax.rem(i, 2)
    pl.when(i == 0)(lambda: dma(i, slot, wait=False))
    pl.when(i + 1 < nsteps)(lambda: dma(i + 1, 1 - slot, wait=False))
    dma(i, slot, wait=True)

    yb = jax.lax.rem(i, nb)

    @pl.when(yb == 0)
    def _():
        band_o[slot, 0] = jnp.zeros((q, 128), band_o.dtype)

    r1 = band_e[slot].reshape(m, 128)
    of = band_o[slot].reshape((RB + 1) * q, 128)
    r0 = of[0:m]
    r2 = of[q : q + m]
    rcat = jnp.concatenate([r0, r1, r2], axis=1)  # [m, 384], vreg-aligned

    # previous-quad vregs (out px 2q's dx=-1 tap lives in lanes 96:128 of
    # each; the weight zeros eat the rest). One sublane shift of the whole
    # 3-vreg concat, row-masked at quad 0 (left pad). {0,1} mask multiply:
    # i1 vector selects don't legalize in Mosaic.
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, 384), 0)
    qmask = (jax.lax.rem(sub, q) != 0).astype(cdt)
    zrow = jnp.zeros((1, 384), cdt)
    shm = jnp.concatenate([zrow, rcat[: m - 1]], axis=0) * qmask

    patch = jnp.concatenate([rcat, shm], axis=1)  # [m, 768]
    acc = jax.lax.dot(
        patch, w_ref[...], preferred_element_type=jnp.float32
    )  # [m, 128] f32
    y = acc + jnp.broadcast_to(bias_ref[...], (m, 128))
    y = y * jax.nn.sigmoid(y)  # SiLU, f32 like conv_block
    out_ref[0] = y.astype(cdt)


@partial(jax.jit, static_argnames=("interpret",))
def conv1_s2_silu_pallas(x, w, b, interpret: bool = False):
    """silu(conv3x3_s2_p1(x, w) + b) for x [B, H, W, 32], w [3,3,32,64].

    Returns [B, H/2, W/2, 64] in x.dtype (the conv compute dtype) — the
    same contract as models/layers.conv_block(stride=2, dtype=x.dtype).
    Requires H % 32 == 0 and W % 64 == 0 (Q = W/4 sublane-aligned).
    """
    bsz, h, wd, cin = x.shape
    if cin != CIN or w.shape != (3, 3, CIN, COUT):
        raise ValueError(f"unsupported conv shape {x.shape} / {w.shape}")
    if h % (2 * RB) != 0 or wd % 64 != 0:
        raise ValueError(f"needs H%32==0 and W%64==0, got {h}x{wd}")
    q = wd // 4
    oh = h // 2
    nb = oh // RB
    cdt = x.dtype
    x5 = x.reshape(bsz, oh, 2, q, 128)
    w768 = _pack_weights(w.astype(cdt))
    bias = b.astype(jnp.float32).reshape(1, COUT)
    bias128 = jnp.concatenate([bias, bias], axis=1)  # [1, 128]

    m = RB * q
    out = pl.pallas_call(
        partial(_conv1_kernel_body, nb=nb, q=q),
        grid=(bsz * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((768, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, 128), lambda i: (i // nb, i % nb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, oh * q, 128), cdt),
        scratch_shapes=[
            pltpu.VMEM((2, RB, q, 128), cdt),
            pltpu.VMEM((2, RB + 1, q, 128), cdt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x5, w768, bias128)
    return out.reshape(bsz, oh, 2 * q, COUT)


def conv1_shape_ok(x_shape, w_shape) -> bool:
    b, h, wd, cin = x_shape
    return (
        cin == CIN
        and tuple(w_shape) == (3, 3, CIN, COUT)
        and h % (2 * RB) == 0
        and wd % 64 == 0
    )


_SUPPORTED = None


def pallas_conv1_supported() -> bool:
    """Probe once whether this backend compiles + runs the kernel."""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            import numpy as np

            x = jnp.asarray(
                np.random.default_rng(0).standard_normal((1, 32, 64, CIN)),
                jnp.bfloat16,
            )
            w = jnp.asarray(
                np.random.default_rng(1).standard_normal((3, 3, CIN, COUT))
                * 0.1,
                jnp.bfloat16,
            )
            r = conv1_s2_silu_pallas(x, w, jnp.zeros((COUT,), jnp.float32))
            # data READBACK, not block_until_ready: on networked backends
            # (axon) only readback synchronizes a remote compile failure
            np.asarray(r)
            _SUPPORTED = True
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED
