"""Per-crop DMA gather + cv2-bilinear 50x50 resize as one Pallas TPU kernel.

Replaces the XLA row-gather path in ops/crops.py (gather_crops_batch) for
the batch-global ReID embed. The XLA lowering of the [D, 100, W, 3] frame
row gather runs ~20x below HBM bandwidth (measured on v5e — see ROADMAP
"Measured negative results"); this kernel instead DMAs each crop's banded
row range HBM->VMEM at line rate and does the tap selection + column
bilinear interpolation in VMEM, one grid step per crop.

Bit-exactness with the XLA path (tested array-equal in
tests/test_pallas_crops.py): the kernel performs NO floating-point
coordinate math of its own — every tap index and weight is computed once in
XLA by the same `_bilinear_coords` helper the reference path uses and fed
in as operands. In-kernel arithmetic is limited to contractions that are
exact by construction:

  * the row-tap one-hot matmul: one nonzero per row-sum, u8 pixel values
    (exact in a single bf16 pass);
  * the lane->sublane reorientation of the integer tap indices: exact
    one-hot f32 matmul at precision HIGHEST (values < 2^10 survive the
    3-way bf16 split — same trick as ops/pallas/cascade.py);
  * the column bilinear matmul: at most two nonzero terms per f32
    accumulator (order-invariant), with the weight matrix built from the
    SAME (1-fx, fx) values in the same compute dtype as `_columns_matmul`
    (bf16 on TPU — coincident clamp taps sum in bf16 there, so here too).

The f32 vertical mix and the normalization run in XLA after the kernel,
with the exact expressions of `_resize_rows` / `gather_crops_batch`.

The kernel consumes the crop source in PLANAR [B, 3, H, W] uint8 layout so
each channel's band is a contiguous 2-D DMA and the matmuls contract over
plain [T, W] tiles (no lane-interleaved channel stride). Callers transpose
the NHWC frame once per batch (u8 traffic, cheap) — see
tracking/deepsort.embed_detections_batch.

Reference semantics being reproduced (via ops/crops.py): host crop
`ori_img[y1:y2, x1:x2]` + `cv2.resize(..., (50, 50))`, deep_sort.py:88-107
and feature_extractor.py:26-39 of /root/reference.

Mosaic notes: vectors are 2-D >=128-lane tiles; the band scratch is uint8
(tile (32, 128)); dynamic sublane DMA starts are aligned down to 8 rows;
per-crop scalars arrive via scalar prefetch (SMEM), per-crop tap vectors as
lane-oriented VMEM blocks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OH = 50            # output crop size (reference CROP_SIZE)
ROWS = 64          # sublane half: y0 taps at rows [0, 64), y1 at [64, 128)
T_SMALL = 96       # small band tier (rows); covers tap spans <= 64 after
                   # the 32-row DMA start alignment
T_MID = 352        # middle band tier (rows): crops up to ~320 px tall skip
                   # the full-frame DMA (a 640-row band costs ~4x the 352
                   # one; kernel 52.7 -> 43.7 us/frame on the bench load).
                   # NEGATIVE RESULT (don't retry): adding 128-aligned
                   # COLUMN windows (256-lane DMA slices) made the kernel
                   # 2.3x SLOWER (120 us/frame) — a col-windowed band is t
                   # separate 256 B row segments instead of one contiguous
                   # block, and the DMA goes descriptor-bound. Row bands on
                   # the planar frame are contiguous; tier rows only.
OL = 64            # lane count holding the 50 output columns
_HI = jax.lax.Precision.HIGHEST


G_CROPS = 8        # crops per grid step (unrolled, double-buffered DMA)


def _crop_kernel_body(ints_ref, colmeta_ref, ymeta_ref, frames_ref, out_ref,
                      band_ref, sems, *, h: int, w: int, use_bf16: bool):
    """G_CROPS crops per grid step, software-pipelined band DMAs.

    The one-crop-per-step version measured ~6 us/crop on v5e — dominated by
    grid-step overhead + un-overlapped DMA latency, not compute (~1 us) or
    DMA line time (~0.25 us small tier). This body unrolls G_CROPS crops
    per step and double-buffers the band scratch (the guide's canonical
    prestart-next / wait-current / compute pattern), so crop g+1's DMA
    rides under crop g's matmuls and the step overhead amortizes G ways.

    ints_ref flat [4 * D_pad] i32 SMEM, 4 per crop: (frame idx, ylo, yhi,
    unused) — ylo/yhi the min/max clipped tap rows (the band coverage
    requirement). Flat 1-D because SMEM-prefetch 2-D rows are lane-padded
    to 128 (a [D, 4] layout costs 512 B/crop of the 1 MB SMEM).
    colmeta_ref block [G, 8, OL] f32: sublane 0 x0c, 1 x1c (clipped column
    taps, -1 beyond OH), 2 fx.
    ymeta_ref block [G, 8, 2*ROWS] f32: sublane 0 = concat(y0c, y1c) at
    lanes [0,50) and [64,114) (sentinel -4h elsewhere).
    frames_ref [B, 3, H, W] u8 (HBM). out_ref block [G, 3, 2*ROWS, OL] f32:
    column-interpolated tap rows on the 0..255 scale (y0 rows at [0, 64),
    y1 rows at [64, 128); garbage outside the tap lanes — the vertical mix,
    normalization and validity masking happen in XLA).
    band_ref [2, 3, H, W] u8 VMEM scratch; sems: [2, 3] DMA semaphores.
    """
    i = pl.program_id(0)
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    n2 = 2 * ROWS

    # constants shared by every crop in the step
    sub = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 1)
    eye = (sub == lane).astype(jnp.float32)

    # static row-band tier menu (32-row-aligned starts). Coverage
    # conditions are exact: a tier of extent T with start q*32,
    # q = min(ylo // 32, (h - T) // 32), covers [ylo, yhi] iff
    # yhi - q*32 < T (the start is always <= ylo since q <= ylo // 32).
    row_tiers = [t for t in (T_SMALL, T_MID) if t < h] + [h]

    def meta(g):
        j = i * G_CROPS + g
        return ints_ref[4 * j], ints_ref[4 * j + 1], ints_ref[4 * j + 2]

    def band_start(ylo, t):
        # 32-row-aligned dynamic DMA start (i8 VMEM tiles pack 4 rows x 8
        # sublanes): keep the min INSIDE and the *32 syntactic so Mosaic's
        # divisibility analysis can prove the memref-slice offset legal.
        # The floor-div keeps the band inside the frame for ANY h (the
        # tier condition separately guarantees the band still covers the
        # crop); for t == h the start is provably 0.
        q = jnp.minimum(jnp.maximum(ylo, 0) // 32, (h - t) // 32)
        return q * 32

    def band_dma(g, slot, t, wait):
        fi, ylo, _ = meta(g)
        start = band_start(ylo, t)
        for c in range(3):
            cp = pltpu.make_async_copy(
                frames_ref.at[fi, c, pl.ds(start, t), :],
                band_ref.at[slot, c, pl.ds(0, t), :],
                sems.at[slot, c],
            )
            cp.wait() if wait else cp.start()

    def tiered(g, fn):
        """Run fn(t) under the crop's row-band tier — the dispatch is
        identical for the DMA start, the wait, and the compute, so the
        shapes always agree."""
        _, ylo, yhi = meta(g)

        def row_cond(t):
            if t == h:
                return None  # last tier: always eligible
            return (yhi - band_start(ylo, t)) < t

        def first_match(conds):
            """Turn eligibility conds into exclusive first-match conds.

            conds are ordered smallest tier first; None means constant-true
            (only the last, full-extent tier). Result: cond_i & ~any(prev).
            """
            out = []
            acc = None  # OR of all previous conds (None = constant-false)
            for cnd in conds:
                if acc is None:
                    out.append(cnd)
                elif cnd is None:
                    out.append(jnp.logical_not(acc))
                else:
                    out.append(cnd & jnp.logical_not(acc))
                if cnd is not None:
                    acc = cnd if acc is None else acc | cnd
            return out

        for t, rc in zip(row_tiers, first_match([row_cond(t) for t in row_tiers])):
            if rc is None:
                fn(t)
            else:
                pl.when(rc)(lambda t=t: fn(t))

    def compute(g, slot, t):
        _, ylo, _ = meta(g)
        start = band_start(ylo, t)
        wq = jax.lax.broadcasted_iota(jnp.int32, (w, OL), 0)

        # column one-hot bilinear weights — same values/dtype as
        # _columns_matmul's sel (ops/crops.py:73-104): both taps in one
        # matrix, coincident clamp taps summing in the compute dtype.
        # Mosaic: broadcast BEFORE comparing (broadcast i1 relayout bug)
        # and select via {0,1}-mask multiply (i1-vector select does not
        # legalize); mask*w is exact (x*1 = x, x*0 = 0) — the same 2-term
        # cdt sum as the XLA sel.
        x0c = colmeta_ref[g, 0:1, :].astype(jnp.int32)  # [1, OL]
        x1c = colmeta_ref[g, 1:2, :].astype(jnp.int32)
        fx = colmeta_ref[g, 2:3, :]
        w0 = (1.0 - fx).astype(cdt)
        w1 = fx.astype(cdt)
        m0 = (wq == jnp.broadcast_to(x0c, (w, OL))).astype(jnp.int32)
        m1 = (wq == jnp.broadcast_to(x1c, (w, OL))).astype(jnp.int32)
        csel = m0.astype(cdt) * jnp.broadcast_to(w0, (w, OL)) + m1.astype(
            cdt
        ) * jnp.broadcast_to(w1, (w, OL))

        # integer tap rows, lane->sublane via exact one-hot HIGHEST matmul:
        # tap_b[r, :] = taps_l[r] - start
        taps_l = ymeta_ref[g, 0:1, :]  # [1, 2*ROWS] f32 integer values
        diag = jnp.broadcast_to(taps_l, (n2, n2)) * eye
        ones = jnp.ones((n2, t), jnp.float32)
        tap_b = jax.lax.dot(diag, ones, precision=_HI).astype(jnp.int32)
        tap_b = tap_b - start
        tt = jax.lax.broadcasted_iota(jnp.int32, (n2, t), 1)
        r01 = (tt == tap_b).astype(jnp.int32).astype(cdt)

        for c in range(3):
            # Mosaic has no unsigned->float cast; u8 -> i32 -> float is
            # exact (values 0..255) and legalizes
            band_c = band_ref[slot, c, 0:t, :].astype(jnp.int32).astype(cdt)
            taps_c = jax.lax.dot(
                r01, band_c, preferred_element_type=jnp.float32
            )  # [2*ROWS, W] f32, exact u8 values (one-hot rows)
            out_ref[g, c, :, :] = jax.lax.dot(
                taps_c.astype(cdt), csel, preferred_element_type=jnp.float32
            )  # same 2-term f32 sums as the XLA einsum

    # prologue: crop 0's band
    tiered(0, lambda t: band_dma(0, 0, t, wait=False))
    for g in range(G_CROPS):
        slot = g % 2
        if g + 1 < G_CROPS:
            # prestart the next crop's band into the other slot; its last
            # reader (crop g-1's compute) was issued a step ago
            tiered(
                g + 1,
                lambda t, g=g: band_dma(g + 1, (g + 1) % 2, t, wait=False),
            )

        def wait_and_compute(t, g=g, slot=slot):
            band_dma(g, slot, t, wait=True)
            compute(g, slot, t)

        tiered(g, wait_and_compute)


@partial(jax.jit, static_argnames=("use_bf16", "interpret"))
def _crop_gather_call(frames_planar, ints, colmeta, ymeta, *, use_bf16: bool,
                      interpret: bool):
    """[D_pad] crops from planar frames: column-mixed [D_pad, 3, 2*ROWS, OL]
    f32. D_pad (= ints.size // 4) must be a multiple of G_CROPS."""
    d_pad = ints.shape[0] // 4
    _, _, h, w = frames_planar.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d_pad // G_CROPS,),
        in_specs=[
            pl.BlockSpec(
                (G_CROPS, 8, OL), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G_CROPS, 8, 2 * ROWS), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (G_CROPS, 3, 2 * ROWS, OL), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, h, w), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        partial(_crop_kernel_body, h=h, w=w, use_bf16=use_bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_pad, 3, 2 * ROWS, OL), jnp.float32),
        interpret=interpret,
    )(ints, colmeta, ymeta, frames_planar)


import numpy as _np

_MEAN = _np.asarray((0.485, 0.456, 0.406), _np.float32)
_STD = _np.asarray((0.229, 0.224, 0.225), _np.float32)


@partial(jax.jit, static_argnames=("dtype", "interpret"))
def gather_crops_batch_pallas(
    frames_planar: jax.Array,  # [B, 3, H, W] uint8 RGB (planar)
    frame_idx: jax.Array,      # [D] i32 source frame per crop
    boxes_xyxy: jax.Array,     # [D, 4] f32 crop-source pixels
    valid: jax.Array,          # [D] bool
    dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in twin of ops/crops.gather_crops_batch (array-equal outputs).

    Returns normalized [D, 50, 50, 3] f32 crops; invalid rows are zero.
    dtype=bfloat16 selects the bf16 column weights iff running on TPU,
    mirroring _columns_matmul's use_bf16 switch.
    """
    from vehicle_counting_tpu.ops.crops import _bilinear_coords

    d = frame_idx.shape[0]
    _, _, h, w = frames_planar.shape
    if w % 128 != 0 and not interpret:
        # Mosaic HBM memref slices must be 128-lane aligned in the last
        # dim; callers fall back to the XLA gather for other widths
        raise ValueError(f"pallas crop gather needs W % 128 == 0, got {w}")
    # pad the crop axis to a G_CROPS multiple (dummy crops: frame 0, tap
    # rows 0-0 -> small tier, sentinel taps; output rows sliced off below)
    d_pad = -(-d // G_CROPS) * G_CROPS
    # the same coordinate math (and jaxpr) as the XLA gather path
    y0c, y1c, fy, x0c, x1c, fx = _bilinear_coords(boxes_xyxy, h, w, (OH, OH))

    ints = jnp.stack(
        [
            frame_idx.astype(jnp.int32),
            y0c[:, 0],            # min tap row (sy is nondecreasing in i)
            y1c[:, -1],           # max tap row
            jnp.zeros((d,), jnp.int32),
        ],
        axis=1,
    )
    # flat 1-D prefetch: 2-D SMEM rows are lane-padded to 128 (512 B/crop)
    ints = jnp.pad(ints, ((0, d_pad - d), (0, 0))).reshape(-1)

    def lane_pad(v, n, fill):
        return jnp.pad(
            v.astype(jnp.float32), ((0, d_pad - d), (0, n - v.shape[1])),
            constant_values=fill,
        )

    colmeta = jnp.stack(
        [
            lane_pad(x0c, OL, -1.0),
            lane_pad(x1c, OL, -1.0),
            lane_pad(fx, OL, 0.0),
        ]
        + [jnp.zeros((d_pad, OL), jnp.float32)] * 5,
        axis=1,
    )  # [D_pad, 8, OL]
    sent = -4.0 * h  # sentinel tap: never matches a band row
    y0p = lane_pad(y0c, ROWS, sent)
    y1p = lane_pad(y1c, ROWS, sent)
    ymeta = jnp.stack(
        [jnp.concatenate([y0p, y1p], axis=1)]
        + [jnp.zeros((d_pad, 2 * ROWS), jnp.float32)] * 7,
        axis=1,
    )  # [D_pad, 8, 2*ROWS]

    use_bf16 = dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
    m = _crop_gather_call(
        frames_planar, ints, colmeta, ymeta,
        use_bf16=use_bf16, interpret=interpret,
    )[:d]  # [D, 3, 2*ROWS, OL] f32 column-interpolated tap rows

    # vertical f32 mix with _resize_rows' exact expression, then the same
    # normalization chain as gather_crops_batch
    m0 = jnp.transpose(m[:, :, :OH, :OH], (0, 2, 3, 1))         # [D,50,50,3]
    m1 = jnp.transpose(m[:, :, ROWS : ROWS + OH, :OH], (0, 2, 3, 1))
    crops = m0 * (1.0 - fy)[:, :, None, None] + m1 * fy[:, :, None, None]
    crops = (crops / 255.0 - _MEAN) / _STD
    return jnp.where(valid[:, None, None, None], crops, 0.0)


_SUPPORTED = None


def pallas_crops_supported() -> bool:
    """Probe once whether this backend compiles + runs the kernel."""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            frames = jnp.zeros((1, 3, 64, 128), jnp.uint8)
            fidx = jnp.zeros((2,), jnp.int32)
            boxes = jnp.asarray([[1.0, 1.0, 20.0, 20.0], [0.0, 0.0, 8.0, 60.0]])
            out = gather_crops_batch_pallas(
                frames, fidx, boxes, jnp.ones((2,), bool)
            )
            jax.block_until_ready(out)
            _SUPPORTED = True
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED
