"""Hungarian assignment as a single Pallas TPU kernel.

The shortest-augmenting-path solver (tracking/assignment.py) is the one
inherently *sequential* op in the tracker: nested while-loops over tiny
vectors. Compiled through plain XLA each loop step is a handful of separate
HLO ops; as one Pallas kernel the entire solve — duals, Dijkstra frontier,
augmentation — stays resident in VMEM registers for the whole run, with a
single kernel launch per matching stage.

Same contract and tie-breaking as tracking/assignment.py::solve_assignment_sub
(which remains the lowering used under vmap/CPU tests); this kernel is the
TPU fast path. Equivalence is tested against the XLA version and scipy.

Mosaic constraints shaping the kernel: no scatter/dynamic-slice lowerings
(point updates are masked whole-vector selects against broadcasted iotas,
vec[j] reads are one-hot reductions), and every vector is a 2-D [1, LANES]
tile with LANES a multiple of 128 — odd 1-D lengths like S+1 trip vector
relayout bugs in Mosaic.

Availability: `pallas_assignment_supported()` probes whether the backend can
compile Mosaic kernels (some remote-tunnel dev backends cannot); callers
fall back to the XLA solver when it returns False.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e18


def _lanes_for(s: int) -> int:
    """Lane count holding indices 0..S (virtual column included), 128-aligned."""
    return 128 * (-(-(s + 1) // 128))


def _insert_rows_body(nr, load_row, s: int, lanes: int):
    """Shared JV insertion: returns p [1, LANES] (col -> row, -1 free).

    Lane layout: lanes 0..S-1 are the S columns, lane S is the virtual root
    column, lanes > S are dead. All state lives in [1, LANES] vector tiles.
    load_row(i0) -> [1, LANES]: cost row i0 PRE-PADDED with +INF beyond
    column S (callers pad the matrix once at launch, so the hot Dijkstra
    iteration does no per-step pad).
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)      # [1, L]
    live = idx < s                                                 # real columns

    p0 = jnp.full((1, lanes), -1, jnp.int32)
    u0 = jnp.zeros((1, lanes), jnp.float32)
    v0 = jnp.zeros((1, lanes), jnp.float32)

    def pick_i32(vec, j):
        """vec[0, j] as a scalar: one-hot masked reduction (no dynamic slice)."""
        return jnp.max(jnp.where(idx == j, vec, jnp.int32(-2147483648)))

    def pick_f32(vec, j):
        return jnp.sum(jnp.where(idx == j, vec, 0.0))

    def insert_row(i, carry):
        u, v, p = carry
        p = jnp.where(idx == s, i, p)

        def dij_cond(st):
            _, _, _, _, j0, _, _ = st
            return pick_i32(p, j0) != -1

        def dij_body(st):
            # `used`/`hit` are i32 0/1 masks: i1 vectors in while-loop carries
            # do not legalize in Mosaic (scf.yield)
            u_, v_, minv, way, j0, used_i, hit_i = st
            used_i = jnp.maximum(used_i, (idx == j0).astype(jnp.int32))
            used = used_i != 0
            i0 = pick_i32(p, j0)
            # hit[r] = some used column is assigned to row r. p is constant
            # during Dijkstra, so the only row that becomes hit this step is
            # i0 = p[j0] — maintained incrementally instead of rebuilding an
            # [L, L] (p == idx) comparison every iteration.
            hit_i = jnp.maximum(hit_i, (idx == i0).astype(jnp.int32))
            cost_row = load_row(i0)  # [1, L], +INF beyond col S
            cur = cost_row - pick_f32(u_, i0) - v
            better = live & (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used | ~live, _INF, minv)
            delta = jnp.min(masked)
            # FIRST minimum wins (scipy tie-breaking); Mosaic's argmin
            # returns the LAST tied index, so select explicitly
            j1 = jnp.min(jnp.where(masked == delta, idx, lanes)).astype(jnp.int32)
            u_ = u_ + jnp.where(hit_i != 0, delta, 0.0)
            v_ = v_ - jnp.where(used, delta, 0.0)
            minv = jnp.where(used | ~live, minv, minv - delta)
            return u_, v_, minv, way, j1, used_i, hit_i

        st0 = (
            u,
            v,
            jnp.full((1, lanes), _INF, jnp.float32),
            jnp.full((1, lanes), s, jnp.int32),
            jnp.int32(s),
            jnp.zeros((1, lanes), jnp.int32),
            jnp.zeros((1, lanes), jnp.int32),
        )
        u, v, minv, way, j0, used, _ = jax.lax.while_loop(dij_cond, dij_body, st0)

        def aug_cond(st):
            j0_, _ = st
            return j0_ != s

        def aug_body(st):
            j0_, p_ = st
            j1 = pick_i32(way, j0_)
            p_ = jnp.where(idx == j0_, pick_i32(p_, j1), p_)
            return j1, p_

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    _, _, p = jax.lax.fori_loop(0, nr, insert_row, (u0, v0, p0))
    return p


def _insert_rows_kernel(nr_ref, cost_ref, p_out_ref):
    """Single-problem kernel: cost [S, LANES] (+INF-padded), nr in SMEM."""
    s = cost_ref.shape[0]
    lanes = p_out_ref.shape[1]

    def load_row(i0):
        return cost_ref[pl.ds(i0, 1), :]  # dynamic sublane slice, [1, LANES]

    p_out_ref[...] = _insert_rows_body(nr_ref[0], load_row, s, lanes)


def _insert_rows_kernel_grid(nr_ref, cost_ref, p_out_ref):
    """Grid-batched kernel: one JV solve per grid step (class), one launch.

    cost_ref block [1, S, LANES] (class i's +INF-padded matrix), nr_ref SMEM
    [C] indexed by program_id, p_out block [1, 8, LANES] (8 sublanes for tile
    alignment; the result is replicated across them and row 0 is read back).
    """
    s = cost_ref.shape[1]
    lanes = p_out_ref.shape[2]
    nr = nr_ref[pl.program_id(0)]

    def load_row(i0):
        return cost_ref[0, pl.ds(i0, 1), :]

    p = _insert_rows_body(nr, load_row, s, lanes)  # [1, LANES]
    p_out_ref[...] = jnp.broadcast_to(p, (1, 8, lanes))


def _pad_cost(cost: jax.Array, s: int, lanes: int) -> jax.Array:
    """+INF-pad the column axis to the lane count, once, outside the kernel."""
    pad = [(0, 0)] * (cost.ndim - 1) + [(0, lanes - s)]
    return jnp.pad(cost.astype(jnp.float32), pad, constant_values=_INF)


def _insert_rows_pallas_base(cost: jax.Array, nr, *, interpret: bool = False) -> jax.Array:
    s = cost.shape[0]
    lanes = _lanes_for(s)
    p = pl.pallas_call(
        _insert_rows_kernel,
        out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray([nr], jnp.int32), _pad_cost(cost, s, lanes))
    return p[0, : s + 1]


def _insert_rows_pallas_batched(costs: jax.Array, n_ins, *, interpret: bool = False) -> jax.Array:
    """[C, S, S] problems in ONE kernel launch (grid over the class axis)."""
    c, s, _ = costs.shape
    lanes = _lanes_for(s)
    p = pl.pallas_call(
        _insert_rows_kernel_grid,
        grid=(c,),
        out_shape=jax.ShapeDtypeStruct((c, 8, lanes), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(n_ins.astype(jnp.int32), _pad_cost(costs, s, lanes))
    return p[:, 0, : s + 1]


def _make_insert_rows(interpret: bool):
    """custom_vmap wrapper: single launch unbatched, grid kernel under vmap."""

    @jax.custom_batching.custom_vmap
    def insert(cost: jax.Array, nr) -> jax.Array:
        return _insert_rows_pallas_base(cost, nr, interpret=interpret)

    @insert.def_vmap
    def _vmap_rule(axis_size, in_batched, cost, nr):
        cost_b, nr_b = in_batched
        if not cost_b:
            cost = jnp.broadcast_to(cost, (axis_size,) + cost.shape)
        if not nr_b:
            nr = jnp.broadcast_to(jnp.asarray(nr, jnp.int32), (axis_size,))
        return _insert_rows_pallas_batched(cost, nr, interpret=interpret), True

    return insert


_insert_rows_pallas = _make_insert_rows(False)
_insert_rows_pallas_interp = _make_insert_rows(True)


_SUPPORTED = None


def pallas_assignment_supported() -> bool:
    """Probe once whether this backend compiles the kernel (e.g. Mosaic via
    remote-compile tunnels can fail); cache the answer."""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            c = jnp.full((8, 8), 1.0, jnp.float32)
            _ = jax.block_until_ready(
                solve_assignment_sub_pallas(c, jnp.int32(2), jnp.int32(2))
            )
            _SUPPORTED = True
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED


@partial(jax.jit, static_argnames=("interpret",))
def solve_assignment_sub_pallas(cost: jax.Array, nr, nc, *, interpret: bool = False) -> jax.Array:
    """Drop-in for tracking.assignment.solve_assignment_sub on TPU.

    Branch-free (solve_uniform), so vmapping it solves every lane's problem
    in ONE grid kernel launch via the custom_vmap rule.
    """
    from vehicle_counting_tpu.tracking.assignment import solve_uniform

    insert = _insert_rows_pallas_interp if interpret else _insert_rows_pallas
    return solve_uniform(insert, cost, nr, nc)
