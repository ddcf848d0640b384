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

The kernel is scatter-free and dynamic-slice-free (Pallas TPU lowers
neither): point updates are masked whole-vector selects against broadcasted
iotas and vec[j] reads are one-hot reductions — at S <= 64 those stay in
vector registers anyway.

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


def _insert_rows_kernel(nr_ref, cost_ref, p_out_ref):
    """Insert rows [0, nr) of cost [S, S]; p_out [1, S+1] (col -> row, -1 free).

    Scatter-free formulation (Pallas TPU has no scatter lowering): every
    point update is a masked whole-vector select against a broadcasted iota,
    and the dual update u[p[j]] += delta uses a [S+1, S+1] one-hot match.
    """
    s = cost_ref.shape[0]
    nr = nr_ref[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (s + 1, 1), 0)[:, 0]  # [s+1]
    idx_s = idx[:s]

    p0 = jnp.full((s + 1,), -1, jnp.int32)
    u0 = jnp.zeros((s + 1,), jnp.float32)
    v0 = jnp.zeros((s + 1,), jnp.float32)

    def pick(vec, j):
        """vec[j] without dynamic_slice: one-hot masked sum."""
        n = vec.shape[0]
        return jnp.sum(jnp.where(idx[:n] == j, vec, jnp.zeros_like(vec)))

    def insert_row(i, carry):
        u, v, p = carry
        p = jnp.where(idx == s, i, p)

        def dij_cond(st):
            _, _, _, _, j0, _ = st
            return pick(p, j0) != -1

        def dij_body(st):
            u_, v_, minv, way, j0, used = st
            used = used | (idx == j0)
            i0 = pick(p, j0)
            cost_row = jnp.sum(
                jnp.where((idx_s == i0)[:, None], cost_ref[:, :], 0.0), axis=0
            )
            cur = cost_row - pick(u_, i0) - v_[:s]
            better = (~used[:s]) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used[:s], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = jnp.min(masked)
            # u[p[j]] += delta for used cols j: one-hot row match, no scatter
            hit = jnp.any((p[None, :] == idx[:, None]) & used[None, :], axis=1)
            u_ = u_ + jnp.where(hit, delta, 0.0)
            v_ = v_ - jnp.where(used, delta, 0.0)
            minv = jnp.where(used[:s], minv, minv - delta)
            return u_, v_, minv, way, j1, used

        st0 = (
            u,
            v,
            jnp.full((s,), _INF, jnp.float32),
            jnp.full((s,), s, jnp.int32),
            jnp.int32(s),
            jnp.zeros((s + 1,), bool),
        )
        u, v, minv, way, j0, used = jax.lax.while_loop(dij_cond, dij_body, st0)

        def aug_cond(st):
            j0_, _ = st
            return j0_ != s

        def aug_body(st):
            j0_, p_ = st
            j1 = pick(way, j0_)
            p_ = jnp.where(idx == j0_, pick(p_, j1), p_)
            return j1, p_

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    _, _, p = jax.lax.fori_loop(0, nr, insert_row, (u0, v0, p0))
    p_out_ref[0, :] = p


def _insert_rows_pallas(cost: jax.Array, nr, *, interpret: bool = False) -> jax.Array:
    s = cost.shape[0]
    p = pl.pallas_call(
        _insert_rows_kernel,
        out_shape=jax.ShapeDtypeStruct((1, s + 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray([nr], jnp.int32), cost.astype(jnp.float32))
    return p[0]


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
    """Drop-in for tracking.assignment.solve_assignment_sub on TPU."""
    s = cost.shape[0]
    cols = jnp.arange(s, dtype=jnp.int32)

    def normal(_):
        p = _insert_rows_pallas(cost, nr, interpret=interpret)
        r2c = jnp.full((s,), -1, jnp.int32)
        return r2c.at[jnp.where(p[:s] >= 0, p[:s], s)].set(cols, mode="drop")

    def transposed(_):
        return _insert_rows_pallas(cost.T, nc, interpret=interpret)[:s]

    return jax.lax.cond(nr <= nc, normal, transposed, None)
