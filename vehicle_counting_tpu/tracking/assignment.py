"""Jittable optimal assignment (Hungarian, shortest-augmenting-path form).

The reference solves association with scipy's `linear_sum_assignment`
(networks/deepsort/sort/linear_assignment.py:5,60) per cascade level. On TPU
that becomes a fixed-shape, jit/vmap-compatible shortest-augmenting-path
solver: Jonker-Volgenant row insertion with dual potentials — the same
algorithm family scipy uses — expressed with lax loops and whole-row vector
ops so it composes with `lax.scan` over frames and vmap over classes.

Tie-breaking parity matters: min_cost_matching clamps every cost above the
threshold to threshold + 1e-5 (linear_assignment.py:58), so ties are COMMON
(e.g. any fully-gated track row), and which tied detection a row "matches"
(then rejects) feeds the unmatched-detections list order that determines new
track ids (tracker.py:77-79,133-139). scipy breaks ties by scanning columns
in index order and — crucially — transposes the problem when nr > nc. This
solver reproduces both: first-minimum column scans, row-by-row insertion, and
a transposed solve under `lax.cond` when there are more rows than columns.

Contract: the matrix must be COMPACTED — real rows first (0..nr-1) in the
reference's row order, real columns first (0..nc-1) in the reference's
column order, padding entries = BIG. Only real rows are inserted (dynamic
trip count), so padding never perturbs tie-breaking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 8.0  # >> any clamped association cost (<= ~1); keeps f32 duals exact
_INF = 1e18  # python float: a module-level device scalar would force a
# remote device->host sync at every traced use on networked TPU backends


def _insert_rows(cost: jax.Array, nr) -> jax.Array:
    """JV row insertion of rows [0, nr) of an [S, S] matrix.

    Returns p [S+1]: p[j] = row assigned to column j (-1 free); index S is the
    virtual root column.
    """
    s = cost.shape[0]
    VIRT = s

    def insert_row(i, carry):
        u, v, p = carry
        p = p.at[VIRT].set(i)

        def dij_cond(st):
            _, _, _, _, j0, _ = st
            return p[j0] != -1

        def dij_body(st):
            u_, v_, minv, way, j0, used = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0, :] - u_[i0] - v_[:s]
            better = (~used[:s]) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used[:s], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)  # first minimum wins
            delta = masked[j1]
            scatter_idx = jnp.where(used, p, s + 1)
            du = jnp.zeros_like(u_).at[scatter_idx].add(
                jnp.where(used, delta, 0.0), mode="drop"
            )
            u_ = u_ + du
            v_ = v_ - jnp.where(used, delta, 0.0)
            minv = jnp.where(used[:s], minv, minv - delta)
            return u_, v_, minv, way, j1, used

        st0 = (
            u,
            v,
            jnp.full((s,), _INF, jnp.float32),
            jnp.full((s,), VIRT, jnp.int32),
            jnp.int32(VIRT),
            jnp.zeros((s + 1,), bool),
        )
        u, v, minv, way, j0, used = jax.lax.while_loop(dij_cond, dij_body, st0)

        def aug_cond(st):
            j0_, _ = st
            return j0_ != VIRT

        def aug_body(st):
            j0_, p_ = st
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return j1, p_

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    u0 = jnp.zeros((s + 1,), jnp.float32)  # +1: scatter sentinel lane
    v0 = jnp.zeros((s + 1,), jnp.float32)
    p0 = jnp.full((s + 1,), -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, nr, insert_row, (u0, v0, p0))
    return p


@jax.jit
def solve_assignment_sub(cost: jax.Array, nr, nc) -> jax.Array:
    """Assignment over the top-left nr x nc submatrix of an [S, S] matrix.

    Matches scipy.linear_sum_assignment on that submatrix including its
    tie-breaking (index-order scans; transposed solve when nr > nc).
    Returns row_to_col [S] int32, -1 for unassigned/padded rows.
    """
    s = cost.shape[0]
    cols = jnp.arange(s, dtype=jnp.int32)

    def normal(_):
        p = _insert_rows(cost, nr)
        r2c = jnp.full((s,), -1, jnp.int32)
        return r2c.at[jnp.where(p[:s] >= 0, p[:s], s)].set(cols, mode="drop")

    def transposed(_):
        # inserting original columns as rows: resulting p is indexed by the
        # columns of cost.T == original rows, i.e. p[:s] IS row_to_col.
        return _insert_rows(cost.T, nc)[:s]

    return jax.lax.cond(nr <= nc, normal, transposed, None)


@jax.jit
def solve_assignment(cost: jax.Array) -> jax.Array:
    """Full-matrix convenience wrapper: all N rows real, all M cols real."""
    n, m = cost.shape
    if n <= m:
        sq = jnp.full((m, m), BIG, cost.dtype).at[:n, :].set(cost)
        return solve_assignment_sub(sq, jnp.int32(n), jnp.int32(m))[:n]
    sq = jnp.full((n, n), BIG, cost.dtype).at[:, :m].set(cost)
    return solve_assignment_sub(sq, jnp.int32(n), jnp.int32(m))[:n]


def solve_uniform(insert_fn, cost: jax.Array, nr, nc) -> jax.Array:
    """Branch-free scipy-transpose handling around a row-insertion solver.

    Replaces the lax.cond(nr <= nc) with a data select (transpose the matrix
    and insert the smaller side), so exactly ONE insertion runs — under vmap
    a cond would execute BOTH branches per lane. Output identical to the
    cond form.
    """
    s = cost.shape[0]
    flip = nr > nc
    mat = jnp.where(flip, cost.T, cost)
    n_ins = jnp.where(flip, nc, nr)
    p = insert_fn(mat, n_ins)  # [s+1] col -> row (of the inserted side)
    cols = jnp.arange(s, dtype=jnp.int32)
    # invert col->row into row->col with a one-hot reduce, NOT a scatter:
    # this runs once per solve under the batched class mode's vmap, where a
    # scatter lowers to a ~13 us per-lane loop (measured 141 us/frame of the
    # steady tracker) and an [S, S] masked reduce costs ~1 us.
    oh = p[None, :s] == cols[:, None]  # [S(row), S(col)]; p==-1 never matches
    r2c_normal = jnp.where(
        jnp.any(oh, axis=1), jnp.sum(jnp.where(oh, cols[None, :], 0), axis=1), -1
    )
    # flipped: p is indexed by cost.T's columns == original rows, so p IS r2c
    return jnp.where(flip, p[:s], r2c_normal)


def solve_assignment_sub_fast(cost: jax.Array, nr, nc) -> jax.Array:
    """Backend-dispatched solve: single-launch Pallas kernel on TPU, the XLA
    lowering elsewhere; branch-free, so it vmaps into ONE batched launch.

    The two produce bitwise-identical assignments (the Pallas kernel
    reproduces first-minimum tie scans explicitly because Mosaic's argmin
    picks the LAST tied index); dispatch is a trace-time choice keyed on the
    active backend, so CPU tests exercise the same semantics the TPU runs.
    """
    if jax.default_backend() == "tpu":
        try:
            from vehicle_counting_tpu.ops.pallas.assignment import (
                _insert_rows_pallas,
                pallas_assignment_supported,
            )

            if pallas_assignment_supported():
                return solve_uniform(_insert_rows_pallas, cost, nr, nc)
        except Exception:
            pass
    return solve_uniform(_insert_rows, cost, nr, nc)


def matching_cost_matrix(cost: jax.Array, row_mask: jax.Array, col_mask: jax.Array, max_distance) -> jax.Array:
    """Clamp real entries the min_cost_matching way; mask the rest to BIG."""
    clamped = jnp.minimum(cost, max_distance + 1e-5)
    live = row_mask[:, None] & col_mask[None, :]
    return jnp.where(live, clamped, BIG)
