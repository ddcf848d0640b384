"""Pallas Hungarian kernel vs XLA reference solver (interpret mode on CPU)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from vehicle_counting_tpu.ops.pallas.assignment import solve_assignment_sub_pallas
from vehicle_counting_tpu.tracking.assignment import BIG, solve_assignment_sub


def _padded(cost, s):
    out = np.full((s, s), BIG, np.float32)
    out[: cost.shape[0], : cost.shape[1]] = cost
    return out


@pytest.mark.parametrize("nr,nc", [(4, 6), (6, 4), (8, 8), (1, 5), (16, 12)])
def test_pallas_matches_xla_solver(rng, nr, nc):
    s = 16
    for _ in range(5):
        sub = rng.uniform(0, 1, size=(nr, nc)).astype(np.float32)
        cost = jnp.asarray(_padded(sub, s))
        want = np.asarray(solve_assignment_sub(cost, jnp.int32(nr), jnp.int32(nc)))
        got = np.asarray(
            solve_assignment_sub_pallas(cost, jnp.int32(nr), jnp.int32(nc), interpret=True)
        )
        np.testing.assert_array_equal(got, want)


def test_pallas_optimal_vs_scipy(rng):
    s, nr, nc = 16, 8, 10
    sub = rng.uniform(0, 1, size=(nr, nc)).astype(np.float32)
    cost = jnp.asarray(_padded(sub, s))
    got = np.asarray(
        solve_assignment_sub_pallas(cost, jnp.int32(nr), jnp.int32(nc), interpret=True)
    )
    ri, ci = linear_sum_assignment(sub)
    want_total = sub[ri, ci].sum()
    got_total = sum(sub[i, got[i]] for i in range(nr) if 0 <= got[i] < nc)
    assert got_total == pytest.approx(want_total, abs=1e-5)


def test_solve_uniform_matches_cond_form(rng):
    """Branch-free transpose handling == the lax.cond form, incl. nr > nc."""
    from vehicle_counting_tpu.tracking.assignment import (
        _insert_rows, solve_uniform,
    )

    s = 16
    for nr, nc in [(4, 6), (6, 4), (9, 9), (1, 12), (12, 1), (0, 5), (5, 0)]:
        for _ in range(4):
            sub = np.minimum(rng.uniform(0, 0.3, (nr, nc)),
                             0.2 + 1e-5).astype(np.float32)
            cost = jnp.asarray(_padded(sub, s))
            want = np.asarray(solve_assignment_sub(cost, jnp.int32(nr), jnp.int32(nc)))
            got = np.asarray(
                solve_uniform(_insert_rows, cost, jnp.int32(nr), jnp.int32(nc))
            )
            np.testing.assert_array_equal(got, want, err_msg=f"nr={nr} nc={nc}")


def test_batched_grid_kernel_matches_single(rng):
    """custom_vmap grid kernel (one launch for C problems) == per-problem
    solves, interpret mode."""
    import jax

    from vehicle_counting_tpu.ops.pallas.assignment import (
        _insert_rows_pallas_interp,
    )
    from vehicle_counting_tpu.tracking.assignment import solve_uniform

    s, c = 16, 5
    costs, nrs, ncs = [], [], []
    for i in range(c):
        nr = int(rng.integers(0, s // 2))
        nc = int(rng.integers(0, s // 2))
        m = np.full((s, s), BIG, np.float32)
        if nr and nc:
            m[:nr, :nc] = np.minimum(
                rng.uniform(0, 0.3, (nr, nc)), 0.2 + 1e-5
            ).astype(np.float32)
        costs.append(m)
        nrs.append(nr)
        ncs.append(nc)
    costs_j = jnp.asarray(np.stack(costs))
    nrs_j = jnp.asarray(nrs, jnp.int32)
    ncs_j = jnp.asarray(ncs, jnp.int32)

    batched = jax.vmap(
        lambda m, r, co: solve_uniform(_insert_rows_pallas_interp, m, r, co)
    )(costs_j, nrs_j, ncs_j)
    for i in range(c):
        want = np.asarray(
            solve_assignment_sub(costs_j[i], jnp.int32(nrs[i]), jnp.int32(ncs[i]))
        )
        np.testing.assert_array_equal(np.asarray(batched[i]), want,
                                      err_msg=f"lane {i} nr={nrs[i]} nc={ncs[i]}")
