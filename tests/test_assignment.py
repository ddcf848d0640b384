"""Hungarian solver vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from vehicle_counting_tpu.tracking.assignment import (
    BIG,
    matching_cost_matrix,
    solve_assignment,
)


def total_cost(cost, row_to_col):
    return sum(cost[i, j] for i, j in enumerate(row_to_col) if j >= 0)


@pytest.mark.parametrize("n,m", [(1, 1), (3, 3), (5, 8), (8, 8), (16, 16), (32, 40)])
def test_matches_scipy_optimum(rng, n, m):
    for _ in range(8):
        cost = rng.uniform(0, 1, size=(n, m)).astype(np.float32)
        got = np.asarray(solve_assignment(jnp.asarray(cost)))
        assert len(set(got.tolist())) == n  # a valid assignment, all distinct
        ri, ci = linear_sum_assignment(cost)
        want = cost[ri, ci].sum()
        assert total_cost(cost, got) == pytest.approx(want, abs=1e-5)


def test_integer_costs_exact(rng):
    cost = rng.integers(0, 100, size=(12, 12)).astype(np.float32)
    got = np.asarray(solve_assignment(jnp.asarray(cost)))
    ri, ci = linear_sum_assignment(cost)
    assert total_cost(cost, got) == cost[ri, ci].sum()


def test_masked_rows_dont_steal(rng):
    # 2 real rows, 2 masked rows, 3 real cols: real-real pairs must match the
    # 2x3 submatrix optimum.
    sub = rng.uniform(0, 0.5, size=(2, 3)).astype(np.float32)
    cost = np.full((4, 4), BIG, np.float32)
    cost[:2, :3] = np.minimum(sub, 0.2 + 1e-5)
    got = np.asarray(solve_assignment(jnp.asarray(cost)))
    ri, ci = linear_sum_assignment(np.minimum(sub, 0.2 + 1e-5))
    want = np.minimum(sub, 0.2 + 1e-5)[ri, ci].sum()
    real = sum(cost[i, got[i]] for i in range(2) if got[i] < 3 and cost[i, got[i]] < BIG)
    assert real == pytest.approx(want, abs=1e-5)


def test_matching_cost_matrix_clamps():
    cost = jnp.asarray(np.array([[0.1, 5.0], [0.3, 0.9]], np.float32))
    row = jnp.asarray([True, False])
    col = jnp.asarray([True, True])
    got = np.asarray(matching_cost_matrix(cost, row, col, 0.6))
    np.testing.assert_allclose(got[0], [0.1, 0.6 + 1e-5], rtol=1e-6)
    np.testing.assert_allclose(got[1], [BIG, BIG], rtol=1e-6)


def test_vmap_over_batch(rng):
    import jax

    costs = rng.uniform(0, 1, size=(4, 10, 10)).astype(np.float32)
    got = np.asarray(jax.vmap(solve_assignment)(jnp.asarray(costs)))
    for b in range(4):
        ri, ci = linear_sum_assignment(costs[b])
        assert total_cost(costs[b], got[b]) == pytest.approx(costs[b][ri, ci].sum(), abs=1e-5)
