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
