"""Class-parallel fused-cascade kernel == the one-grid-step-per-class kernel.

The class-parallel body (ops/pallas/cascade.py::_cascade_cp_kernel_body)
advances all C classes' cascade/Dijkstra state machines in the same loop
iterations with per-class freeze masks; every class's masked execution must
be op-for-op identical to its solo run. These tests drive both kernels
(interpret mode on the CPU mesh) over randomized multi-class scenarios —
mixed row/det counts, empty classes, multi-level cascades, tie-heavy
clamped costs — and require bitwise-equal outputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vehicle_counting_tpu.ops.pallas.cascade import (
    LVL_SENTINEL,
    cascade_match_batched,
    cascade_match_classparallel,
)


def _random_scenario(rng, c, k, max_lvl):
    # heavy clamp ties, like the real gated costs
    g = np.minimum(rng.uniform(0.0, 0.4, (c, k, k)), 0.2 + 1e-5).astype(
        np.float32
    )
    i = np.minimum(rng.uniform(0.0, 1.0, (c, k, k)), 0.6 + 1e-5).astype(
        np.float32
    )
    lvl = np.full((c, k), LVL_SENTINEL, np.int32)
    tent = np.zeros((c, k), np.int32)
    valid = np.zeros((c, k), np.int32)
    for cc in range(c):
        nt = int(rng.integers(0, k + 1))
        nd = int(rng.integers(0, k + 1))
        lvl[cc, :nt] = rng.integers(0, max_lvl, nt)
        tent[cc, rng.permutation(k)[: rng.integers(0, 4)]] = 1
        valid[cc, :nd] = 1
    crank = np.argsort(rng.random((c, k)), axis=1).astype(np.int32)
    irank = np.argsort(rng.random((c, k)), axis=1).astype(np.int32)
    order = np.argsort(rng.random((c, k)), axis=1).astype(np.int32)
    return tuple(
        jnp.asarray(x) for x in (g, i, lvl, tent, crank, irank, valid, order)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_class_parallel_matches_grid_kernel(seed):
    rng = np.random.default_rng(seed)
    for _ in range(4):
        c = int(rng.integers(1, 5))
        args = _random_scenario(rng, c, 16, max_lvl=6)
        a = cascade_match_batched(*args, 0.2, 0.6, max_age=8, interpret=True)
        b = cascade_match_classparallel(
            *args, 0.2, 0.6, max_age=8, interpret=True
        )
        for x, y, name in zip(a, b, ("det_free", "det_key", "out_row")):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"C={c} {name}"
            )


def test_empty_and_full_classes():
    rng = np.random.default_rng(7)
    c, k = 3, 16
    args = list(_random_scenario(rng, c, k, max_lvl=4))
    # class 0: no dets; class 1: no tracks; class 2 full
    valid = np.asarray(args[6]).copy()
    lvl = np.asarray(args[2]).copy()
    valid[0] = 0
    lvl[1] = LVL_SENTINEL
    valid[2] = 1
    lvl[2] = 0
    args[6] = jnp.asarray(valid)
    args[2] = jnp.asarray(lvl)
    a = cascade_match_batched(*args, 0.2, 0.6, max_age=8, interpret=True)
    b = cascade_match_classparallel(*args, 0.2, 0.6, max_age=8, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
