"""Marginal device cost via N-scaling: subtract the host-dispatch floor."""
import time
import numpy as np
import jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
from vehicle_counting_tpu.ops.pallas.assignment import solve_assignment_sub_pallas

def timeit(p, *a, chain=4):
    r = p(*a); np.asarray(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(chain):
            r = p(*a)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1e3  # ms per dispatch

def scan_prog(n, body_ops):
    @jax.jit
    def prog(x0):
        def body(c, _):
            y = c
            for _ in range(body_ops):
                y = y * 1.0001 + 0.1
            return y, None
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c.sum()
    return prog

x0 = jnp.zeros((8, 128), jnp.float32)
for ops in (0, 10):
    t_small = timeit(scan_prog(256, ops), x0)
    t_big = timeit(scan_prog(4096, ops), x0)
    print(f"scan body={ops:2d} ops: marginal {(t_big - t_small)/ (4096-256) * 1e3:7.2f} us/iter  (dispatch floor ~{t_small:.2f} ms)")

S = 64
rng = np.random.default_rng(0)
cost = jnp.asarray(np.minimum(rng.uniform(0, 1, (S, S)), 0.2 + 1e-5), jnp.float32)

def solver_prog(n, nr):
    @jax.jit
    def prog(c):
        def body(acc, _):
            r = solve_assignment_sub_pallas(c + acc * 0.0, jnp.int32(nr), jnp.int32(nr))
            return acc + r.sum(), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return acc
    return prog

for nr in (1, 8, 30):
    t_small = timeit(solver_prog(64, nr), cost)
    t_big = timeit(solver_prog(512, nr), cost)
    print(f"solver nr={nr:3d}: marginal {(t_big - t_small)/(512-64)*1e3:7.2f} us/solve")
