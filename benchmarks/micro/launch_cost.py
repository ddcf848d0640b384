"""Per-launch vs per-row cost of the Pallas solver inside one program."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
from vehicle_counting_tpu.ops.pallas.assignment import solve_assignment_sub_pallas

S = 64
N = 128  # sequential solves per program
rng = np.random.default_rng(0)
costs = jnp.asarray(np.minimum(rng.uniform(0, 1, (N, S, S)), 0.2 + 1e-5), jnp.float32)

def make(nr):
    @jax.jit
    def prog(cs):
        def body(acc, c):
            r = solve_assignment_sub_pallas(c, jnp.int32(nr), jnp.int32(nr))
            return acc + r.sum(), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), cs)
        return acc
    return prog

for nr in (1, 8, 30):
    prog = make(nr)
    r = prog(costs); np.asarray(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            r = prog(costs)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    print(f"nr={nr:3d}: {best/4/N*1e6:8.1f} us/solve")
