"""Cost of ONE grid-batched launch solving C matrices vs C single launches."""
import time
import numpy as np
import jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
from vehicle_counting_tpu.ops.pallas.assignment import solve_assignment_sub_pallas

S, C, N = 64, 4, 128
rng = np.random.default_rng(0)
costs = jnp.asarray(np.minimum(rng.uniform(0, 1, (N, C, S, S)), 0.2 + 1e-5), jnp.float32)
nrs = jnp.full((C,), 8, jnp.int32)

@jax.jit
def prog(cs):
    def body(acc, c):
        r = jax.vmap(solve_assignment_sub_pallas)(c, nrs, nrs)
        return acc + r.sum(), None
    acc, _ = jax.lax.scan(body, jnp.int32(0), cs)
    return acc

r = prog(costs); np.asarray(r)
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(4):
        r = prog(costs)
    np.asarray(r)
    best = min(best, time.perf_counter() - t0)
print(f"grid C={C} nr=8: {best/4/N*1e6:8.1f} us/launch ({best/4/N/C*1e6:.1f} us/solve)")
