"""TPU parity check: optimized Pallas JV vs XLA solver on clamp-tie matrices."""
import numpy as np
import jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
from vehicle_counting_tpu.ops.pallas.assignment import (
    pallas_assignment_supported, solve_assignment_sub_pallas)
from vehicle_counting_tpu.tracking.assignment import solve_uniform, _insert_rows, BIG

print("supported probe:", pallas_assignment_supported())

S = 64
rng = np.random.default_rng(0)
xla = jax.jit(lambda c, nr, nc: solve_uniform(_insert_rows, c, nr, nc))
pal = jax.jit(lambda c, nr, nc: solve_assignment_sub_pallas(c, nr, nc))

bad = 0
for t in range(300):
    nr = int(rng.integers(1, 40)); nc = int(rng.integers(1, 40))
    c = np.full((S, S), BIG, np.float32)
    sub = rng.uniform(0, 1, (nr, nc)).astype(np.float32)
    # clamp-tie structure like matching_cost_matrix: many entries tied at thr+1e-5
    sub = np.minimum(sub, 0.2 + 1e-5)
    gate = rng.uniform(0, 1, (nr, nc)) < 0.3
    sub[gate] = 0.2 + 1e-5
    c[:nr, :nc] = sub
    cj = jnp.asarray(c)
    a = np.asarray(xla(cj, jnp.int32(nr), jnp.int32(nc)))
    b = np.asarray(pal(cj, jnp.int32(nr), jnp.int32(nc)))
    if not np.array_equal(a, b):
        bad += 1
        if bad <= 3:
            print("MISMATCH", t, nr, nc, np.where(a != b))
print(f"{300 - bad}/300 bitwise-equal")
