"""Fixed cost of a minimal pallas_call on this TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()

def noop_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0

def noop(x):
    return pl.pallas_call(
        noop_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

N = 256
xs = jnp.zeros((N, 64, 128), jnp.float32)

@jax.jit
def prog(xs):
    def body(acc, x):
        return acc + noop(x).sum(), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
    return acc

@jax.jit
def prog_xla(xs):
    def body(acc, x):
        return acc + (x + 1.0).sum(), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
    return acc

for name, p in (("pallas noop", prog), ("xla equiv", prog_xla)):
    r = p(xs); np.asarray(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            r = p(xs)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/4/N*1e6:7.2f} us/iter")
