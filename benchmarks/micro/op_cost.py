"""Marginal device cost of tracker-hot op types on axon (N-scaling)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()

def timeit(p, *a, chain=4):
    r = p(*a); np.asarray(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(chain):
            r = p(*a)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1e3

def marginal(make_body, n1=128, n2=1024):
    def prog(n):
        @jax.jit
        def p(key):
            def body(c, _):
                return make_body(c), None
            c, _ = jax.lax.scan(body, key, None, length=n)
            return jax.tree.leaves(c)[0].sum()
        return p
    a = timeit(prog(n1), seed)
    b = timeit(prog(n2), seed)
    return (b - a) / (n2 - n1) * 1e3

K = 64
rng = np.random.default_rng(0)
seed0 = jnp.asarray(rng.uniform(0, 1, (K, K)), jnp.float32)
perm = jnp.asarray(rng.permutation(K), jnp.int32)

seed = seed0
print(f"row gather [64,64]     {marginal(lambda c: c[perm] + 1e-7):7.2f} us")
print(f"col gather [64,64]     {marginal(lambda c: c[:, perm] + 1e-7):7.2f} us")
print(f"transpose  [64,64]     {marginal(lambda c: c.T + 1e-7):7.2f} us")
print(f"pad 64->128            {marginal(lambda c: jnp.pad(c, ((0,0),(0,64)))[ :, :64] + 1e-7):7.2f} us")
print(f"argsort [64]           {marginal(lambda c: c.at[0].set(jnp.argsort(c[0]).astype(jnp.float32))):7.2f} us")
print(f"scatter1d [64]         {marginal(lambda c: c.at[perm, 0].set(c[:,1])):7.2f} us")

seed = jnp.asarray(rng.uniform(1, 2, (K, 4, 4)), jnp.float32)
def chol_body(c):
    s = jnp.einsum('kij,klj->kil', c, c) + 1e-3 * jnp.eye(4)
    return c + 1e-9 * jnp.linalg.cholesky(s)
print(f"cholesky [64,4,4]      {marginal(chol_body):7.2f} us")

seed = jnp.asarray(rng.uniform(1, 2, (K, 4, 8)), jnp.float32)
def trisolve_body(c):
    import jax.scipy.linalg as jsl
    a = jnp.eye(4) + 0.1 * jnp.tril(jnp.ones((4,4)))
    y = jsl.solve_triangular(jnp.broadcast_to(a, (K,4,4)), c, lower=True)
    return c + 1e-9 * y
print(f"trisolve [64,4,8]      {marginal(trisolve_body):7.2f} us")

seed = (jnp.asarray(rng.uniform(0,1,(K, 60, 128)), jnp.float32), jnp.asarray(rng.integers(0,60,(K,8)), jnp.int32))
def ringscatter_body(c):
    g, pos = c
    krows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, 8))
    vals = jnp.zeros((K, 8, 128), jnp.float32)
    g = g.at[krows, pos].set(vals)
    return (g, (pos + 1) % 60)
print(f"ring scatter [64,60,128] {marginal(ringscatter_body):7.2f} us")

seed = jnp.asarray(rng.uniform(0, 1, (K, 60, 512)), jnp.float32)
f = jnp.asarray(rng.uniform(0, 1, (K, 512)), jnp.float32)
def einsum_body(c):
    sims = jnp.einsum("kbf,df->kbd", c, f)
    return c + 1e-12 * sims.min(axis=1)[:, None, :].sum(-1, keepdims=True)
print(f"gallery einsum [64,60,512]x[64,512] {marginal(einsum_body):7.2f} us")
