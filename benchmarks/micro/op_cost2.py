"""Scatter vs one-hot/gather formulations at tracker sizes."""
import time
import numpy as np
import jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()

def timeit(p, *a, chain=4):
    r = p(*a); np.asarray(jax.tree.leaves(r)[0])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(chain):
            r = p(*a)
        np.asarray(jax.tree.leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1e3

def marginal(make_body, seed, n1=64, n2=512):
    def prog(n):
        @jax.jit
        def p(c):
            def body(c, _):
                return make_body(c), None
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c
        return p
    a = timeit(prog(n1), seed)
    b = timeit(prog(n2), seed)
    return (b - a) / (n2 - n1) * 1e3

K, B, F, P = 64, 60, 512, 8
rng = np.random.default_rng(0)

# ring insert: scatter vs gather formulation, single and C=4-batched
g0 = jnp.asarray(rng.uniform(0, 1, (K, B, F)), jnp.float32)
pend0 = jnp.asarray(rng.uniform(0, 1, (K, P, F)), jnp.float32)
cnt0 = jnp.asarray(rng.integers(0, B, (K,)), jnp.int32)
pc0 = jnp.asarray(rng.integers(0, P + 1, (K,)), jnp.int32)

def ring_scatter(c):
    g, cnt = c
    i_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
    put = (i_idx < pc0[:, None])
    pos = jnp.where(put, (cnt[:, None] + i_idx) % B, B)
    krows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, P))
    g = g.at[krows, pos].set(pend0, mode="drop")
    return (g, (cnt + 1) % B)

def ring_gather(c):
    g, cnt = c
    j = jnp.arange(B, dtype=jnp.int32)[None, :]            # [1,B]
    i_for = (j - cnt[:, None]) % B                          # [K,B]
    upd = i_for < pc0[:, None]
    src = jnp.clip(i_for, 0, P - 1)
    vals = jnp.take_along_axis(pend0, src[:, :, None], axis=1)  # [K,B,F]
    g = jnp.where(upd[:, :, None], vals, g)
    return (g, (cnt + 1) % B)

print(f"ring scatter F=512      {marginal(ring_scatter, (g0, cnt0)):8.2f} us")
print(f"ring gather  F=512      {marginal(ring_gather, (g0, cnt0)):8.2f} us")

C = 4
g4 = jnp.asarray(rng.uniform(0, 1, (C, K, B, F)), jnp.float32)
pend4 = jnp.asarray(rng.uniform(0, 1, (C, K, P, F)), jnp.float32)
pc4 = jnp.asarray(rng.integers(0, P + 1, (C, K)), jnp.int32)

def ring_scatter4(c):
    g, cnt = c
    def one(g, cnt, pend, pc):
        i_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
        put = (i_idx < pc[:, None])
        pos = jnp.where(put, (cnt[:, None] + i_idx) % B, B)
        krows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, P))
        return g.at[krows, pos].set(pend, mode="drop")
    g = jax.vmap(one)(g, cnt, pend4, pc4)
    return (g, (cnt + 1) % B)

def ring_gather4(c):
    g, cnt = c
    j = jnp.arange(B, dtype=jnp.int32)[None, None, :]
    i_for = (j - cnt[:, :, None]) % B
    upd = i_for < pc4[:, :, None]
    src = jnp.clip(i_for, 0, P - 1)
    vals = jnp.take_along_axis(pend4, src[:, :, :, None], axis=2)
    g = jnp.where(upd[:, :, :, None], vals, g)
    return (g, (cnt + 1) % B)

cnt4 = jnp.asarray(rng.integers(0, B, (C, K)), jnp.int32)
print(f"ring scatter C=4 F=512  {marginal(ring_scatter4, (g4, cnt4)):8.2f} us")
print(f"ring gather  C=4 F=512  {marginal(ring_gather4, (g4, cnt4)):8.2f} us")

# [64] scatter vs one-hot max
v0 = jnp.asarray(rng.uniform(0, 1, (K,)), jnp.float32)
tgt = jnp.asarray(rng.permutation(K), jnp.int32)

def sc64(c):
    return c.at[tgt].set(c * 0.999, mode="drop")

def onehot64(c):
    m = tgt[None, :] == jnp.arange(K)[:, None]
    return jnp.max(jnp.where(m, (c * 0.999)[None, :], -jnp.inf), axis=1)

print(f"[64] scatter            {marginal(sc64, v0):8.2f} us")
print(f"[64] one-hot max        {marginal(onehot64, v0):8.2f} us")

# vmapped [C,64] scatter vs one-hot
v4 = jnp.asarray(rng.uniform(0, 1, (C, K)), jnp.float32)
tgt4 = jnp.asarray(np.stack([rng.permutation(K) for _ in range(C)]), jnp.int32)

def sc64v(c):
    return jax.vmap(lambda x, t: x.at[t].set(x * 0.999, mode="drop"))(c, tgt4)

def onehot64v(c):
    m = tgt4[:, None, :] == jnp.arange(K)[None, :, None]
    return jnp.max(jnp.where(m, (c * 0.999)[:, None, :], -jnp.inf), axis=2)

print(f"[C,64] vmap scatter     {marginal(sc64v, v4):8.2f} us")
print(f"[C,64] one-hot max      {marginal(onehot64v, v4):8.2f} us")
