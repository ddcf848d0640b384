"""Fused ReID stage-1 block kernel vs the XLA block (interpret mode).

The kernel reproduces models/reid._basic_block's inference path (conv3x3 +
folded BN + ReLU twice, residual add) with a different conv summation order,
so parity is to conv tolerance, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vehicle_counting_tpu.models.reid as reid_mod
from vehicle_counting_tpu.models.reid import BN_EPS, _basic_block
from vehicle_counting_tpu.ops.pallas.reid_block import reid_block64_pallas


def _block_params(rng, c=64):
    p = {
        "conv1": {"w": jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)},
        "conv2": {"w": jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)},
        "bn1": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
        "bn2": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
    }
    s = {
        "bn1": {"mean": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)},
        "bn2": {"mean": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)},
    }
    return p, s


def _fold(bn_p, bn_s):
    a = jax.lax.rsqrt(bn_s["var"] + BN_EPS) * bn_p["scale"]
    return a, bn_p["bias"] - bn_s["mean"] * a


@pytest.mark.parametrize("n", [8, 5])  # G-divisible and padded tails
def test_kernel_matches_xla_block_f32(rng, n):
    p, s = _block_params(rng)
    x = jnp.asarray(rng.standard_normal((n, 25, 25, 64)) * 0.5, jnp.float32)
    want, _ = _basic_block(p, s, x, 1, train=False, dtype=None)
    a1, b1 = _fold(p["bn1"], s["bn1"])
    a2, b2 = _fold(p["bn2"], s["bn2"])
    got = reid_block64_pallas(
        x, p["conv1"]["w"], p["conv2"]["w"], a1, b1, a2, b2,
        use_bf16=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-4, rtol=1e-4
    )


def test_kernel_matches_xla_block_bf16(rng):
    p, s = _block_params(rng)
    x = jnp.asarray(rng.standard_normal((8, 25, 25, 64)) * 0.5, jnp.bfloat16)
    want, _ = _basic_block(p, s, x.astype(jnp.float32), 1, train=False,
                           dtype=jnp.bfloat16)
    a1, b1 = _fold(p["bn1"], s["bn1"])
    a2, b2 = _fold(p["bn2"], s["bn2"])
    got = reid_block64_pallas(
        x, p["conv1"]["w"], p["conv2"]["w"], a1, b1, a2, b2,
        use_bf16=True, interpret=True,
    ).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.15, rtol=0.05
    )


def test_reid_forward_dispatch(rng, monkeypatch):
    """reid_forward with the kernel forced (interpret) stays close to the
    XLA path and leaves BN stats untouched in inference."""
    from vehicle_counting_tpu.models.reid import init_reid, reid_forward

    params, stats = init_reid(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((6, 50, 50, 3)) * 0.3, jnp.float32)
    want, _ = reid_forward(params, stats, x, train=False, reid=True)

    monkeypatch.setattr(reid_mod, "FORCE_PALLAS_REID_BLOCK", True)
    got, new_stats = reid_forward(params, stats, x, train=False, reid=True)
    # L2-normalized embeddings: compare by cosine (conv order tolerance)
    cos = np.sum(np.asarray(got) * np.asarray(want), axis=1)
    assert cos.min() > 0.9999, cos.min()
    a = jax.tree.flatten(new_stats["layer1_0"])[0]
    b = jax.tree.flatten(stats["layer1_0"])[0]
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
