"""Batched constant-velocity Kalman filter for DeepSORT track state.

Same filter spec as the reference (networks/deepsort/sort/kalman_filter.py):
8-d state (cx, cy, a, h, vx, vy, va, vh), dt = 1, observation = (cx, cy, a,
h); noise scales relative to box height with std_weight_position = 1/20 and
std_weight_velocity = 1/160 (kalman_filter.py:52-53); exact std tables for
initiate (:76-84), predict (:108-117), and project (innovation std 1e-1 on
aspect, :141-146); chi-square 95% gate for 4 dof = 9.4877
(kalman_filter.py:11-20).

Everything is batched over the leading track axis [K, ...] — predict/update/
gating are single fused einsum+Cholesky passes over all track slots instead
of the reference's per-track Python calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STD_W_POS = 1.0 / 20
STD_W_VEL = 1.0 / 160
CHI2INV95_4DOF = 9.4877

# numpy (host) constants: module-level DEVICE arrays would force remote
# syncs at every trace on networked TPU backends
import numpy as _np

_F = _np.eye(8, dtype=_np.float32)
_F[_np.arange(4), _np.arange(4) + 4] = 1.0
_H = _np.eye(4, 8, dtype=_np.float32)


def initiate(measurement: jax.Array):
    """measurement [..., 4] xyah -> (mean [..., 8], cov [..., 8, 8])."""
    m = measurement
    mean = jnp.concatenate([m, jnp.zeros_like(m)], axis=-1)
    h = m[..., 3]
    std = jnp.stack(
        [
            2 * STD_W_POS * h,
            2 * STD_W_POS * h,
            jnp.full_like(h, 1e-2),
            2 * STD_W_POS * h,
            10 * STD_W_VEL * h,
            10 * STD_W_VEL * h,
            jnp.full_like(h, 1e-5),
            10 * STD_W_VEL * h,
        ],
        axis=-1,
    )
    cov = jnp.zeros(m.shape[:-1] + (8, 8), jnp.float32)
    cov = cov.at[..., jnp.arange(8), jnp.arange(8)].set(jnp.square(std))
    return mean, cov


def predict(mean: jax.Array, cov: jax.Array):
    """Batched predict: mean [K, 8], cov [K, 8, 8]. Q built from CURRENT h."""
    h = mean[..., 3]
    std = jnp.stack(
        [
            STD_W_POS * h,
            STD_W_POS * h,
            jnp.full_like(h, 1e-2),
            STD_W_POS * h,
            STD_W_VEL * h,
            STD_W_VEL * h,
            jnp.full_like(h, 1e-5),
            STD_W_VEL * h,
        ],
        axis=-1,
    )
    q = jnp.zeros(cov.shape, jnp.float32)
    q = q.at[..., jnp.arange(8), jnp.arange(8)].set(jnp.square(std))
    new_mean = mean @ _F.T
    new_cov = jnp.einsum("ij,...jk,lk->...il", _F, cov, _F) + q
    return new_mean, new_cov


def project(mean: jax.Array, cov: jax.Array):
    """State -> measurement space: ([..., 4], [..., 4, 4]) with innovation R."""
    h = mean[..., 3]
    std = jnp.stack(
        [STD_W_POS * h, STD_W_POS * h, jnp.full_like(h, 1e-1), STD_W_POS * h],
        axis=-1,
    )
    r = jnp.zeros(mean.shape[:-1] + (4, 4), jnp.float32)
    r = r.at[..., jnp.arange(4), jnp.arange(4)].set(jnp.square(std))
    z = mean[..., :4]
    s = cov[..., :4, :4] + r
    return z, s


def update(mean: jax.Array, cov: jax.Array, measurement: jax.Array):
    """Batched correction. measurement [..., 4] xyah."""
    z, s = project(mean, cov)
    # K = P H^T S^-1 via Cholesky; P H^T = cov[..., :, :4]
    chol = jnp.linalg.cholesky(s)
    pht = cov[..., :, :4]  # [..., 8, 4]
    # solve S X = (P H^T)^T -> X = S^-1 (P H^T)^T ; gain = X^T
    rhs = jnp.swapaxes(pht, -1, -2)  # [..., 4, 8]
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )  # [..., 4, 8]
    gain = jnp.swapaxes(x, -1, -2)  # [..., 8, 4]
    innov = measurement - z  # [..., 4]
    new_mean = mean + jnp.einsum("...ij,...j->...i", gain, innov)
    new_cov = cov - jnp.einsum("...ij,...jk,...lk->...il", gain, s, gain)
    return new_mean, new_cov


def gating_distance(mean: jax.Array, cov: jax.Array, measurements: jax.Array):
    """Squared Mahalanobis distance of each measurement to each track.

    mean [K, 8], cov [K, 8, 8], measurements [D, 4] -> [K, D].
    """
    z, s = project(mean, cov)  # [K,4], [K,4,4]
    chol = jnp.linalg.cholesky(s)  # [K,4,4]
    d = measurements[None, :, :] - z[:, None, :]  # [K,D,4]
    dt = jnp.swapaxes(d, -1, -2)  # [K,4,D]
    zsol = jax.scipy.linalg.solve_triangular(chol, dt, lower=True)  # [K,4,D]
    return jnp.sum(jnp.square(zsol), axis=-2)  # [K,D]


def to_tlwh(mean: jax.Array) -> jax.Array:
    """Track state xyah -> tlwh (track.py:86-99 semantics)."""
    cx, cy, a, h = mean[..., 0], mean[..., 1], mean[..., 2], mean[..., 3]
    w = a * h
    return jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=-1)
