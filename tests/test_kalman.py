"""Batched Kalman filter vs a numpy oracle with the reference constants."""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from vehicle_counting_tpu.tracking import kalman


class OracleKF:
    """Numpy re-statement of the reference filter spec (kalman_filter.py)."""

    def __init__(self):
        self.F = np.eye(8)
        for i in range(4):
            self.F[i, 4 + i] = 1.0
        self.H = np.eye(4, 8)
        self.swp, self.swv = 1.0 / 20, 1.0 / 160

    def initiate(self, meas):
        mean = np.r_[meas, np.zeros(4)]
        h = meas[3]
        std = [2 * self.swp * h, 2 * self.swp * h, 1e-2, 2 * self.swp * h,
               10 * self.swv * h, 10 * self.swv * h, 1e-5, 10 * self.swv * h]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        h = mean[3]
        std = [self.swp * h, self.swp * h, 1e-2, self.swp * h,
               self.swv * h, self.swv * h, 1e-5, self.swv * h]
        q = np.diag(np.square(std))
        return self.F @ mean, self.F @ cov @ self.F.T + q

    def project(self, mean, cov):
        h = mean[3]
        std = [self.swp * h, self.swp * h, 1e-1, self.swp * h]
        r = np.diag(np.square(std))
        return self.H @ mean, self.H @ cov @ self.H.T + r

    def update(self, mean, cov, meas):
        pm, pc = self.project(mean, cov)
        chol = scipy.linalg.cho_factor(pc, lower=True)
        gain = scipy.linalg.cho_solve(chol, (cov @ self.H.T).T).T
        innov = meas - pm
        return mean + innov @ gain.T, cov - gain @ pc @ gain.T

    def gating(self, mean, cov, meas):
        pm, pc = self.project(mean, cov)
        chol = np.linalg.cholesky(pc)
        d = meas - pm
        z = scipy.linalg.solve_triangular(chol, d.T, lower=True)
        return np.sum(z * z, axis=0)


@pytest.fixture
def oracle():
    return OracleKF()


def _random_xyah(rng, n):
    return np.stack(
        [
            rng.uniform(50, 500, n),
            rng.uniform(50, 500, n),
            rng.uniform(0.3, 2.0, n),
            rng.uniform(20, 200, n),
        ],
        axis=-1,
    ).astype(np.float32)


def test_initiate_predict_update_parity(oracle, rng):
    k = 6
    meas0 = _random_xyah(rng, k)
    mean_j, cov_j = kalman.initiate(jnp.asarray(meas0))
    means, covs = [], []
    for i in range(k):
        m, c = oracle.initiate(meas0[i].astype(np.float64))
        means.append(m)
        covs.append(c)
    np.testing.assert_allclose(np.asarray(mean_j), np.stack(means), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cov_j), np.stack(covs), rtol=1e-4, atol=1e-7)

    # a few predict/update rounds
    meas = meas0
    for step in range(3):
        mean_j, cov_j = kalman.predict(mean_j, cov_j)
        for i in range(k):
            means[i], covs[i] = oracle.predict(means[i], covs[i])
        np.testing.assert_allclose(np.asarray(mean_j), np.stack(means), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(cov_j), np.stack(covs), rtol=1e-3, atol=1e-2)

        meas = meas + rng.normal(0, 2, meas.shape).astype(np.float32)
        mean_j, cov_j = kalman.update(mean_j, cov_j, jnp.asarray(meas))
        for i in range(k):
            means[i], covs[i] = oracle.update(means[i], covs[i], meas[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(mean_j), np.stack(means), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(cov_j), np.stack(covs), rtol=1e-3, atol=1e-2)


def test_gating_distance_parity(oracle, rng):
    k, d = 5, 7
    meas0 = _random_xyah(rng, k)
    mean_j, cov_j = kalman.initiate(jnp.asarray(meas0))
    mean_j, cov_j = kalman.predict(mean_j, cov_j)
    dets = _random_xyah(rng, d)
    got = np.asarray(kalman.gating_distance(mean_j, cov_j, jnp.asarray(dets)))
    assert got.shape == (k, d)
    for i in range(k):
        m, c = oracle.initiate(meas0[i].astype(np.float64))
        m, c = oracle.predict(m, c)
        want = oracle.gating(m, c, dets.astype(np.float64))
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)


def test_to_tlwh():
    mean = jnp.asarray([[100.0, 200.0, 0.5, 60.0, 0, 0, 0, 0]])
    got = np.asarray(kalman.to_tlwh(mean))[0]
    np.testing.assert_allclose(got, [100 - 15, 200 - 30, 30, 60])


def test_gate_threshold_constant():
    assert kalman.CHI2INV95_4DOF == pytest.approx(9.4877)
