"""Tests for EPnP RANSAC, Sim3 RANSAC + optimization, essential graph."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from orb_slam_tpu.solvers.epnp import epnp_solve, epnp_ransac
from orb_slam_tpu.solvers.sim3 import sim3_ransac, optimize_sim3
from orb_slam_tpu.solvers.essential_graph import (
    optimize_essential_graph, relative_sim3,
)
from orb_slam_tpu.geometry.sim3 import sim3_compose, sim3_inverse, sim3_exp

K_MAT = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_pnp_problem(rng, n=50, noise=0.5, outliers=0):
    pw = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                   rng.uniform(4, 10, n)], 1).astype(np.float32)
    R = ScipyRot.from_rotvec([0.2, -0.3, 0.1]).as_matrix().astype(np.float32)
    t = np.array([0.5, -0.3, 1.0], np.float32)
    pc = pw @ R.T + t
    uv = (pc[:, :2] / pc[:, 2:3]) * [500, 500] + [320, 240]
    uv = (uv + rng.normal(0, noise, uv.shape)).astype(np.float32)
    if outliers:
        bad = rng.choice(n, outliers, replace=False)
        uv[bad] += rng.uniform(30, 100, (outliers, 2))
    return pw, uv, R, t


class TestEPnP:
    def test_exact_solve(self, rng):
        pw, uv, R, t = make_pnp_problem(rng, n=12, noise=0.0)
        R_est, t_est = epnp_solve(jnp.asarray(pw), jnp.asarray(uv),
                                  jnp.asarray(K_MAT))
        assert np.abs(np.asarray(R_est) - R).max() < 5e-3
        assert np.abs(np.asarray(t_est) - t).max() < 2e-2

    def test_ransac_with_outliers(self, rng):
        n = 60
        pw, uv, R, t = make_pnp_problem(rng, n=n, noise=0.5, outliers=15)
        R_est, t_est, inl, n_in = epnp_ransac(
            jnp.asarray(pw), jnp.asarray(uv), jnp.ones(n, bool),
            jnp.ones(n, jnp.float32), jnp.asarray(K_MAT),
            jax.random.PRNGKey(0))
        assert int(n_in) > 35
        assert np.abs(np.asarray(R_est) - R).max() < 0.05
        assert np.abs(np.asarray(t_est) - t).max() < 0.15


def make_sim3_problem(rng, n=40, noise=0.3, outliers=0, s_true=1.4):
    # 3D points seen in two "keyframes" related by a Sim3
    p1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(4, 8, n)], 1).astype(np.float32)
    R = ScipyRot.from_rotvec([0.05, 0.3, -0.1]).as_matrix().astype(np.float32)
    t = np.array([0.4, -0.2, 0.5], np.float32)
    # p1 = s R p2 + t  =>  p2 = R^T (p1 - t)/s
    p2 = ((p1 - t) / s_true) @ R
    uv1 = ((p1[:, :2] / p1[:, 2:3]) * [500, 500] + [320, 240]).astype(np.float32)
    uv2 = ((p2[:, :2] / p2[:, 2:3]) * [500, 500] + [320, 240]).astype(np.float32)
    uv1 += rng.normal(0, noise, uv1.shape).astype(np.float32)
    uv2 += rng.normal(0, noise, uv2.shape).astype(np.float32)
    if outliers:
        bad = rng.choice(n, outliers, replace=False)
        p2[bad] += rng.uniform(1, 3, (outliers, 3))
    return p1.astype(np.float32), p2.astype(np.float32), uv1, uv2, R, t, s_true


class TestSim3:
    def test_ransac_recovers(self, rng):
        n = 40
        p1, p2, uv1, uv2, R, t, s_true = make_sim3_problem(rng, n, outliers=10)
        ones = jnp.ones(n, jnp.float32)
        s, R_e, t_e, inl, n_in = sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(n, bool), ones, ones,
            jnp.asarray(K_MAT), jax.random.PRNGKey(1))
        assert int(n_in) >= 25
        assert float(s) == pytest.approx(s_true, rel=0.02)
        assert np.abs(np.asarray(R_e) - R).max() < 0.02

    def test_optimize_refines(self, rng):
        n = 40
        p1, p2, uv1, uv2, R, t, s_true = make_sim3_problem(rng, n, noise=0.5)
        # perturb initial estimate
        R0 = (ScipyRot.from_rotvec([0.02, -0.01, 0.015]).as_matrix() @ R).astype(np.float32)
        s0 = jnp.asarray(s_true * 1.05)
        t0 = jnp.asarray(t + 0.05)
        ones = jnp.ones(n, jnp.float32)
        s, R_e, t_e, inl, n_in = optimize_sim3(
            s0, jnp.asarray(R0), t0, jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool),
            ones, ones, jnp.asarray(K_MAT))
        assert int(n_in) > 30
        assert float(s) == pytest.approx(s_true, rel=0.01)
        assert np.abs(np.asarray(R_e) - R).max() < 0.01
        assert np.abs(np.asarray(t_e) - t).max() < 0.05


class TestEssentialGraph:
    def test_loop_correction_distributes_drift(self, rng):
        """Chain of K keyframes with accumulated drift; loop edge between
        first and last pins the truth; optimization should spread the error."""
        K = 12
        # ground truth: poses on a circle (world->cam translations)
        true_s = np.ones(K, np.float32)
        true_R = np.stack([np.eye(3, dtype=np.float32)] * K)
        true_t = np.stack(
            [np.array([0.5 * k, 0, 0], np.float32) for k in range(K)])
        # drifted estimates: small error added per step, compounding
        est_s = np.ones(K, np.float32)
        est_R = true_R.copy()
        est_t = true_t.copy()
        drift = np.zeros(3, np.float32)
        for k in range(1, K):
            drift += np.array([0.02, 0.01, 0.0], np.float32)
            est_t[k] = true_t[k] + drift
            est_s[k] = 1.0 + 0.01 * k

        edges_i, edges_j = [], []
        ms, mR, mt = [], [], []
        # spanning-tree edges with TRUE relative measurements
        for k in range(K - 1):
            edges_i.append(k); edges_j.append(k + 1)
            rs, rR, rt = relative_sim3(
                jnp.asarray(true_s[k]), jnp.asarray(true_R[k]), jnp.asarray(true_t[k]),
                jnp.asarray(true_s[k + 1]), jnp.asarray(true_R[k + 1]), jnp.asarray(true_t[k + 1]))
            ms.append(float(rs)); mR.append(np.asarray(rR)); mt.append(np.asarray(rt))
        # loop edge 0 -> K-1 (true relative)
        edges_i.append(0); edges_j.append(K - 1)
        rs, rR, rt = relative_sim3(
            jnp.asarray(true_s[0]), jnp.asarray(true_R[0]), jnp.asarray(true_t[0]),
            jnp.asarray(true_s[K - 1]), jnp.asarray(true_R[K - 1]), jnp.asarray(true_t[K - 1]))
        ms.append(float(rs)); mR.append(np.asarray(rR)); mt.append(np.asarray(rt))

        E = len(edges_i)
        fixed = np.zeros(K, bool); fixed[0] = True
        s_o, R_o, t_o = optimize_essential_graph(
            jnp.asarray(est_s), jnp.asarray(est_R), jnp.asarray(est_t),
            jnp.asarray(edges_i, dtype=jnp.int32), jnp.asarray(edges_j, dtype=jnp.int32),
            jnp.asarray(np.array(ms, np.float32)), jnp.asarray(np.stack(mR)),
            jnp.asarray(np.stack(mt)), jnp.ones(E, bool), jnp.asarray(fixed),
            iters=15)
        t_err_before = np.abs(est_t - true_t).max()
        t_err_after = np.abs(np.asarray(t_o) - true_t).max()
        s_err_after = np.abs(np.asarray(s_o) - true_s).max()
        assert t_err_after < t_err_before * 0.1, (t_err_before, t_err_after)
        assert s_err_after < 0.01
        # fixed vertex untouched
        np.testing.assert_allclose(np.asarray(t_o[0]), true_t[0], atol=1e-6)

    def test_cg_solver_matches_dense(self, rng):
        """The matrix-free PCG mode must reach the same optimum as the
        dense Cholesky on the drift-distribution problem (the scaling
        path for maps too large for a [7K,7K] dense solve)."""
        K = 12
        true_s = np.ones(K, np.float32)
        true_R = np.stack([np.eye(3, dtype=np.float32)] * K)
        true_t = np.stack(
            [np.array([0.5 * k, 0, 0], np.float32) for k in range(K)])
        est_s = np.ones(K, np.float32)
        est_t = true_t.copy()
        drift = np.zeros(3, np.float32)
        for k in range(1, K):
            drift += np.array([0.02, 0.01, 0.0], np.float32)
            est_t[k] = true_t[k] + drift
            est_s[k] = 1.0 + 0.01 * k

        edges_i, edges_j, ms, mR, mt = [], [], [], [], []
        pairs = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
        for i, j in pairs:
            edges_i.append(i); edges_j.append(j)
            rs, rR, rt = relative_sim3(
                jnp.asarray(true_s[i]), jnp.asarray(true_R[i]),
                jnp.asarray(true_t[i]),
                jnp.asarray(true_s[j]), jnp.asarray(true_R[j]),
                jnp.asarray(true_t[j]))
            ms.append(float(rs)); mR.append(np.asarray(rR))
            mt.append(np.asarray(rt))
        E = len(edges_i)
        fixed = np.zeros(K, bool); fixed[0] = True
        args = (
            jnp.asarray(est_s), jnp.asarray(true_R), jnp.asarray(est_t),
            jnp.asarray(edges_i, dtype=jnp.int32),
            jnp.asarray(edges_j, dtype=jnp.int32),
            jnp.asarray(np.array(ms, np.float32)), jnp.asarray(np.stack(mR)),
            jnp.asarray(np.stack(mt)), jnp.ones(E, bool), jnp.asarray(fixed),
        )
        s_d, R_d, t_d = optimize_essential_graph(*args, iters=15)
        s_c, R_c, t_c = optimize_essential_graph(
            *args, iters=15, solver="cg", cg_iters=60)
        np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_d),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_d),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(R_c), np.asarray(R_d),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(t_c[0]), true_t[0], atol=1e-6)
