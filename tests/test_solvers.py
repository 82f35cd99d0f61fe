"""Tests for two-view initialization, pose optimization and matching using a
synthetic-scene simulator (known poses + 3D points -> projected tracks), the
test strategy SURVEY.md §4 prescribes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from orb_slam_tpu.solvers import initialize_two_view, pose_optimize
from orb_slam_tpu.ops.matching import (
    match, hamming_matrix, window_gate, rotation_consistency_mask,
)

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_scene(rng, n=300, depth=(4.0, 10.0)):
    pts = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(*depth, n)
    ], 1).astype(np.float32)
    return pts


def project(pts, R, t, noise=0.0, rng=None):
    pc = pts @ R.T + t
    uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    if noise and rng is not None:
        uv = uv + rng.normal(0, noise, uv.shape)
    return uv.astype(np.float32), pc[:, 2]


class TestTwoView:
    def _run(self, rng, R2, t2, noise=0.5, outlier_frac=0.15):
        pts = make_scene(rng)
        uv1, z1 = project(pts, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                          noise, rng)
        uv2, z2 = project(pts, R2, t2, noise, rng)
        n = len(pts)
        n_out = int(outlier_frac * n)
        out_idx = rng.choice(n, n_out, replace=False)
        uv2[out_idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
        valid = (z1 > 0.1) & (z2 > 0.1)
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(0))
        return res, pts, out_idx

    def test_translation_recovers_pose(self, rng):
        R2 = ScipyRot.from_rotvec([0.02, -0.05, 0.01]).as_matrix().astype(np.float32)
        t2 = np.array([-0.8, 0.1, 0.05], np.float32)
        res, pts, out_idx = self._run(rng, R2, t2)
        assert bool(res.success)
        R_est, t_est = np.asarray(res.R21), np.asarray(res.t21)
        assert np.abs(R_est - R2).max() < 0.02
        t_dir = t2 / np.linalg.norm(t2)
        assert np.abs(np.abs(t_est @ t_dir) - 1.0) < 0.01
        # outliers should not be triangulated
        tri = np.asarray(res.is_triangulated)
        assert tri[out_idx].mean() < 0.1
        assert tri.sum() > 150
        # triangulated points match ground truth up to scale
        X = np.asarray(res.points3d)[tri]
        gt = pts[tri]
        scale = np.median(X[:, 2] / gt[:, 2])
        err = np.linalg.norm(X / scale - gt, axis=1)
        assert np.median(err) < 0.1

    def test_planar_scene_uses_homography(self, rng):
        # all points on a plane -> H model must win
        n = 300
        pts = np.stack([
            rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)
        ], 1).astype(np.float32)
        R2 = ScipyRot.from_rotvec([0.0, -0.04, 0.0]).as_matrix().astype(np.float32)
        t2 = np.array([-0.6, 0.0, 0.1], np.float32)
        uv1, z1 = project(pts, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0.3, rng)
        uv2, z2 = project(pts, R2, t2, 0.3, rng)
        valid = np.ones(n, bool)
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(1))
        assert bool(res.used_homography)
        assert bool(res.success)
        assert np.abs(np.asarray(res.R21) - R2).max() < 0.02

    def test_pure_rotation_fails(self, rng):
        """Documented failure mode (reference README.md:181-189): no
        translation -> no parallax -> init must refuse."""
        R2 = ScipyRot.from_rotvec([0.0, 0.1, 0.0]).as_matrix().astype(np.float32)
        t2 = np.zeros(3, np.float32)
        res, _, _ = self._run(rng, R2, t2, noise=0.3, outlier_frac=0.0)
        assert not bool(res.success)


class TestPoseOpt:
    def test_converges_from_perturbed_pose(self, rng):
        pts = make_scene(rng, 200)
        R = ScipyRot.from_rotvec([0.05, -0.1, 0.02]).as_matrix().astype(np.float32)
        t = np.array([0.3, -0.2, 0.1], np.float32)
        uv, z = project(pts, R, t, noise=0.5, rng=rng)
        # 20% outliers
        n_out = 40
        out_idx = rng.choice(200, n_out, replace=False)
        uv[out_idx] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
        T_true = np.eye(4, dtype=np.float32)
        T_true[:3, :3], T_true[:3, 3] = R, t
        # perturb
        dR = ScipyRot.from_rotvec(rng.normal(0, 0.03, 3)).as_matrix()
        T0 = T_true.copy()
        T0[:3, :3] = (dR @ R).astype(np.float32)
        T0[:3, 3] += rng.normal(0, 0.1, 3).astype(np.float32)
        T_est, inlier, n_in = pose_optimize(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(200, jnp.float32), jnp.ones(200, bool), jnp.asarray(K))
        T_est = np.asarray(T_est)
        assert np.abs(T_est[:3, :3] - R).max() < 5e-3
        assert np.abs(T_est[:3, 3] - t).max() < 2e-2
        inlier = np.asarray(inlier)
        assert inlier[out_idx].mean() < 0.2
        assert int(n_in) > 120

    def test_keeps_pose_when_already_optimal(self, rng):
        pts = make_scene(rng, 100)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        uv, _ = project(pts, R, t)
        T0 = np.eye(4, dtype=np.float32)
        T_est, _, n_in = pose_optimize(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(100, jnp.float32), jnp.ones(100, bool), jnp.asarray(K))
        assert np.abs(np.asarray(T_est) - T0).max() < 1e-4
        assert int(n_in) == 100


class TestMatching:
    def test_hamming_matrix(self, rng):
        a = rng.integers(0, 2**32, (5, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (7, 8), dtype=np.uint32)
        D = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        for i in range(5):
            for j in range(7):
                expected = bin(int.from_bytes((a[i] ^ b[j]).tobytes(), "little")).count("1")
                assert D[i, j] == expected

    def test_match_finds_permutation(self, rng):
        n = 50
        a = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        perm = rng.permutation(n)
        b = a[perm]
        # flip 5 random bits in each b
        for i in range(n):
            for _ in range(5):
                w = rng.integers(0, 8)
                b[i, w] ^= np.uint32(1 << rng.integers(0, 32))
        idx, dist, ok = match(jnp.asarray(a), jnp.asarray(b), max_dist=20,
                              mutual=True)
        idx, ok = np.asarray(idx), np.asarray(ok)
        inv = np.argsort(perm)
        assert ok.mean() > 0.9
        assert (idx[ok] == inv[ok]).all()

    def test_nn_ratio_rejects_ambiguous(self, rng):
        a = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)
        b = np.concatenate([a, a], 0)
        # best at 10 bits, second at 12 bits: 10 >= 0.7*12 -> ambiguous
        for k in range(10):
            b[0, k % 8] ^= np.uint32(1 << k)
        for k in range(12):
            b[1, k % 8] ^= np.uint32(1 << (k + 12))
        _, _, ok = match(jnp.asarray(a), jnp.asarray(b), max_dist=64,
                         nn_ratio=0.7, unique=False)
        assert not bool(ok[0])
        # unambiguous case passes: best 10, second 40
        b2 = np.concatenate([b[:1], rng.integers(0, 2**32, (1, 8), dtype=np.uint32)], 0)
        _, _, ok2 = match(jnp.asarray(a), jnp.asarray(b2), max_dist=64,
                          nn_ratio=0.7, unique=False)
        assert bool(ok2[0])

    def test_window_gate(self):
        xa = jnp.asarray([[10.0, 10.0], [100.0, 100.0]])
        xb = jnp.asarray([[12.0, 10.0], [100.0, 108.0], [300.0, 300.0]])
        g = np.asarray(window_gate(xa, xb, 5.0))
        assert g[0, 0] and not g[0, 1] and not g[0, 2]
        assert not g[1, 0] and not g[1, 1]

    def test_rotation_consistency(self, rng):
        n = 100
        angle_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        angle_b = (angle_a - 0.5).astype(np.float32)  # consistent rotation
        bad = rng.choice(n, 10, replace=False)
        angle_b[bad] = rng.uniform(0, 2 * np.pi, 10)
        valid = np.ones(n, bool)
        kept = np.asarray(rotation_consistency_mask(
            jnp.asarray(angle_a), jnp.asarray(angle_b), jnp.asarray(valid)))
        good = np.setdiff1d(np.arange(n), bad)
        assert kept[good].mean() > 0.95
        assert kept[bad].mean() < 0.4

    def test_unique_resolution(self):
        # two rows both match column 0; row with smaller distance wins
        a = np.zeros((2, 8), np.uint32)
        a[1, 0] = 3  # 2 bits away from b[0]
        b = np.zeros((1, 8), np.uint32)
        idx, dist, ok = match(jnp.asarray(a), jnp.asarray(b), max_dist=64,
                              unique=True)
        ok = np.asarray(ok)
        assert ok[0] and not ok[1]


class TestPosePallasParity:
    def test_pallas_chain_matches_xla(self, rng):
        """The TPU Pallas pose-GN kernel (pose_opt_pallas.py) must agree
        with the XLA _gn_rounds chain (interpret mode; ~3e-7 on CPU, ~1e-3
        on real hardware from Mosaic accumulation order)."""
        from orb_slam_tpu.solvers.pose_opt import _gn_rounds
        from orb_slam_tpu.solvers.pose_opt_pallas import pose_optimize_pallas

        N = 300
        pts = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                        rng.uniform(4, 10, N)], 1).astype(np.float32)
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]],
                     np.float32)
        T_true = np.eye(4, dtype=np.float32)
        T_true[:3, 3] = [0.1, -0.05, 0.02]
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) * 500.0 + [320, 240] + \
            rng.normal(0, 1.0, (N, 2))
        uv[::7] += rng.normal(0, 40, uv[::7].shape)  # outliers
        valid = rng.random(N) > 0.1
        inv_s2 = (1.0 / 1.2 ** (2 * rng.integers(0, 8, N))).astype(
            np.float32)
        T0 = jnp.eye(4)
        for it in [(4, 3, 2, 2), (10, 10, 7, 5)]:
            Ta, ia = _gn_rounds(T0, jnp.asarray(pts), jnp.asarray(uv),
                                jnp.asarray(inv_s2), jnp.asarray(valid),
                                jnp.asarray(K), iters=it)
            Tb, ib, nb = pose_optimize_pallas(
                T0, jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(inv_s2),
                jnp.asarray(valid), jnp.asarray(K), iters=it,
                interpret=True)
            np.testing.assert_allclose(np.asarray(Ta), np.asarray(Tb),
                                       atol=1e-4)
            assert int(jnp.sum(ia != ib)) <= max(2, int(0.01 * N))
            assert int(nb) == int(ia.sum()) or \
                abs(int(nb) - int(ia.sum())) <= 2
