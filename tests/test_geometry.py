"""Golden tests for the geometry core against scipy/numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from orb_slam_tpu.geometry import (
    so3_exp, so3_log, quat_to_rot, rot_to_quat,
    se3_exp, se3_log, se3_compose, se3_inverse, se3_apply, se3_from_rt,
    sim3_exp, sim3_log, sim3_compose, sim3_inverse, sim3_apply, sim3_to_se3,
    CameraModel, project, undistort_points,
    triangulate_dlt, horn_sim3, parallax_cos, depth_in_frame,
)
from orb_slam_tpu.geometry.camera import distort, unproject


def random_rotvecs(rng, n):
    v = rng.normal(size=(n, 3))
    scale = rng.uniform(0.0, 3.0, size=(n, 1))
    return (v / np.linalg.norm(v, axis=1, keepdims=True) * scale).astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = random_rotvecs(rng, 64)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        R_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_log_roundtrip(self, rng):
        w = random_rotvecs(rng, 64)
        R = so3_exp(jnp.asarray(w))
        w2 = np.asarray(so3_log(R))
        R2 = ScipyRot.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R2, atol=1e-4)

    def test_log_near_pi(self):
        axis = np.array([[0.6, -0.64, 0.48]])
        axis = axis / np.linalg.norm(axis)
        for ang in [np.pi - 1e-4, np.pi - 1e-6, np.pi]:
            w = (axis * ang).astype(np.float32)
            R = ScipyRot.from_rotvec(w).as_matrix().astype(np.float32)
            w2 = np.asarray(so3_log(jnp.asarray(R)))
            R2 = ScipyRot.from_rotvec(w2).as_matrix()
            np.testing.assert_allclose(R, R2, atol=1e-3)

    def test_small_angle(self):
        w = jnp.asarray([[1e-9, -1e-9, 1e-9], [0.0, 0.0, 0.0]], jnp.float32)
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(so3_log(R)), np.asarray(w), atol=1e-6)

    def test_quat_roundtrip(self, rng):
        w = random_rotvecs(rng, 32)
        R = so3_exp(jnp.asarray(w))
        q = rot_to_quat(R)
        R2 = quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        q_ref = ScipyRot.from_matrix(np.asarray(R)).as_quat()  # xyzw
        sign = np.sign(q_ref[:, 3:4])
        sign[sign == 0] = 1.0
        np.testing.assert_allclose(np.asarray(q), q_ref * sign, atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        xi2 = se3_log(T)
        T2 = se3_exp(xi2)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        I = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(
            np.asarray(I), np.eye(4)[None].repeat(16, 0), atol=1e-5
        )

    def test_apply(self, rng):
        R = ScipyRot.random(8, rng=rng).as_matrix().astype(np.float32)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        p = rng.normal(size=(8, 3)).astype(np.float32)
        T = se3_from_rt(jnp.asarray(R), jnp.asarray(t))
        out = np.asarray(se3_apply(T, jnp.asarray(p)))
        ref = np.einsum("bij,bj->bi", R, p) + t
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 7)).astype(np.float32) * 0.8
        g = sim3_exp(jnp.asarray(xi))
        xi2 = sim3_log(g)
        g2 = sim3_exp(xi2)
        for a, b in zip(g, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_compose_inverse(self, rng):
        xi = rng.normal(size=(16, 7)).astype(np.float32) * 0.5
        g = sim3_exp(jnp.asarray(xi))
        gi = sim3_inverse(g)
        ident = sim3_compose(g, gi)
        np.testing.assert_allclose(np.asarray(ident[0]), np.ones(16), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ident[1]), np.eye(3)[None].repeat(16, 0), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(ident[2]), np.zeros((16, 3)), atol=1e-4)

    def test_apply_matches_srt(self, rng):
        xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
        g = sim3_exp(jnp.asarray(xi))
        p = rng.normal(size=(8, 3)).astype(np.float32)
        out = np.asarray(sim3_apply(g, jnp.asarray(p)))
        s, R, t = (np.asarray(x) for x in g)
        ref = s[:, None] * np.einsum("bij,bj->bi", R, p) + t
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_to_se3(self, rng):
        xi = rng.normal(size=(4, 7)).astype(np.float32) * 0.3
        g = sim3_exp(jnp.asarray(xi))
        T = np.asarray(sim3_to_se3(g))
        s, R, t = (np.asarray(x) for x in g)
        np.testing.assert_allclose(T[:, :3, :3], R, atol=1e-5)
        np.testing.assert_allclose(T[:, :3, 3], t / s[:, None], atol=1e-5)


class TestCamera:
    CAM = dict(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
               k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026)

    def test_project_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        cam = CameraModel.create(**self.CAM)
        pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(1.0, 5.0, size=100)
        uv = np.asarray(project(cam, jnp.asarray(pts), with_distortion=True))
        K = np.array([[self.CAM["fx"], 0, self.CAM["cx"]],
                      [0, self.CAM["fy"], self.CAM["cy"]], [0, 0, 1]])
        dist = np.array([self.CAM["k1"], self.CAM["k2"], self.CAM["p1"], self.CAM["p2"]])
        uv_ref, _ = cv2.projectPoints(
            pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, dist)
        np.testing.assert_allclose(uv, uv_ref.reshape(-1, 2), atol=1e-2)

    def test_undistort_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        cam = CameraModel.create(**self.CAM)
        uv = rng.uniform([100, 100], [540, 380], size=(200, 2)).astype(np.float32)
        out = np.asarray(undistort_points(cam, jnp.asarray(uv), iters=20))
        K = np.array([[self.CAM["fx"], 0, self.CAM["cx"]],
                      [0, self.CAM["fy"], self.CAM["cy"]], [0, 0, 1]])
        dist = np.array([self.CAM["k1"], self.CAM["k2"], self.CAM["p1"], self.CAM["p2"]])
        ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
        np.testing.assert_allclose(out, ref, atol=0.1)

    def test_distort_undistort_roundtrip(self, rng):
        cam = CameraModel.create(**self.CAM)
        xn = rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32)
        xd = distort(cam, jnp.asarray(xn))
        uv = jnp.stack([cam.fx * xd[:, 0] + cam.cx, cam.fy * xd[:, 1] + cam.cy], -1)
        und_uv = undistort_points(cam, uv, iters=20)
        xn2 = unproject(cam, und_uv)
        np.testing.assert_allclose(np.asarray(xn2), xn, atol=1e-3)


class TestTriangulation:
    def test_perfect_recovery(self, rng):
        n = 50
        pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3)).astype(np.float32)
        R2 = ScipyRot.from_rotvec([0.0, 0.1, 0.0]).as_matrix().astype(np.float32)
        t2 = np.array([-1.0, 0.0, 0.0], np.float32)
        P1 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        P2 = np.concatenate([R2, t2[:, None]], 1).astype(np.float32)
        xn1 = (pts / pts[:, 2:3])[:, :2]
        pc2 = pts @ R2.T + t2
        xn2 = (pc2 / pc2[:, 2:3])[:, :2]
        X = np.asarray(triangulate_dlt(
            jnp.asarray(xn1), jnp.asarray(xn2),
            jnp.broadcast_to(jnp.asarray(P1), (n, 3, 4)),
            jnp.broadcast_to(jnp.asarray(P2), (n, 3, 4))))
        np.testing.assert_allclose(X, pts, atol=1e-2, rtol=1e-3)

    def test_depth_and_parallax(self):
        T = jnp.eye(4)
        p = jnp.asarray([[0.0, 0.0, 5.0]])
        assert np.asarray(depth_in_frame(T, p))[0] == pytest.approx(5.0)
        c1 = jnp.asarray([0.0, 0.0, 0.0])
        c2 = jnp.asarray([1.0, 0.0, 0.0])
        cosp = np.asarray(parallax_cos(c1, c2, p))
        expected = np.cos(np.arctan2(1.0, 5.0))
        assert cosp[0] == pytest.approx(expected, abs=1e-4)


class TestHorn:
    def test_exact_sim3(self, rng):
        n = 20
        P2 = rng.normal(size=(n, 3)).astype(np.float32)
        R = ScipyRot.random(rng=rng).as_matrix().astype(np.float32)
        s_true, t_true = 2.3, np.array([0.5, -1.0, 2.0], np.float32)
        P1 = s_true * P2 @ R.T + t_true
        s, R_est, t = horn_sim3(jnp.asarray(P1), jnp.asarray(P2))
        assert float(s) == pytest.approx(s_true, rel=1e-4)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)

    def test_fix_scale(self, rng):
        n = 20
        P2 = rng.normal(size=(n, 3)).astype(np.float32)
        R = ScipyRot.random(rng=rng).as_matrix().astype(np.float32)
        t_true = np.array([0.5, -1.0, 2.0], np.float32)
        P1 = P2 @ R.T + t_true
        s, R_est, t = horn_sim3(jnp.asarray(P1), jnp.asarray(P2), fix_scale=True)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)

    def test_weighted_ignores_outliers(self, rng):
        n = 20
        P2 = rng.normal(size=(n, 3)).astype(np.float32)
        R = ScipyRot.random(rng=rng).as_matrix().astype(np.float32)
        P1 = 1.5 * P2 @ R.T + np.array([1.0, 2.0, 3.0], np.float32)
        P1_corrupt = P1.copy()
        P1_corrupt[-5:] += 100.0
        w = np.ones(n, np.float32)
        w[-5:] = 0.0
        s, R_est, t = horn_sim3(jnp.asarray(P1_corrupt), jnp.asarray(P2),
                                weights=jnp.asarray(w))
        assert float(s) == pytest.approx(1.5, rel=1e-3)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)

    def test_batched(self, rng):
        B, n = 8, 12
        P2 = rng.normal(size=(B, n, 3)).astype(np.float32)
        Rs = ScipyRot.random(B, rng=rng).as_matrix().astype(np.float32)
        ss = rng.uniform(0.5, 2.0, size=B).astype(np.float32)
        ts = rng.normal(size=(B, 3)).astype(np.float32)
        P1 = ss[:, None, None] * np.einsum("bij,bnj->bni", Rs, P2) + ts[:, None, :]
        s, R_est, t = horn_sim3(jnp.asarray(P1), jnp.asarray(P2))
        np.testing.assert_allclose(np.asarray(s), ss, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(R_est), Rs, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-2)


class TestJittability:
    def test_all_jit(self, rng):
        """Everything must compile under jit (static shapes, no host branches)."""
        xi6 = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        xi7 = jnp.asarray(rng.normal(size=(4, 7)), jnp.float32) * 0.5
        jax.jit(lambda x: se3_log(se3_exp(x)))(xi6).block_until_ready()
        jax.jit(lambda x: sim3_log(sim3_exp(x)))(xi7)
        cam = CameraModel.create(500.0, 500.0, 320.0, 240.0, k1=0.1)
        uv = jnp.asarray(rng.uniform(0, 480, size=(16, 2)), jnp.float32)
        jax.jit(lambda u: undistort_points(cam, u))(uv).block_until_ready()
