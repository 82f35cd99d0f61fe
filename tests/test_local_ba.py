"""Bundle adjustment tests on synthetic scenes with known ground truth."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from orb_slam_tpu.slam_map import MapConfig, empty_map
from orb_slam_tpu.slam_map.map_state import insert_keyframe, add_points
from orb_slam_tpu.solvers.local_ba import bundle_adjust, apply_edge_outliers
from orb_slam_tpu.geometry import se3_from_rt

K_MAT = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
CFG = MapConfig(max_keyframes=8, max_points=128, n_features=64)


def build_synthetic_map(rng, n_kf=4, n_pts=60, pix_noise=0.5,
                        pose_err=0.02, point_err=0.05):
    """n_kf cameras on a line looking at a point cloud; noisy initial
    estimates; returns (state, true poses, true points, cam_opt, pt_opt)."""
    pts = np.stack([
        rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts),
        rng.uniform(5, 9, n_pts)], 1).astype(np.float32)
    poses_true, state = [], empty_map(CFG)
    for k in range(n_kf):
        Rk = ScipyRot.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix().astype(np.float32)
        tk = np.array([-0.4 * k, 0, 0], np.float32)
        T = np.asarray(se3_from_rt(jnp.asarray(Rk), jnp.asarray(tk)))
        poses_true.append(T)
        pc = pts @ Rk.T + tk
        uv = (pc[:, :2] / pc[:, 2:3]) * [500, 500] + [320, 240]
        uv = uv + rng.normal(0, pix_noise, uv.shape)
        obs = np.full(CFG.n_features, -1, np.int32)
        obs[:n_pts] = np.arange(n_pts)
        xy = np.zeros((CFG.n_features, 2), np.float32)
        xy[:n_pts] = uv
        # noisy initial pose (keep KF0/KF1 exact: they pin the full 7-dof
        # monocular gauge incl. scale)
        T_init = T.copy()
        if k > 1:
            dR = ScipyRot.from_rotvec(rng.normal(0, pose_err, 3)).as_matrix()
            T_init[:3, :3] = (dR @ T[:3, :3]).astype(np.float32)
            T_init[:3, 3] += rng.normal(0, pose_err, 3).astype(np.float32)
        state = insert_keyframe(
            state, k, pose=jnp.asarray(T_init), frame_id=k,
            xy=jnp.asarray(xy), octave=jnp.zeros((CFG.n_features,), jnp.int32),
            angle=jnp.zeros((CFG.n_features,), jnp.float32),
            desc=jnp.zeros((CFG.n_features, 8), jnp.uint32),
            feat_valid=jnp.asarray(obs >= 0), obs=jnp.asarray(obs), parent=k - 1)
    pts_init = pts + rng.normal(0, point_err, pts.shape).astype(np.float32)
    state = add_points(
        state, jnp.arange(n_pts), jnp.asarray(pts_init),
        jnp.zeros((n_pts, 8), jnp.uint32),
        jnp.zeros(n_pts, jnp.int32), jnp.zeros(n_pts, jnp.int32),
        jnp.ones(n_pts, bool))
    cam_opt = np.zeros(CFG.max_keyframes, bool)
    cam_opt[2:n_kf] = True  # KF0+KF1 fixed: 7-dof gauge (pose + scale)
    pt_opt = np.zeros(CFG.max_points, bool)
    pt_opt[:n_pts] = True
    return state, np.stack(poses_true), pts, jnp.asarray(cam_opt), jnp.asarray(pt_opt)


class TestBundleAdjust:
    def test_reduces_error(self, rng):
        state, poses_true, pts_true, cam_opt, pt_opt = build_synthetic_map(rng)
        new_state, outlier, _ = bundle_adjust(
            state, jnp.asarray(K_MAT), cam_opt, pt_opt, iters1=5, iters2=10)
        pose_err0 = np.abs(np.asarray(state.kf_pose[:4]) - poses_true).max()
        pose_err1 = np.abs(np.asarray(new_state.kf_pose[:4]) - poses_true).max()
        assert pose_err1 < pose_err0 * 0.4, (pose_err0, pose_err1)
        pt_err0 = np.linalg.norm(np.asarray(state.pt_pos[:60]) - pts_true, axis=1)
        pt_err1 = np.linalg.norm(np.asarray(new_state.pt_pos[:60]) - pts_true, axis=1)
        assert np.median(pt_err1) < np.median(pt_err0) * 0.5
        # no excessive outlier flagging on clean data
        assert np.asarray(outlier).sum() < 10

    def test_gauge_fixed(self, rng):
        state, poses_true, _, cam_opt, pt_opt = build_synthetic_map(rng)
        new_state, _, _ = bundle_adjust(
            state, jnp.asarray(K_MAT), cam_opt, pt_opt)
        np.testing.assert_array_equal(
            np.asarray(new_state.kf_pose[0]), np.asarray(state.kf_pose[0]))
        # invalid slots untouched
        np.testing.assert_array_equal(
            np.asarray(new_state.kf_pose[6]), np.eye(4))

    def test_outlier_ejection(self, rng):
        state, poses_true, pts_true, cam_opt, pt_opt = build_synthetic_map(
            rng, pix_noise=0.3)
        # corrupt 8 observations of KF1 with large errors
        xy = np.array(state.kf_xy)
        bad_feats = np.arange(8)
        xy[1, bad_feats] += 40.0
        state = state._replace(kf_xy=jnp.asarray(xy))
        new_state, outlier, (okf, ofeat) = bundle_adjust(
            state, jnp.asarray(K_MAT), cam_opt, pt_opt)
        out = np.asarray(outlier)
        okf, ofeat = np.asarray(okf), np.asarray(ofeat)
        flagged = set()
        for p in range(out.shape[0]):
            for o in range(out.shape[1]):
                if out[p, o]:
                    flagged.add((okf[p, o], ofeat[p, o]))
        for f in bad_feats:
            assert (1, f) in flagged, f"corrupted obs (1,{f}) not flagged"
        # pose still accurate despite outliers
        pose_err = np.abs(np.asarray(new_state.kf_pose[:4]) - poses_true).max()
        assert pose_err < 0.02
        # applying outliers unbinds them
        state2 = apply_edge_outliers(new_state, outlier, jnp.asarray(okf),
                                     jnp.asarray(ofeat))
        obs_after = np.asarray(state2.kf_obs)
        for f in bad_feats:
            assert obs_after[1, f] == -1

    def test_fixed_boundary_constrains(self, rng):
        """Only KF3 optimized; KFs 0-2 fixed but still constrain points."""
        state, poses_true, pts_true, _, pt_opt = build_synthetic_map(rng)
        cam_opt = np.zeros(CFG.max_keyframes, bool)
        cam_opt[3] = True
        new_state, _, _ = bundle_adjust(
            state, jnp.asarray(K_MAT), jnp.asarray(cam_opt), pt_opt)
        np.testing.assert_array_equal(
            np.asarray(new_state.kf_pose[1]), np.asarray(state.kf_pose[1]))
        err1 = np.abs(np.asarray(new_state.kf_pose[3]) - poses_true[3]).max()
        err0 = np.abs(np.asarray(state.kf_pose[3]) - poses_true[3]).max()
        assert err1 < err0

    def test_compact_camera_space_matches_full(self, rng):
        """max_opt_cams builds the reduced system in a compact slot space;
        with a bound >= |cam_opt| the result must match the full-capacity
        solve exactly (same math, permuted assembly)."""
        state, _, _, cam_opt, pt_opt = build_synthetic_map(rng)
        full, _, _ = bundle_adjust(
            state, jnp.asarray(K_MAT), cam_opt, pt_opt)
        compact, _, _ = bundle_adjust(
            state, jnp.asarray(K_MAT), cam_opt, pt_opt, max_opt_cams=4)
        np.testing.assert_allclose(
            np.asarray(compact.kf_pose), np.asarray(full.kf_pose),
            atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(compact.pt_pos), np.asarray(full.pt_pos), atol=2e-5)

    def test_compact_space_overflow_treated_fixed(self, rng):
        """Cameras beyond the max_opt_cams bound stay at their input pose
        (treated as fixed), and the solve still improves the ones inside."""
        state, poses_true, _, cam_opt, pt_opt = build_synthetic_map(rng)
        # bound of 1: only the first optimized camera (slot 2) fits
        out, _, _ = bundle_adjust(
            state, jnp.asarray(K_MAT), cam_opt, pt_opt, max_opt_cams=1)
        np.testing.assert_array_equal(
            np.asarray(out.kf_pose[3]), np.asarray(state.kf_pose[3]))
        # the in-bound camera was optimized (LM accepts only cost-decreasing
        # steps; absolute pose error may move either way with a noisy
        # fixed neighbor, so assert movement + finiteness, not error)
        p2 = np.asarray(out.kf_pose[2])
        assert np.all(np.isfinite(p2))
        assert np.abs(p2 - np.asarray(state.kf_pose[2])).max() > 1e-6
