"""End-to-end visual odometry on the synthetic oracle scene: init ->
per-frame tracking -> keyframes -> local mapping -> trajectory, evaluated
against ground truth (ATE after Sim3 alignment — monocular scale is free)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel, horn_sim3, se3_inverse


def run_sequence(n_frames=30, step=0.08, n_slots=200, seed=0):
    scene = SyntheticScene(n_points=500, seed=seed)
    poses = lateral_trajectory(n_frames, step=step)
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        map=MapConfig(max_keyframes=32, max_points=2048, n_features=n_slots),
        p_local=512,
        n_triangulation_neighbors=3,
        n_fuse_neighbors=2,
        local_ba_window=6,
    )
    cfg.orb = None  # oracle features only; the REAL constructor
    sys_ = SLAMSystem(cfg)
    est = {}
    for i in range(n_frames):
        feats = scene.observe(poses[i], n_slots=n_slots)
        T = sys_.process(features=feats)
        if T is not None:
            est[i] = T
    return sys_, poses, est


def camera_centers(T_cw_stack):
    R = T_cw_stack[:, :3, :3]
    t = T_cw_stack[:, :3, 3]
    return -np.einsum("nij,ni->nj", R, t)


class TestEndToEndVO:
    def test_initializes_and_tracks(self):
        sys_, poses, est = run_sequence()
        assert sys_.state == WORKING
        assert len(est) >= 20, f"tracked only {len(est)} frames"
        assert sys_.n_keyframes >= 2
        assert sys_.n_points > 100

    def test_trajectory_accuracy_ate(self):
        sys_, poses, est = run_sequence()
        ids = sorted(est.keys())
        T_est = np.stack([est[i] for i in ids])
        T_gt = poses[ids]
        C_est = camera_centers(T_est)
        C_gt = camera_centers(T_gt)
        # Sim3 alignment (monocular gauge)
        s, R, t = horn_sim3(jnp.asarray(C_gt), jnp.asarray(C_est))
        C_al = float(s) * C_est @ np.asarray(R).T + np.asarray(t)
        ate = np.sqrt(np.mean(np.sum((C_al - C_gt) ** 2, axis=1)))
        traj_len = np.sum(np.linalg.norm(np.diff(C_gt, axis=0), axis=1))
        assert ate < 0.05 * traj_len, f"ATE {ate:.4f} vs length {traj_len:.2f}"

    def test_map_grows_and_culls(self):
        sys_, poses, est = run_sequence(n_frames=40, step=0.1)
        # camera moved 4 units sideways; new points must have been created
        assert sys_.n_points > 150
        # free lists consistent
        assert len(sys_.free_pt) == int(np.sum(~np.asarray(sys_.map.pt_valid)))

    def test_rotation_consistency_of_poses(self):
        sys_, poses, est = run_sequence()
        for i, T in est.items():
            R = T[:3, :3]
            assert np.abs(R @ R.T - np.eye(3)).max() < 1e-3
            assert np.abs(np.linalg.det(R) - 1) < 1e-3
