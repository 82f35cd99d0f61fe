"""Organic loop closure end-to-end: a rendered 420-degree orbit through the
REAL frontend (extraction -> tracking -> mapping -> BoW place recognition
with the pretrained vocabulary -> Sim3 -> essential graph), with loop
closing detecting and correcting NATURALLY accumulated drift — no oracle
features, no injected drift.

This is the reference's Example.bag behavior ('a loop closure ... in
real-time', README.md:150-172) as a deterministic test. The camera orbits a
cylindrical billboard ring looking outward and travels 60 degrees past
closure; the loop fires just after the seam (kf ~83 vs kf ~1) and the
essential-graph correction must measurably reduce keyframe ATE vs the
pre-correction tracked trajectory."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.io.synthetic import SyntheticScene, ring_trajectory
from orb_slam_tpu.io.trajectory import ate_rmse, camera_centers_from_cw
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING
from orb_slam_tpu.frontend.orb_extractor import ORBConfig
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel


class TestOrganicLoopClosure:
    def test_loop_closes_and_reduces_ate(self):
        N = 260  # 360 deg at frame ~240, loop fires ~243 (validated margin)
        scene = SyntheticScene(
            n_points=1200, seed=5, width=320, height=240,
            fx=200.0, fy=200.0, cx=160.0, cy=120.0,
            ring=True, depth_range=(10.0, 13.0), extent=(0, 3.0, 0))
        poses = ring_trajectory(N, orbit_radius=4.0,
                                total_angle=2.0 * np.pi * N / 240.0)
        cfg = SlamConfig(
            camera=CameraModel.create(200.0, 200.0, 160.0, 120.0,
                                      width=320, height=240),
            orb=ORBConfig(n_features=500, n_levels=4),
            map=MapConfig(max_keyframes=128, max_points=6144,
                          n_features=500),
            p_local=1024,
            enable_loop_closing=True, enable_relocalisation=True,
            min_init_matches=60, min_init_keypoints=60)
        system = SLAMSystem(cfg)

        est = {}
        for i in range(N):
            T = system.process(img=scene.render_image(poses[i], patch=6))
            if T is not None:
                est[i] = T

        assert system.state == WORKING
        # the real-scale pretrained vocabulary must be in play (not the
        # tiny init-frame fallback)
        assert system.vocab is not None and system.vocab.n_words > 5000
        assert system.n_loops_closed >= 1, "no organic loop closed"

        # pre-correction trajectory = poses as tracked online
        ids = sorted(est.keys())
        C_est = camera_centers_from_cw(np.stack([est[i] for i in ids]))
        C_gt = camera_centers_from_cw(poses[ids])
        ate_pre, _ = ate_rmse(C_est, C_gt)

        # post-correction trajectory = final keyframe poses
        m = system.map
        sel = np.where(np.asarray(m.kf_valid))[0]
        fids = np.asarray(m.kf_frame_id)[sel]
        ok = (fids >= 0) & (fids < N)
        C_kf = camera_centers_from_cw(np.asarray(m.kf_pose)[sel[ok]])
        C_kfgt = camera_centers_from_cw(poses[fids[ok]])
        ate_post, _ = ate_rmse(C_kf, C_kfgt)

        assert ate_post < ate_pre, (
            f"loop correction did not reduce ATE: {ate_post:.3f} vs "
            f"{ate_pre:.3f}")
        # 0.25: the round-3 batched SearchAndFuse follows the reference's
        # semantics exactly (pooled loop-point set, radius 4.0, bare scale
        # band, loop point wins — LoopClosing.cc:557-570, ORBmatcher.cc:
        # 1136-1265), which merges more aggressively than the old pairwise
        # variant and lands at ~0.235 on this synthetic sequence (both
        # winner policies measured identical; the structural assertion is
        # ate_post < ate_pre above).
        assert ate_post < 0.25, f"post-loop keyframe ATE {ate_post:.3f}"
