"""TrackPreviousFrame recovery ladder (reference src/Tracking.cc:486-552,
ORBmatcher.cc:409-517 WindowSearch + :519-594 SearchByProjection).

The ladder matches the current frame against the previous FRAME's bound
points — the recovery path that works even when map-side candidate
selection is starved or the motion model is wildly wrong."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING
from orb_slam_tpu.pipeline.track_kernels import track_prev_frame, track_frame
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel


def reference_pose(s, cur):
    """The pose the NORMAL motion-model path estimates for `cur` (pure
    kernel call, no system mutation) — the monocular map has its own
    scale, so ground-truth poses are only comparable through this."""
    cfg = s.cfg
    T_pred = (s.velocity @ s.last_pose).astype(np.float32)
    res = track_frame(
        s.map, cur.xy, cur.desc, cur.octave, cur.valid,
        jnp.asarray(T_pred), s.K_dev, p_local=cfg.p_local,
        width=cfg.camera.width, height=cfg.camera.height,
        radius=cfg.track_radius, scale_factor=cfg.map.scale_factor,
        n_levels=cfg.map.n_levels)
    assert int(res.n_inliers) > 30
    return np.asarray(res.pose)


def build_tracking_system(n_frames=20, seed=3):
    scene = SyntheticScene(n_points=600, seed=seed)
    poses = lateral_trajectory(n_frames + 2, step=0.06)
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy),
        orb=None,
        map=MapConfig(max_keyframes=24, max_points=2048, n_features=256),
        p_local=512, n_triangulation_neighbors=3, n_fuse_neighbors=2,
        local_ba_window=4, enable_loop_closing=False,
        enable_relocalisation=False)
    s = SLAMSystem(cfg)
    for i in range(n_frames):
        s.process(features=scene.observe(poses[i], n_slots=256))
    assert s.state == WORKING
    return scene, poses, s, n_frames


class TestPrevFrameLadder:
    def test_kernel_recovers_pose_from_frame_to_frame_matches(self):
        """Direct kernel: recover frame i+1's pose from prev-frame
        correspondences alone, starting at the (stale) frame-i pose."""
        scene, poses, s, i = build_tracking_system()
        cfg = s.cfg
        pf, pobs = s._prev_frame
        cur = s.make_frame(features=scene.observe(poses[i], n_slots=256))
        T_rec, n_in, n_m = track_prev_frame(
            s.map, pf.xy, pf.desc, pf.octave, pf.angle, pobs,
            cur.xy, cur.desc, cur.octave, cur.angle, cur.valid,
            jnp.asarray(s.last_pose), s.K_dev, jnp.int32(0),
            width=cfg.camera.width, height=cfg.camera.height,
            scale_factor=cfg.map.scale_factor, n_levels=cfg.map.n_levels)
        assert int(n_m) > 50, f"only {int(n_m)} frame-to-frame matches"
        assert int(n_in) > 30
        # recovered pose agrees with the normal tracking path (same map
        # scale) despite starting from the stale frame-(i-1) pose
        err = np.abs(np.asarray(T_rec) - reference_pose(s, cur))
        assert err.max() < 0.02, f"pose error {err.max():.4f}"

    def test_coarse_octave_gate(self):
        """coarse_min_octave must drop fine-octave rows (stage 1 of the
        reference ladder searches coarse scales first, Tracking.cc:492-497).
        With oracle features all at octave 0, a min of 1 forces stage 1 to
        zero matches and the ladder must fall through to stage 2."""
        scene, poses, s, i = build_tracking_system()
        cfg = s.cfg
        pf, pobs = s._prev_frame
        cur = s.make_frame(features=scene.observe(poses[i], n_slots=256))
        T_rec, n_in, n_m = track_prev_frame(
            s.map, pf.xy, pf.desc, pf.octave, pf.angle, pobs,
            cur.xy, cur.desc, cur.octave, cur.angle, cur.valid,
            jnp.asarray(s.last_pose), s.K_dev, jnp.int32(4),
            width=cfg.camera.width, height=cfg.camera.height,
            scale_factor=cfg.map.scale_factor, n_levels=cfg.map.n_levels)
        assert int(n_m) > 50  # stage 2 (all octaves) recovered it
        err = np.abs(np.asarray(T_rec) - reference_pose(s, cur))
        assert err.max() < 0.02

    def test_e2e_recovery_from_bad_motion_model(self):
        """A violently wrong velocity makes the motion-model prediction
        garbage; the system must recover through the ladder and keep
        tracking (the reference survives this via TrackPreviousFrame)."""
        scene, poses, s, i = build_tracking_system()
        cur = s.make_frame(features=scene.observe(poses[i], n_slots=256))
        T_ref = reference_pose(s, cur)  # before corrupting anything
        # corrupt the motion model: huge rotation + translation
        bad = np.eye(4, dtype=np.float32)
        c, n = np.cos(0.6), np.sin(0.6)
        bad[:3, :3] = [[c, 0, n], [0, 1, 0], [-n, 0, c]]
        bad[:3, 3] = [1.5, 0.8, -1.0]
        s.velocity = bad
        T = s.process(features=scene.observe(poses[i], n_slots=256))
        assert T is not None, "tracking lost despite recovery ladder"
        assert s.state == WORKING
        err = np.abs(T - T_ref)
        assert err.max() < 0.02, f"recovered pose error {err.max():.4f}"
        # and the next ordinary frame keeps tracking
        T2 = s.process(features=scene.observe(poses[i + 1], n_slots=256))
        assert T2 is not None
