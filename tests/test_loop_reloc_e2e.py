"""End-to-end loop closing + relocalisation on oracle scenes."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.io.synthetic import SyntheticScene
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING, LOST
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel, se3_from_rt


def make_system(scene, n_slots, **overrides):
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        map=MapConfig(max_keyframes=32, max_points=2048, n_features=n_slots),
        p_local=512,
        n_triangulation_neighbors=3,
        n_fuse_neighbors=2,
        local_ba_window=6,
        orb=None,  # oracle-features mode: the REAL constructor
        **overrides,
    )
    return SLAMSystem(cfg)


def yaw_pose(yaw, C):
    R = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
         [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    t = -R @ np.asarray(C, np.float32)
    return np.asarray(se3_from_rt(jnp.asarray(R), jnp.asarray(t)))


class TestRelocalisation:
    def test_recovers_after_blackout(self):
        scene = SyntheticScene(n_points=500, seed=3)
        # max_frames_between_kf=3 forces a map >5 KFs (below that the
        # reference's auto-reset-when-lost policy wipes the young map,
        # Tracking.cc:272-279 — tested separately below)
        # kf_tracked_ratio>1 forces c2 true -> keyframe every 3 frames
        # (the oracle scene tracks too well to trigger the 90% rule)
        # kf_cull_redundancy>1 disables keyframe culling: the oracle scene
        # makes every KF ~fully redundant, and with the reference's
        # all-covisibles culling scope the map would never exceed 5 KFs
        sys_ = make_system(scene, 200, enable_loop_closing=False,
                           max_frames_between_kf=3, kf_tracked_ratio=1.5,
                           kf_cull_redundancy=1.1)
        n_slots = 200
        # straight lateral run to build a map
        poses = [yaw_pose(0.0, [0.06 * i, 0, 0]) for i in range(25)]
        for i, T in enumerate(poses[:18]):
            sys_.process(features=scene.observe(T, n_slots=n_slots))
        assert sys_.state == WORKING
        assert sys_.n_keyframes > 5
        # blackout: frames with no features -> LOST
        dead = dict(xy=np.zeros((n_slots, 2), np.float32),
                    desc=np.zeros((n_slots, 8), np.uint32),
                    octave=np.zeros(n_slots, np.int32),
                    angle=np.zeros(n_slots, np.float32),
                    valid=np.zeros(n_slots, bool))
        for _ in range(3):
            sys_.process(features=dead)
        assert sys_.state == LOST
        # revisit a mapped viewpoint -> must relocalize
        recovered = False
        for i in range(6, 12):
            T = poses[i]
            out = sys_.process(features=scene.observe(T, n_slots=n_slots))
            if out is not None and sys_.state == WORKING:
                recovered = True
                # pose must match the ground truth viewpoint (same gauge as
                # the map, scale fixed by init normalization)
                C_est = -out[:3, :3].T @ out[:3, 3]
                C_gt = -T[:3, :3].T @ T[:3, 3]
                # allow scale gauge: compare direction of offset from map
                assert np.linalg.norm(C_est - C_gt * np.linalg.norm(C_est) /
                                      max(np.linalg.norm(C_gt), 1e-9)) < 0.5
                break
        assert recovered, "failed to relocalize after blackout"


class TestLoopClosing:
    def _inject_drift(self, sys_, g_scale, g_t):
        """Simulate accumulated drift: remap the most-recent half of the map
        through a similarity g (x -> s x + t). Points with recent reference
        KFs move; their KFs' poses are rewritten so all existing projections
        stay identical (projective invariance) — exactly what real drift
        looks like to the system: a self-consistent recent section that
        disagrees with the old section."""
        import jax.numpy as jnp
        m = sys_.map
        order = sys_.kf_order
        slots = np.where(np.asarray(m.kf_valid))[0]
        orders = order[slots]
        cut = np.median(orders)
        recent = set(int(s) for s in slots[orders > cut])
        poses = np.array(m.kf_pose)
        s, t = g_scale, np.asarray(g_t, np.float32)
        for k in recent:
            Rk = poses[k][:3, :3]
            tk = poses[k][:3, 3]
            poses[k][:3, 3] = s * tk - Rk @ t
        pos = np.array(m.pt_pos)
        pt_ref = np.asarray(m.pt_ref_kf)
        sel = np.asarray(m.pt_valid) & np.isin(pt_ref, list(recent))
        pos[sel] = s * pos[sel] + t
        from orb_slam_tpu.slam_map.observations import refresh_point_stats
        sys_.map = refresh_point_stats(m._replace(
            kf_pose=jnp.asarray(poses), pt_pos=jnp.asarray(pos)))
        # move the tracker into the drifted frame
        last = sys_.last_kf_slot
        sys_.last_pose = poses[last].copy()
        sys_.velocity = np.eye(4, dtype=np.float32)
        return recent

    def test_closes_rotational_loop_after_drift(self):
        """Camera pans a full 360-degree turn inside a ring world. Midway we
        inject Sim3 drift into the recent map section (scale + translation,
        self-consistent to the tracker). On revisit the old section is
        visually recognized but geometrically displaced — loop detection +
        Sim3 + essential-graph correction must fire and stitch the sections
        back together."""
        scene = SyntheticScene(n_points=1500, seed=5, extent=(0, 4.0, 0),
                               depth_range=(7.0, 13.0), ring=True)
        n_slots = 250
        sys_ = make_system(scene, n_slots, enable_relocalisation=False,
                           max_frames_between_kf=6, min_frames_between_kf=4,
                           kf_tracked_ratio=1.5, track_radius=25.0)

        poses = []
        # translational lead-in: init needs baseline (pure rotation cannot
        # bootstrap — the documented failure mode, README.md:181-189)
        for i in range(8):
            poses.append(yaw_pose(0.0, [-0.5 + 0.0625 * i, 0.0, 0.0]))
        for i in range(116):
            yaw = 2 * np.pi * i / 96  # full turn at i=96, then revisit
            C = [3.0 * np.sin(yaw), 0.0, 3.0 * (np.cos(yaw) - 1.0)]
            poses.append(yaw_pose(yaw, C))

        tracked = 0
        for fi, T in enumerate(poses):
            out = sys_.process(features=scene.observe(T, n_slots=n_slots,
                                                      pix_noise=0.4))
            if out is not None:
                tracked += 1
            if fi == 60:
                assert sys_.state == WORKING
                self._inject_drift(sys_, g_scale=1.15, g_t=[0.4, 0.0, 0.2])
        assert tracked > len(poses) * 0.6
        assert sys_.n_loops_closed >= 1, "no loop closure detected"
