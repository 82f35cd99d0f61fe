"""Async pipeline WITH loop closing + relocalisation enabled, and session
persistence of the place-recognition state."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.pipeline.async_system import AsyncSLAMSystem
from orb_slam_tpu.pipeline.system import SlamConfig, SLAMSystem, WORKING
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel


def make_async(scene, n_slots=200, **overrides):
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        map=MapConfig(max_keyframes=32, max_points=2048, n_features=n_slots),
        p_local=512, n_triangulation_neighbors=3, n_fuse_neighbors=2,
        local_ba_window=6, **overrides)
    cfg.orb = None  # oracle-features mode: the real constructor skips the
    # extractor and starts the mapper + loop threads
    return AsyncSLAMSystem(cfg)


class TestAsyncWithPlaceRecognition:
    def test_async_loop_and_reloc_enabled(self):
        scene = SyntheticScene(n_points=500, seed=13)
        sys_ = make_async(scene, enable_loop_closing=True,
                          enable_relocalisation=True,
                          kf_tracked_ratio=1.2, min_frames_between_kf=2)
        poses = lateral_trajectory(24, step=0.08)
        tracked = 0
        for i in range(24):
            out = sys_.process(features=scene.observe(poses[i], n_slots=200))
            if out is not None:
                tracked += 1
        sys_.finish()
        assert tracked >= 16
        assert sys_.state == WORKING
        assert sys_.db is not None and sys_.db.active.sum() >= 2
        sys_.close()

    def test_session_persists_place_recognition(self, tmp_path):
        from orb_slam_tpu.slam_map.serialization import save_session, load_session
        scene = SyntheticScene(n_points=500, seed=13)
        sys_ = make_async(scene, enable_loop_closing=True,
                          enable_relocalisation=True,
                          kf_tracked_ratio=1.2, min_frames_between_kf=2)
        poses = lateral_trajectory(16, step=0.08)
        for i in range(16):
            sys_.process(features=scene.observe(poses[i], n_slots=200))
        sys_.finish()
        p = str(tmp_path / "session.npz")
        save_session(p, sys_)
        sys_.close()

        # restore into a fresh sequential system and keep going
        cfg = sys_.cfg  # oracle config (orb=None): the REAL constructor
        sys2 = SLAMSystem(cfg)
        load_session(p, sys2)
        assert sys2.vocab is not None
        assert sys2.db is not None
        assert sys2.db.active.sum() == sys_.db.active.sum()
        assert sys2.n_keyframes == sys_.n_keyframes
        out = sys2.process(features=scene.observe(poses[15], n_slots=200))
        assert out is not None
