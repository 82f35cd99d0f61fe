"""Async pipeline tests: threaded mapper with queue/abort/stop-release."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.pipeline.async_system import AsyncSLAMSystem
from orb_slam_tpu.pipeline.system import SlamConfig, WORKING
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel


def make_async_system(scene, n_slots):
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        map=MapConfig(max_keyframes=32, max_points=2048, n_features=n_slots),
        p_local=512, n_triangulation_neighbors=3, n_fuse_neighbors=2,
        local_ba_window=6, enable_loop_closing=False,
        enable_relocalisation=False,
    )
    sys_ = AsyncSLAMSystem.__new__(AsyncSLAMSystem)
    import threading, queue as q
    sys_._lock = threading.Lock()
    sys_._kf_queue = q.Queue()
    sys_._abort_ba = threading.Event()
    sys_._stop_requested = threading.Event()
    sys_._stopped = threading.Event()
    sys_._idle = threading.Event(); sys_._idle.set()
    sys_._pending_deltas = []
    sys_._shutdown = False
    sys_._mapper_error = None
    sys_.cfg = cfg
    sys_.extractor = None
    sys_.K = scene.K
    sys_.K_dev = jnp.asarray(scene.K)
    sys_.reset()
    sys_._thread = threading.Thread(target=sys_._mapper_loop, daemon=True)
    sys_._thread.start()
    return sys_


class TestAsyncSystem:
    def test_tracks_with_background_mapper(self):
        scene = SyntheticScene(n_points=500, seed=7)
        sys_ = make_async_system(scene, 200)
        poses = lateral_trajectory(30, step=0.08)
        tracked = 0
        for i in range(30):
            out = sys_.process(features=scene.observe(poses[i], n_slots=200))
            if out is not None:
                tracked += 1
        sys_.finish()
        assert tracked >= 20
        assert sys_.state == WORKING
        assert sys_.n_keyframes >= 2
        assert sys_.n_points > 100
        # counters were merged, not lost
        assert int(jnp.max(sys_.map.pt_visible)) > 3
        sys_.close()

    def test_stop_release_protocol(self):
        scene = SyntheticScene(n_points=500, seed=7)
        sys_ = make_async_system(scene, 200)
        poses = lateral_trajectory(12, step=0.08)
        for i in range(12):
            sys_.process(features=scene.observe(poses[i], n_slots=200))
        sys_.finish()
        sys_.request_stop()
        assert sys_._stopped.is_set()
        # exclusive map access window: mutate safely
        n_before = sys_.n_points
        sys_.release()
        # mapper resumes
        out = sys_.process(features=scene.observe(poses[11], n_slots=200))
        sys_.finish()
        assert sys_.n_points >= 0 and n_before >= 0
        sys_.close()
