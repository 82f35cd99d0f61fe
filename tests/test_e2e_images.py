"""Full-stack end-to-end: rendered images -> real ORB extractor -> SLAM ->
trajectory accuracy. The only oracle-free path (everything through the
actual frontend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.io.trajectory import ate_rmse, camera_centers_from_cw
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING
from orb_slam_tpu.frontend.orb_extractor import ORBConfig
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel


class TestImagePipeline:
    def test_vo_on_rendered_images(self):
        # sparse textured billboards with tight depth spread: descriptor
        # patches must be dominated by their own surface (a dense 3D
        # confetti cloud has huge intra-patch parallax no real descriptor
        # survives)
        scene = SyntheticScene(n_points=220, seed=21, width=320, height=240,
                               fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                               extent=(7.0, 5.0, 3.0), depth_range=(5.5, 8.5))
        n_frames = 14
        poses = lateral_trajectory(n_frames, step=0.12)
        cfg = SlamConfig(
            camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                      width=320, height=240),
            orb=ORBConfig(n_features=400, n_levels=4),
            map=MapConfig(max_keyframes=16, max_points=1024, n_features=400),
            p_local=512, n_triangulation_neighbors=2, n_fuse_neighbors=2,
            local_ba_window=4, enable_loop_closing=False,
            enable_relocalisation=False,
            min_init_matches=60, min_init_keypoints=60,
        )
        system = SLAMSystem(cfg)
        est = {}
        for i in range(n_frames):
            img = scene.render_image(poses[i], patch=5)
            T = system.process(img=img)
            if T is not None:
                est[i] = T
        assert system.state == WORKING, "never initialized on real images"
        assert len(est) >= n_frames - 6
        assert system.n_points > 50

        ids = sorted(est.keys())
        C_est = camera_centers_from_cw(np.stack([est[i] for i in ids]))
        C_gt = camera_centers_from_cw(poses[ids])
        rmse, _ = ate_rmse(C_est, C_gt)
        traj_len = np.sum(np.linalg.norm(np.diff(C_gt, axis=0), axis=1))
        assert rmse < 0.15 * traj_len, f"ATE {rmse:.3f} vs len {traj_len:.2f}"


class TestBatchAPI:
    def test_process_batch_matches_sequential(self):
        """process_batch must produce the same trajectory as frame-by-frame
        process() (vmapped extraction is bit-identical)."""
        scene = SyntheticScene(n_points=220, seed=21, width=320, height=240,
                               fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                               extent=(7.0, 5.0, 3.0), depth_range=(5.5, 8.5))
        n_frames = 10
        poses = lateral_trajectory(n_frames, step=0.12)
        imgs = [scene.render_image(poses[i], patch=5) for i in range(n_frames)]

        def build():
            cfg = SlamConfig(
                camera=CameraModel.create(scene.fx, scene.fy, scene.cx,
                                          scene.cy, width=320, height=240),
                orb=ORBConfig(n_features=400, n_levels=4),
                map=MapConfig(max_keyframes=16, max_points=1024,
                              n_features=400),
                p_local=512, n_triangulation_neighbors=2, n_fuse_neighbors=2,
                local_ba_window=4, enable_loop_closing=False,
                enable_relocalisation=False,
                min_init_matches=60, min_init_keypoints=60)
            return SLAMSystem(cfg)

        s1 = build()
        seq = [s1.process(img=im) for im in imgs]
        s2 = build()
        bat = s2.process_batch(imgs[:5]) + s2.process_batch(imgs[5:])
        for a, b in zip(seq, bat):
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_allclose(a, b, atol=1e-5)
