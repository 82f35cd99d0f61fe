"""Undistorted image bounds in the frustum / fuse / projection gates.

The reference computes mnMinX/mnMaxX/mnMinY/mnMaxY once from the
undistorted image corners (src/Frame.cc:321-349) and gates isInFrustum and
the matchers on them. With barrel distortion (k1 < 0) the undistorted
coordinates of edge keypoints lie OUTSIDE the raw [0,W)x[0,H) rectangle, so
gating on raw bounds wrongly culls edge map points (round-3 verdict,
weak #4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.geometry.camera import (
    CameraModel, undistorted_bounds, undistort_points, project,
)
from orb_slam_tpu.pipeline.track_kernels import frustum_gate
from orb_slam_tpu.slam_map import MapConfig, empty_map

BARREL = dict(fx=458.0, fy=457.0, cx=320.0, cy=240.0,
              k1=-0.12, k2=0.02, width=640, height=480)


def _barrel_cam():
    return CameraModel.create(**BARREL)


class TestUndistortedBounds:
    def test_barrel_bounds_exceed_raw(self):
        cam = _barrel_cam()
        mnx, mxx, mny, mxy = (float(v) for v in undistorted_bounds(cam))
        # barrel distortion pulls corners inward, so undistorting the
        # corners pushes the bounds OUTWARD
        assert mnx < 0.0 and mny < 0.0
        assert mxx > cam.width and mxy > cam.height
        # sanity scale: tens of pixels at k1=-0.12, not hundreds
        assert mnx > -80 and mxx < cam.width + 80

    def test_zero_distortion_identity(self):
        cam = CameraModel.create(fx=458.0, fy=457.0, cx=320.0, cy=240.0,
                                 width=640, height=480)
        mnx, mxx, mny, mxy = (float(v) for v in undistorted_bounds(cam))
        assert (mnx, mny) == (0.0, 0.0)
        assert (mxx, mxy) == (640.0, 480.0)

    def test_edge_keypoint_undistorts_outside_raw(self):
        # a real detected keypoint AT the image edge undistorts past the
        # raw bound — the concrete failure the bounds fix addresses
        cam = _barrel_cam()
        uv = jnp.asarray([[2.0, 240.0], [638.0, 240.0]])
        und = np.asarray(undistort_points(cam, uv))
        assert und[0, 0] < 0.0
        assert und[1, 0] > cam.width


class TestFrustumGateBounds:
    def _state_with_edge_point(self):
        """Map with one point whose pinhole projection is at u=-10 (inside
        the undistorted bounds, outside the raw ones)."""
        cfg = MapConfig(max_keyframes=4, max_points=8, n_features=16)
        m = empty_map(cfg)
        cam = _barrel_cam()
        K = np.asarray(cam.K)
        u_t, v_t = -10.0, 240.0
        z = 2.0
        x = (u_t - K[0, 2]) / K[0, 0] * z
        y = (v_t - K[1, 2]) / K[1, 1] * z
        pos = np.zeros((8, 3), np.float32)
        pos[0] = [x, y, z]
        m = m._replace(
            pt_pos=jnp.asarray(pos),
            pt_valid=jnp.asarray(np.eye(1, 8, dtype=bool)[0]),
            pt_min_dist=jnp.full((8,), 0.1),
            pt_max_dist=jnp.full((8,), 100.0),
            pt_normal=jnp.asarray(
                np.tile(np.array([0, 0, 1.0], np.float32), (8, 1))),
        )
        return m, cam, K

    def test_edge_point_retained_with_bounds(self):
        m, cam, K = self._state_with_edge_point()
        T = jnp.eye(4)
        bounds = tuple(float(v) for v in undistorted_bounds(cam))
        vis_raw, _, _, _ = frustum_gate(m, T, jnp.asarray(K),
                                        cam.width, cam.height)
        vis_b, _, _, _ = frustum_gate(m, T, jnp.asarray(K),
                                      cam.width, cam.height, bounds=bounds)
        assert not bool(vis_raw[0])   # raw bounds cull the edge point
        assert bool(vis_b[0])         # undistorted bounds retain it

    def test_system_computes_bounds(self):
        from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig
        cam = _barrel_cam()
        cfg = SlamConfig(camera=cam, orb=None,
                         map=MapConfig(max_keyframes=8, max_points=64,
                                       n_features=32),
                         vocabulary=False, enable_loop_closing=False)
        sys_ = SLAMSystem(cfg)
        mnx, mxx, mny, mxy = sys_.img_bounds
        assert mnx < 0 and mxx > cam.width
        assert mny < 0 and mxy > cam.height
