"""Edge-case robustness: empty maps, no-match frames, degenerate solver
inputs must return finite, well-defined results (never NaN/crash)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.slam_map import MapConfig, empty_map
from orb_slam_tpu.slam_map.observations import refresh_point_stats
from orb_slam_tpu.pipeline.track_kernels import track_frame
from orb_slam_tpu.solvers import initialize_two_view, pose_optimize
from orb_slam_tpu.solvers.local_ba import bundle_adjust

K_MAT = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
CFG = MapConfig(max_keyframes=8, max_points=128, n_features=64)


class TestEdgeCases:
    def test_track_empty_map(self, rng):
        m = empty_map(CFG)
        N = CFG.n_features
        res = track_frame(
            m,
            jnp.asarray(rng.uniform(0, 480, (N, 2)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32)),
            jnp.zeros(N, jnp.int32), jnp.ones(N, bool),
            jnp.eye(4), K_MAT, p_local=64, width=640, height=480)
        assert int(res.n_inliers) == 0
        assert np.isfinite(np.asarray(res.pose)).all()
        assert (np.asarray(res.obs) == -1).all()

    def test_track_invalid_frame(self, rng):
        m = empty_map(CFG)
        N = CFG.n_features
        res = track_frame(
            m, jnp.zeros((N, 2)), jnp.zeros((N, 8), jnp.uint32),
            jnp.zeros(N, jnp.int32), jnp.zeros(N, bool),
            jnp.eye(4), K_MAT, p_local=64, width=640, height=480)
        assert int(res.n_inliers) == 0
        assert np.isfinite(np.asarray(res.pose)).all()

    def test_ba_no_edges(self):
        m = empty_map(CFG)
        new_m, outlier, _ = bundle_adjust(
            m, K_MAT, jnp.zeros(CFG.max_keyframes, bool),
            jnp.zeros(CFG.max_points, bool), iters1=2, iters2=2)
        assert np.isfinite(np.asarray(new_m.kf_pose)).all()
        assert np.isfinite(np.asarray(new_m.pt_pos)).all()
        assert not np.asarray(outlier).any()

    def test_init_too_few_matches(self, rng):
        n = 64
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.zeros(n, bool).at[:5].set(True)  # < 8 points
        res = initialize_two_view(x1, x2, valid, K_MAT, jax.random.PRNGKey(0))
        assert not bool(res.success)
        assert np.isfinite(np.asarray(res.R21)).all()

    def test_init_all_invalid(self, rng):
        n = 64
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        res = initialize_two_view(
            x1, x1, jnp.zeros(n, bool), K_MAT, jax.random.PRNGKey(0))
        assert not bool(res.success)

    def test_pose_opt_no_valid(self, rng):
        n = 32
        T, inl, n_in = pose_optimize(
            jnp.eye(4), jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 480, (n, 2)).astype(np.float32)),
            jnp.ones(n, jnp.float32), jnp.zeros(n, bool), K_MAT)
        assert int(n_in) == 0
        assert np.isfinite(np.asarray(T)).all()

    def test_refresh_empty_map(self):
        m = empty_map(CFG)
        m2 = refresh_point_stats(m)
        for f in m2._fields:
            arr = np.asarray(getattr(m2, f))
            if arr.dtype.kind == "f":
                # inf allowed (pt_max_dist init), NaN not
                assert not np.isnan(arr).any(), f

    def test_points_behind_camera(self, rng):
        """Tracking with every candidate behind the camera must not match."""
        from orb_slam_tpu.slam_map.map_state import add_points
        m = empty_map(CFG)
        pts = np.stack([rng.uniform(-1, 1, 32), rng.uniform(-1, 1, 32),
                        -rng.uniform(2, 5, 32)], 1).astype(np.float32)
        m = add_points(m, jnp.arange(32), jnp.asarray(pts),
                       jnp.zeros((32, 8), jnp.uint32),
                       jnp.zeros(32, jnp.int32), jnp.zeros(32, jnp.int32),
                       jnp.ones(32, bool))
        m = m._replace(pt_max_dist=jnp.full(CFG.max_points, 50.0),
                       pt_normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]),
                                          (CFG.max_points, 1)))
        N = CFG.n_features
        res = track_frame(
            m, jnp.asarray(rng.uniform(0, 480, (N, 2)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32)),
            jnp.zeros(N, jnp.int32), jnp.ones(N, bool),
            jnp.eye(4), K_MAT, p_local=64, width=640, height=480)
        assert int(res.n_inliers) == 0
