"""Config-driven scale pyramid: scaleFactor / nLevels must flow from the
settings into every kernel (the reference derives all scale tables from the
extractor config — src/ORBextractor.cc:476-487, Frame.cc:95-107,181-190 —
and never hardcodes 1.2/8 outside defaults)."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.io.trajectory import ate_rmse, camera_centers_from_cw
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING
from orb_slam_tpu.pipeline.track_kernels import frustum_gate
from orb_slam_tpu.frontend.orb_extractor import ORBConfig
from orb_slam_tpu.slam_map import MapConfig, empty_map
from orb_slam_tpu.slam_map.map_state import insert_keyframe, add_points
from orb_slam_tpu.slam_map.observations import refresh_point_stats
from orb_slam_tpu.geometry import CameraModel


def test_config_sync_from_orb():
    """SlamConfig propagates the extractor's pyramid into MapConfig."""
    cfg = SlamConfig(orb=ORBConfig(n_features=200, n_levels=4,
                                   scale_factor=1.5))
    assert cfg.map.n_levels == 4
    assert cfg.map.scale_factor == 1.5
    # explicit MapConfig with stale values is corrected
    cfg2 = SlamConfig(orb=ORBConfig(n_features=200, n_levels=4,
                                    scale_factor=1.5),
                      map=MapConfig(n_features=200))
    assert cfg2.map.n_levels == 4
    assert cfg2.map.scale_factor == 1.5


def test_frustum_octave_clamp_follows_n_levels():
    """The predicted octave must clamp to [0, n_levels-1] and use
    log(scale_factor) (reference: Frame.cc:181-190 via MapPoint's
    PredictScale)."""
    cfg = MapConfig(max_keyframes=4, max_points=64, n_features=16,
                    n_levels=4, scale_factor=1.5)
    m = empty_map(cfg)
    # one point very close relative to its max-dist band -> huge ratio ->
    # the unclamped level would exceed n_levels-1
    pos = np.zeros((1, 3), np.float32)
    pos[0] = [0.0, 0.0, 2.0]
    m = m._replace(
        pt_pos=m.pt_pos.at[0].set(jnp.asarray(pos[0])),
        pt_valid=m.pt_valid.at[0].set(True),
        pt_normal=m.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, -1.0])),
        pt_min_dist=m.pt_min_dist.at[0].set(0.1),
        pt_max_dist=m.pt_max_dist.at[0].set(500.0),  # ratio 250 -> level 13+
    )
    K_mat = jnp.asarray(np.array(
        [[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]], np.float32))
    T = jnp.eye(4)
    for nl, sf in ((4, 1.5), (8, 1.2), (3, 2.0)):
        vis, proj, pred, dist = frustum_gate(
            m, T, K_mat, 640, 480, scale_factor=sf, n_levels=nl)
        assert int(pred[0]) == nl - 1, (nl, sf, int(pred[0]))


def test_refresh_point_stats_band_uses_config():
    """The scale-invariance band spans sf^(n_levels-1) from the reference
    observation's level (MapPoint.cc:300-302)."""
    sf, nl = 1.5, 4
    cfg = MapConfig(max_keyframes=4, max_points=32, n_features=8,
                    n_levels=nl, scale_factor=sf)
    m = empty_map(cfg)
    xy = jnp.zeros((8, 2))
    octv = jnp.zeros((8,), jnp.int32).at[0].set(2)  # ref feature at level 2
    ang = jnp.zeros((8,))
    desc = jnp.zeros((8, 8), jnp.uint32)
    fv = jnp.ones((8,), bool)
    obs = jnp.full((8,), -1, jnp.int32).at[0].set(0)
    m = insert_keyframe(m, 0, jnp.eye(4), 0, xy, octv, ang, desc, fv, obs, -1)
    m = add_points(m, jnp.asarray([0], jnp.int32),
                   jnp.asarray([[0.0, 0.0, 5.0]]),
                   desc[:1], jnp.asarray([0], jnp.int32),
                   jnp.asarray([0], jnp.int32), jnp.asarray([True]))
    m = refresh_point_stats(m, scale_factor=sf, n_levels=nl)
    dist = 5.0
    exp_max = dist * sf ** 2
    exp_min = exp_max / sf ** (nl - 1)
    assert np.isclose(float(m.pt_max_dist[0]), exp_max, rtol=1e-5)
    assert np.isclose(float(m.pt_min_dist[0]), exp_min, rtol=1e-5)


def test_e2e_nondefault_pyramid():
    """Full image pipeline at scaleFactor=1.5 / nLevels=4 (the VERDICT-r2
    acceptance case): tracking must work and stay accurate."""
    scene = SyntheticScene(n_points=220, seed=21, width=320, height=240,
                           fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                           extent=(7.0, 5.0, 3.0), depth_range=(5.5, 8.5))
    n_frames = 14
    poses = lateral_trajectory(n_frames, step=0.12)
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=320, height=240),
        orb=ORBConfig(n_features=400, n_levels=4, scale_factor=1.5),
        map=MapConfig(max_keyframes=16, max_points=1024, n_features=400),
        p_local=512, n_triangulation_neighbors=2, n_fuse_neighbors=2,
        local_ba_window=4, enable_loop_closing=False,
        enable_relocalisation=False,
        min_init_matches=60, min_init_keypoints=60,
    )
    assert cfg.map.scale_factor == 1.5 and cfg.map.n_levels == 4
    system = SLAMSystem(cfg)
    est = {}
    for i in range(n_frames):
        img = scene.render_image(poses[i], patch=5)
        T = system.process(img=img)
        if T is not None:
            est[i] = T
    assert system.state == WORKING, "never initialized at 1.5/4"
    assert len(est) >= n_frames - 6
    assert system.n_points > 50

    ids = sorted(est.keys())
    C_est = camera_centers_from_cw(np.stack([est[i] for i in ids]))
    C_gt = camera_centers_from_cw(poses[ids])
    rmse, _ = ate_rmse(C_est, C_gt)
    traj_len = np.sum(np.linalg.norm(np.diff(C_gt, axis=0), axis=1))
    assert rmse < 0.15 * traj_len, f"ATE {rmse:.3f} vs len {traj_len:.2f}"
