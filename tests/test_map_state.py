"""Tests for the functional map backend: slot pools, covisibility matmul,
observation tables and point-statistics refresh."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.slam_map import (
    MapState, MapConfig, empty_map,
    incidence_matrix, covisibility_weights, observation_counts,
    flatten_observations, refresh_point_stats,
)
from orb_slam_tpu.slam_map.map_state import (
    insert_keyframe, add_points, remove_points, remove_keyframe,
)
from orb_slam_tpu.slam_map.covisibility import best_covisible, essential_edges
from orb_slam_tpu.slam_map.observations import observation_table

CFG = MapConfig(max_keyframes=8, max_points=64, n_features=32)


def make_kf_args(rng, frame_id, obs):
    N = CFG.n_features
    return dict(
        pose=jnp.eye(4),
        frame_id=frame_id,
        xy=jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32)),
        octave=jnp.zeros((N,), jnp.int32),
        angle=jnp.zeros((N,), jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32)),
        feat_valid=jnp.ones((N,), bool),
        obs=jnp.asarray(obs.astype(np.int32)),
        parent=-1,
    )


class TestMapState:
    def test_insert_and_covisibility(self, rng):
        m = empty_map(CFG)
        N = CFG.n_features
        # KF0 sees points 0..15, KF1 sees 8..23, KF2 sees 20..35
        for slot, lo in [(0, 0), (1, 8), (2, 20)]:
            obs = np.full(N, -1)
            obs[:16] = np.arange(lo, lo + 16)
            m = insert_keyframe(m, slot, **make_kf_args(rng, slot, obs))
        m = add_points(
            m, jnp.arange(40), jnp.zeros((40, 3)),
            jnp.zeros((40, 8), jnp.uint32),
            jnp.zeros(40, jnp.int32), jnp.zeros(40, jnp.int32),
            jnp.ones(40, bool))
        W = np.asarray(covisibility_weights(m))
        assert W[0, 1] == 8 and W[1, 0] == 8   # points 8..15 shared
        assert W[1, 2] == 4                     # points 20..23 shared
        assert W[0, 2] == 0
        assert W[0, 0] == 0
        counts = np.asarray(observation_counts(m))
        assert counts[10] == 2 and counts[0] == 1 and counts[22] == 2
        assert counts[45] == 0

    def test_remove_points_unbinds(self, rng):
        m = empty_map(CFG)
        obs = np.full(CFG.n_features, -1)
        obs[:4] = [0, 1, 2, 3]
        m = insert_keyframe(m, 0, **make_kf_args(rng, 0, obs))
        m = add_points(m, jnp.arange(4), jnp.zeros((4, 3)),
                       jnp.zeros((4, 8), jnp.uint32),
                       jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
                       jnp.ones(4, bool))
        kill = jnp.zeros(CFG.max_points, bool).at[1].set(True).at[3].set(True)
        m = remove_points(m, kill)
        assert not bool(m.pt_valid[1]) and bool(m.pt_valid[0])
        obs_after = np.asarray(m.kf_obs[0, :4])
        np.testing.assert_array_equal(obs_after, [0, -1, 2, -1])

    def test_remove_keyframe(self, rng):
        m = empty_map(CFG)
        obs = np.full(CFG.n_features, -1)
        m = insert_keyframe(m, 2, **make_kf_args(rng, 2, obs))
        assert bool(m.kf_valid[2])
        m = remove_keyframe(m, 2)
        assert not bool(m.kf_valid[2])

    def test_best_covisible_and_essential(self, rng):
        m = empty_map(CFG)
        N = CFG.n_features
        for slot, lo in [(0, 0), (1, 0), (2, 24)]:
            obs = np.full(N, -1)
            obs[:32] = np.arange(lo, lo + 32)
            m = insert_keyframe(m, slot, **make_kf_args(rng, slot, obs))
        m = add_points(m, jnp.arange(56), jnp.zeros((56, 3)),
                       jnp.zeros((56, 8), jnp.uint32),
                       jnp.zeros(56, jnp.int32), jnp.zeros(56, jnp.int32),
                       jnp.ones(56, bool))
        W = covisibility_weights(m)
        slots, weights = best_covisible(W, 0, 3)
        assert int(slots[0]) == 1 and int(weights[0]) == 32
        # essential graph with threshold 100: no covis edge, but spanning tree
        parent = jnp.asarray(np.array([-1, 0, 1] + [-1] * 5, np.int32))
        adj = np.asarray(essential_edges(W, parent, m.loop_edges))
        assert adj[1, 0] and adj[0, 1] and adj[2, 1]
        assert not adj[2, 0]


class TestObservations:
    def test_flatten_sorted(self, rng):
        m = empty_map(CFG)
        obs0 = np.full(CFG.n_features, -1); obs0[:3] = [5, 2, 9]
        obs1 = np.full(CFG.n_features, -1); obs1[:2] = [2, 9]
        m = insert_keyframe(m, 0, **make_kf_args(rng, 0, obs0))
        m = insert_keyframe(m, 1, **make_kf_args(rng, 1, obs1))
        m = add_points(m, jnp.asarray([2, 5, 9]), jnp.zeros((3, 3)),
                       jnp.zeros((3, 8), jnp.uint32),
                       jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32),
                       jnp.ones(3, bool))
        pid, kf, feat, valid = (np.asarray(x) for x in flatten_observations(m))
        v = valid
        assert (np.diff(pid[v]) >= 0).all()
        np.testing.assert_array_equal(pid[v], [2, 2, 5, 9, 9])

    def test_observation_table(self, rng):
        m = empty_map(CFG)
        obs0 = np.full(CFG.n_features, -1); obs0[7] = 3
        obs1 = np.full(CFG.n_features, -1); obs1[11] = 3
        m = insert_keyframe(m, 0, **make_kf_args(rng, 0, obs0))
        m = insert_keyframe(m, 1, **make_kf_args(rng, 1, obs1))
        m = add_points(m, jnp.asarray([3]), jnp.zeros((1, 3)),
                       jnp.zeros((1, 8), jnp.uint32),
                       jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
                       jnp.ones(1, bool))
        okf, ofeat, ovalid = (np.asarray(x) for x in observation_table(m))
        assert ovalid[3, :2].all() and not ovalid[3, 2:].any()
        assert set(okf[3, :2]) == {0, 1}
        assert set(ofeat[3, :2]) == {7, 11}

    def test_observation_table_cap32(self, rng):
        """The production default cap (32, PERF.md study) — the suite runs
        at SLAM_OBS_CAP=16 for CPU speed, so cover the 32-wide table
        explicitly: same first-O semantics, wider padding."""
        m = empty_map(CFG)
        obs0 = np.full(CFG.n_features, -1); obs0[7] = 3
        obs1 = np.full(CFG.n_features, -1); obs1[11] = 3
        m = insert_keyframe(m, 0, **make_kf_args(rng, 0, obs0))
        m = insert_keyframe(m, 1, **make_kf_args(rng, 1, obs1))
        m = add_points(m, jnp.asarray([3]), jnp.zeros((1, 3)),
                       jnp.zeros((1, 8), jnp.uint32),
                       jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
                       jnp.ones(1, bool))
        okf, ofeat, ovalid = (
            np.asarray(x) for x in observation_table(m, cap=32))
        assert okf.shape[1] == 32
        assert ovalid[3, :2].all() and not ovalid[3, 2:].any()
        assert set(okf[3, :2]) == {0, 1}
        assert set(ofeat[3, :2]) == {7, 11}

    def test_refresh_point_stats(self, rng):
        m = empty_map(CFG)
        # one point at (0,0,5), seen by two KFs at known centers
        from orb_slam_tpu.geometry import se3_from_rt
        import jax.numpy as j
        pos = jnp.asarray([[0.0, 0.0, 5.0]])
        # KF0 at origin, KF1 at x=2 (both looking down +z, identity R)
        obs0 = np.full(CFG.n_features, -1); obs0[0] = 0
        obs1 = np.full(CFG.n_features, -1); obs1[0] = 0
        a0 = make_kf_args(rng, 0, obs0)
        a1 = make_kf_args(rng, 1, obs1)
        a1["pose"] = se3_from_rt(jnp.eye(3), jnp.asarray([-2.0, 0.0, 0.0]))
        m = insert_keyframe(m, 0, **a0)
        m = insert_keyframe(m, 1, **a1)
        m = add_points(m, jnp.asarray([0]), pos,
                       jnp.zeros((1, 8), jnp.uint32),
                       jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32),
                       jnp.ones(1, bool))
        m = refresh_point_stats(m)
        normal = np.asarray(m.pt_normal[0])
        d0 = np.array([0, 0, 5.0]); d0 /= np.linalg.norm(d0)
        d1 = np.array([-2, 0, 5.0]); d1 /= np.linalg.norm(d1)
        expected = d0 + d1; expected /= np.linalg.norm(expected)
        np.testing.assert_allclose(normal, expected, atol=1e-5)
        # distinctive descriptor equals one of the two observed descriptors
        descs = np.asarray(m.kf_desc)[[0, 1], [0, 0]]
        assert (np.asarray(m.pt_desc[0]) == descs).all(axis=1).any()
        # depth band: ref KF 0 at distance 5, octave 0
        assert np.isclose(float(m.pt_max_dist[0]), 5.0, atol=1e-4)
        assert float(m.pt_min_dist[0]) < 5.0
        # untouched invalid points unchanged
        assert not bool(m.pt_valid[5])


class TestFuseChainedMerges:
    def test_transitive_remap_in_single_fuse(self, rng):
        """Chained merges inside ONE fuse call (remap[Y]=X while remap[X]=Z)
        must rebind Y's observations to the final winner Z, not to the
        killed slot X (advisor finding, round 1)."""
        from orb_slam_tpu.pipeline.mapping_kernels import fuse_into_keyframe

        m = empty_map(CFG)
        N = CFG.n_features
        X, Y, Z = 10, 11, 12
        A = np.zeros(8, np.uint32)              # descriptor for X / g0
        B = np.full(8, 0xFFFFFFFF, np.uint32)   # descriptor for Y / g1

        # src kf0: feature 0 -> X, feature 1 -> Y
        obs0 = np.full(N, -1); obs0[0] = X; obs0[1] = Y
        a0 = make_kf_args(rng, 0, obs0)
        xy0 = np.asarray(a0["xy"]).copy()
        xy0[0] = [320.0, 240.0]; xy0[1] = [321.0, 240.0]
        a0["xy"] = jnp.asarray(xy0)
        m = insert_keyframe(m, 0, **a0)
        # dst kf1: feature 0 (desc A) -> Z, feature 1 (desc B) -> X
        obs1 = np.full(N, -1); obs1[0] = Z; obs1[1] = X
        a1 = make_kf_args(rng, 1, obs1)
        xy1 = np.asarray(a1["xy"]).copy()
        xy1[0] = [320.0, 240.0]; xy1[1] = [321.0, 240.0]
        a1["xy"] = jnp.asarray(xy1)
        d1 = np.asarray(a1["desc"]).copy(); d1[0] = A; d1[1] = B
        a1["desc"] = jnp.asarray(d1)
        m = insert_keyframe(m, 1, **a1)
        # kf2, kf3 observe Z so obs counts are Z=3 > X=2 > Y=1
        for slot in (2, 3):
            obs = np.full(N, -1); obs[0] = Z
            m = insert_keyframe(m, slot, **make_kf_args(rng, slot, obs))

        # all three points at (0,0,5) in front of the identity cameras
        m = add_points(m, jnp.asarray([X, Y, Z]),
                       jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (3, 1)),
                       jnp.asarray(np.stack([A, B, A])),
                       jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32),
                       jnp.ones(3, bool))
        m = m._replace(
            pt_max_dist=m.pt_max_dist.at[jnp.asarray([X, Y, Z])].set(5.0),
            pt_min_dist=m.pt_min_dist.at[jnp.asarray([X, Y, Z])].set(0.0),
        )
        K_mat = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])

        m2, n_bound, n_merged, remap = fuse_into_keyframe(m, 0, 1, K_mat)
        assert int(n_merged) == 2
        # the returned forwarding map resolves both losers to the winner
        remap_np = np.asarray(remap)
        assert remap_np[X] == Z and remap_np[Y] == Z and remap_np[Z] == Z
        # X and Y are dead, Z survives
        assert not bool(m2.pt_valid[X]) and not bool(m2.pt_valid[Y])
        assert bool(m2.pt_valid[Z])
        obs_after = np.asarray(m2.kf_obs)
        # every surviving observation points at Z — including kf0's Y
        # binding, which pre-fix was left on the killed slot X
        assert obs_after[0, 0] == Z and obs_after[0, 1] == Z
        assert obs_after[1, 0] == Z and obs_after[1, 1] == Z
        assert obs_after[2, 0] == Z and obs_after[3, 0] == Z
