"""Tests for auxiliary subsystems: map serialization, viz, native vocab
parser, Harris scoring, settings, trajectory IO, timing."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, WORKING
from orb_slam_tpu.slam_map import MapConfig
from orb_slam_tpu.geometry import CameraModel


def small_system(scene, n_slots=200):
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        map=MapConfig(max_keyframes=16, max_points=1024, n_features=n_slots),
        p_local=512, n_triangulation_neighbors=2, n_fuse_neighbors=2,
        local_ba_window=4, enable_loop_closing=False,
        enable_relocalisation=False, orb=None,
    )
    return SLAMSystem(cfg)


@pytest.fixture(scope="module")
def tracked_system():
    scene = SyntheticScene(n_points=400, seed=11)
    sys_ = small_system(scene)
    poses = lateral_trajectory(14, step=0.08)
    for i in range(14):
        sys_.process(features=scene.observe(poses[i], n_slots=200))
    assert sys_.state == WORKING
    return sys_, scene, poses


class TestSerialization:
    def test_roundtrip_resume(self, tracked_system, tmp_path):
        from orb_slam_tpu.slam_map.serialization import save_session, load_session
        sys_, scene, poses = tracked_system
        p = str(tmp_path / "map.npz")
        save_session(p, sys_)
        scene2 = SyntheticScene(n_points=400, seed=11)
        sys2 = small_system(scene2)
        load_session(p, sys2)
        assert sys2.n_keyframes == sys_.n_keyframes
        assert sys2.n_points == sys_.n_points
        np.testing.assert_array_equal(
            np.asarray(sys2.map.pt_pos), np.asarray(sys_.map.pt_pos))
        # resumed system keeps tracking
        out = sys2.process(features=scene2.observe(poses[13], n_slots=200))
        assert out is not None


class TestViz:
    def test_draw_map(self, tracked_system, tmp_path):
        from orb_slam_tpu.io.viz import draw_map
        sys_, _, _ = tracked_system
        p = str(tmp_path / "map.png")
        draw_map(sys_, p)
        import os
        assert os.path.getsize(p) > 1000

    def test_draw_frame(self, rng):
        from orb_slam_tpu.io.viz import draw_frame
        img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
        xy = rng.uniform(10, 100, (30, 2))
        mask = rng.random(30) > 0.5
        out = draw_frame(img, xy, mask, "WORKING", 5, 100, 50)
        assert out.shape == (138, 160, 3)

    def test_draw_live_frame(self, tracked_system, tmp_path):
        from orb_slam_tpu.io.viz import draw_live_frame
        sys_, scene, poses = tracked_system
        img = np.zeros((sys_.cfg.camera.height, sys_.cfg.camera.width),
                       np.float32)
        p = str(tmp_path / "frame.png")
        out = draw_live_frame(sys_, img, p)
        assert out.shape[0] == sys_.cfg.camera.height + 18
        import os
        assert os.path.getsize(p) > 200


class TestNativeVocabParser:
    def test_matches_python_parser(self, rng, tmp_path):
        from orb_slam_tpu.place import train_vocabulary, transform
        from orb_slam_tpu.place.vocabulary import save_text, load_text
        from orb_slam_tpu.native import parse_vocab_text
        train = rng.integers(0, 2**32, (300, 8), dtype=np.uint32)
        voc = train_vocabulary(train, k=4, L=3, seed=1)
        p = str(tmp_path / "voc.txt")
        save_text(voc, p)
        parsed = parse_vocab_text(p)
        assert parsed is not None, "native parser failed to build/run"
        k, L, parent, is_leaf, desc, weight = parsed
        assert k == 4 and L == 3
        assert len(parent) == len(voc.node_desc) - 1
        # end-to-end: load_text (which uses native path) matches transform
        voc2 = load_text(p)
        q = rng.integers(0, 2**32, (40, 8), dtype=np.uint32)
        w1 = np.asarray(transform(voc, jnp.asarray(q))[0])
        w2 = np.asarray(transform(voc2, jnp.asarray(q))[0])
        for i in range(40):
            for j in range(40):
                assert (w1[i] == w1[j]) == (w2[i] == w2[j])


class TestHarris:
    def test_harris_mode_detects(self, rng):
        cv2 = pytest.importorskip("cv2")
        from orb_slam_tpu.ops.fast import detect_fast_keypoints
        img = rng.uniform(40, 80, (240, 320)).astype(np.float32)
        for _ in range(120):
            y, x = rng.integers(10, 230), rng.integers(10, 310)
            s = int(rng.integers(3, 8))
            img[y - s:y + s, x - s:x + s] = float(rng.uniform(100, 255))
        img = cv2.GaussianBlur(img, (3, 3), 0.8)
        xy, score, valid = detect_fast_keypoints(
            jnp.asarray(img), max_kp=150, use_harris=True)
        assert int(valid.sum()) > 50
        # harris-ranked corners should still be FAST corners
        from orb_slam_tpu.ops.fast import fast_score_map
        fs = np.asarray(fast_score_map(jnp.asarray(img)))
        xy_np = np.asarray(xy)[np.asarray(valid)]
        assert (fs[xy_np[:, 1], xy_np[:, 0]] > 7.0).all()


class TestTiming:
    def test_stage_timer(self):
        from orb_slam_tpu.utils import StageTimer
        t = StageTimer(sync=False)
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2


class TestDispatchFused:
    def test_identical_results(self, rng):
        import jax
        import jax.numpy as jnp
        from orb_slam_tpu.utils.dispatch import fused_jit, dispatch_fused

        def fn(x, y):
            return jnp.sin(x) @ y + jnp.sum(x), x * 2

        x = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        a = jax.jit(fn)(x, y)
        b = fused_jit(fn)(x, y)
        for u, v in zip(a, b):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-6)

    def test_static_argnames(self, rng):
        import jax.numpy as jnp
        from orb_slam_tpu.utils.dispatch import fused_jit

        @fused_jit(static_argnames=("k",))
        def topk(x, k: int):
            import jax
            return jax.lax.top_k(x, k)[0]

        x = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
        out = topk(x, k=4)
        assert out.shape == (4,)
        np.testing.assert_allclose(
            np.asarray(out), np.sort(np.asarray(x))[::-1][:4], rtol=1e-6)
