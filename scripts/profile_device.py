"""Device-time profiler for the frame hot path (scan-slope method).

The development tunnel adds a large, partially-pipelined dispatch latency
per program execution, so naive per-call timing measures the tunnel, not
the TPU. Two methodologies used here (documented in PERF.md):

  * scan-slope: run the SAME stage N times inside ONE program (lax.scan
    over stacked unique inputs) at two repetition counts; the dispatch
    cost cancels in the difference, leaving pure device ms/iteration.
  * sustained throughput: issue K dispatches of unique inputs back to
    back and force all results at the end — measures the pipelined
    frames/sec the tunnel actually delivers (what bench.py reports).

Usage: python scripts/profile_device.py [stages|chunks]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time
from functools import partial

import numpy as np


def build_fixture():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor
    from orb_slam_tpu.geometry import CameraModel
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.slam_map import MapConfig, empty_map
    from orb_slam_tpu.slam_map.map_state import add_points

    W, H = 640, 480
    scene = SyntheticScene(n_points=800, width=W, height=H)
    cam = CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                             width=W, height=H)
    extractor = ORBExtractor(ORBConfig(n_features=1000))
    cfg = MapConfig(max_keyframes=64, max_points=8192, n_features=1000)
    rng = np.random.default_rng(0)
    m = empty_map(cfg)
    pts = scene.points[rng.integers(0, scene.n_points, 2000)] + \
        rng.normal(0, 0.01, (2000, 3)).astype(np.float32)
    m = add_points(
        m, jnp.arange(2000), jnp.asarray(pts.astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)),
        jnp.zeros(2000, jnp.int32), jnp.zeros(2000, jnp.int32),
        jnp.ones(2000, bool))
    m = m._replace(
        pt_max_dist=jnp.full(cfg.max_points, 30.0),
        pt_min_dist=jnp.zeros(cfg.max_points),
        pt_normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]),
                           (cfg.max_points, 1)))
    poses = lateral_trajectory(16, step=0.01)
    imgs16 = jnp.asarray(np.stack(
        [np.asarray(scene.render_image(poses[i])) for i in range(16)]
    )).astype(jnp.float32)
    return scene, cam, extractor, m, imgs16, (W, H)


def slope(name, fn, imgs16, consts):
    """Device ms/iteration from the N=4 vs N=16 in-program repetition."""
    import jax
    import jax.numpy as jnp

    def outer(imgs, consts):
        def body(c, img):
            return c, fn(img, consts)
        _, out = jax.lax.scan(body, 0, imgs)
        return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)

    f = jax.jit(outer)
    jax.tree.map(float, f(imgs16[:4], consts))
    ts4, ts16 = [], []
    for k in range(3):
        t0 = time.perf_counter()
        jax.tree.map(float, f(imgs16[:4] + (k + 1) * 1e-3, consts))
        ts4.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.tree.map(float, f(imgs16 + (k + 1) * 1e-3, consts))
        ts16.append(time.perf_counter() - t0)
    dt = (min(ts16) - min(ts4)) / 12 * 1e3
    print(f"{name:40s} {dt:7.2f} ms/frame (device)")
    return dt


def run_stages():
    import jax
    import jax.numpy as jnp
    from orb_slam_tpu.frontend.orb_extractor import _extract_stacked
    from orb_slam_tpu.geometry import undistort_points
    from orb_slam_tpu.ops.fast_stack import (
        build_pyramid_stack, fast_score_stack,
    )
    from orb_slam_tpu.ops.pallas_fast import (
        fast_score_nms_pallas, fast_score_nms_packed,
    )
    from orb_slam_tpu.pipeline.track_kernels import _track_body

    scene, cam, extractor, m, imgs16, (W, H) = build_fixture()
    config = extractor.config
    consts = extractor.pyramid_consts((H, W))
    K_mat = jnp.asarray(scene.K)
    T0 = jnp.eye(4)

    slope("pyramid", lambda img, c: build_pyramid_stack(
        img, config.n_levels, config.scale_factor, consts=c)[0],
        imgs16, consts)
    slope("fast score (XLA roll-tree)", lambda img, c: fast_score_stack(
        build_pyramid_stack(img, config.n_levels, config.scale_factor,
                            consts=c)[0]), imgs16, consts)
    slope("fast score+nms (pallas rect)", lambda img, c: fast_score_nms_pallas(
        build_pyramid_stack(img, config.n_levels, config.scale_factor,
                            consts=c)[0]), imgs16, consts)

    from orb_slam_tpu.ops.image import pyramid_shapes
    shp = tuple(pyramid_shapes(H, W, config.n_levels, config.scale_factor))
    slope("fast score+nms (pallas packed)",
          lambda img, c: fast_score_nms_packed(
              build_pyramid_stack(img, config.n_levels, config.scale_factor,
                                  consts=c)[0], shp, tree=True),
          imgs16, consts)
    from orb_slam_tpu.ops.fast_stack import (
        detect_keypoints_stack_pallas, select_from_scores)
    from orb_slam_tpu.ops.descriptor_stack import (
        gaussian_blur_stack, ic_angles_batch)
    quotas = tuple(config.level_quotas())

    slope("detect (packed + cell-select)",
          lambda img, c: detect_keypoints_stack_pallas(
              build_pyramid_stack(img, config.n_levels, config.scale_factor,
                                  consts=c)[0], shp, quotas)[0],
          imgs16, consts)
    slope("gaussian blur",
          lambda img, c: gaussian_blur_stack(
              build_pyramid_stack(img, config.n_levels, config.scale_factor,
                                  consts=c)[0]),
          imgs16, consts)
    slope("full extract (XLA score)", lambda img, c: _extract_stacked(
        img, c, config=config, use_pallas=False).desc_u32, imgs16, consts)
    slope("full extract (pallas score)", lambda img, c: _extract_stacked(
        img, c, config=config, use_pallas=True).desc_u32, imgs16, consts)

    def frame(img, c):
        f = _extract_stacked(img, c, config=config, use_pallas=True)
        xy_und = undistort_points(cam, f.xy)
        return _track_body(m, xy_und, f.desc_u32, f.octave, f.valid, T0,
                           K_mat, p_local=4096, width=W, height=H).pose
    slope("extract+undistort+track", frame, imgs16, consts)


def run_chunks():
    import jax
    import jax.numpy as jnp
    from orb_slam_tpu.frontend.orb_extractor import _extract_stacked
    from orb_slam_tpu.geometry import undistort_points
    from orb_slam_tpu.io.synthetic import lateral_trajectory
    from orb_slam_tpu.pipeline.track_kernels import _track_chunk_body
    from orb_slam_tpu.utils.dispatch import fused_jit

    scene, cam, extractor, m, _, (W, H) = build_fixture()
    consts = extractor.pyramid_consts((H, W))
    K_mat = jnp.asarray(scene.K)
    T0, V0 = jnp.eye(4), jnp.eye(4)
    NB = 64
    poses = lateral_trajectory(NB, step=0.005)
    base = np.stack([np.asarray(scene.render_image(poses[i]))
                     for i in range(NB)]).astype(np.float32)

    def _chunk(imgs, consts, state, pose0, vel0):
        from orb_slam_tpu.pipeline.track_kernels import chunk_track_step
        extract = partial(_extract_stacked, config=extractor.config,
                          use_pallas=extractor.use_pallas)

        def one(carry, img):
            f = extract(img, consts)
            xy_und = undistort_points(cam, f.xy)
            carry, out = chunk_track_step(
                state, xy_und, f.desc_u32, f.octave, f.valid, carry, K_mat,
                p_local=4096, width=W, height=H, radius=15.0,
                max_dist=100, min_inliers=30, use_motion_model=True,
                retry=False)
            return carry, (out[0], out[2])

        _, (poses, n_in) = jax.lax.scan(one, (pose0, vel0), imgs)
        return poses, n_in

    step = fused_jit(_chunk)
    touch = jax.jit(lambda x: jnp.sum(x))
    N_REP = 8
    for B in (8, 16, 32):
        chunks = [jnp.asarray(base[:B] + k * 0.5) for k in range(N_REP + 1)]
        for ch in chunks:
            float(touch(ch))
        p, _ = step(chunks[-1], consts, m, T0, V0)
        float(jnp.sum(p))
        t0 = time.perf_counter()
        outs = [step(chunks[k], consts, m, T0, V0) for k in range(N_REP)]
        float(sum(jnp.sum(p) for p, _ in outs))
        dt = (time.perf_counter() - t0) / N_REP
        print(f"B={B:3d}: {dt*1e3:8.1f} ms/chunk = {dt/B*1e3:6.2f} ms/frame "
              f"({B/dt:.0f} fps sustained)")

    # chunk-slope: marginal DEVICE cost per frame inside one chunked
    # program (vmapped extraction + scan tracking) — sized-chunk timing
    # difference cancels the dispatch cost, and vmapped extraction
    # amortizes op launch latencies the sequential scan-slope pays per
    # frame. This is the production throughput ceiling per chip.
    B_LO, B_HI = 16, 56
    chunks_lo = [jnp.asarray(base[:B_LO] + k * 0.3) for k in range(4)]
    chunks_hi = [jnp.asarray(base[:B_HI] + k * 0.3) for k in range(4)]
    for ch in chunks_lo + chunks_hi:
        float(touch(ch))
    for ch in (chunks_lo[0], chunks_hi[0]):
        p, _ = step(ch, consts, m, T0, V0)
        float(jnp.sum(p))
    t_lo = t_hi = 1e9
    for k in range(3):
        t0 = time.perf_counter()
        p, _ = step(chunks_lo[k + 1], consts, m, T0, V0)
        float(jnp.sum(p))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        p, _ = step(chunks_hi[k + 1], consts, m, T0, V0)
        float(jnp.sum(p))
        t_hi = min(t_hi, time.perf_counter() - t0)
    ms = (t_hi - t_lo) / (B_HI - B_LO) * 1e3
    print(f"chunk-slope marginal device cost: {ms:.2f} ms/frame "
          f"({1e3/ms:.0f} fps/chip ceiling)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    (run_stages if mode == "stages" else run_chunks)()
