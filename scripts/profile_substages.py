"""Fine-grained scan-slope profile of the frame hot path's SUB-stages.

Splits the two composite costs profile_device.py reports (extraction tail
~0.8 ms, track ~0.85 ms) into their constituents so optimization effort
lands on the real dominator. Methodology identical to profile_device.slope:
run the stage N times inside ONE program at two repetition counts; the
dispatch cost cancels in the difference.

Usage: python scripts/profile_substages.py [A|B|all]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

WHICH = (_sys.argv[1] if len(_sys.argv) > 1 else "all").upper()


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial
    from orb_slam_tpu.frontend.orb_extractor import (
        ORBConfig, ORBExtractor, _extract_stacked,
    )
    from orb_slam_tpu.geometry import CameraModel, undistort_points
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.ops.fast_stack import build_pyramid_stack
    from orb_slam_tpu.ops.image import pyramid_shapes
    from orb_slam_tpu.ops.pallas_fast import fast_score_nms_packed
    from orb_slam_tpu.ops.fast_stack import select_from_scores
    from orb_slam_tpu.ops.descriptor_stack import (
        gaussian_blur_stack, ic_angles_batch, rbrief_batch_lut,
    )
    from orb_slam_tpu.pipeline.track_kernels import frustum_gate, _track_body
    from orb_slam_tpu.ops.matching import match, TH_HIGH
    from orb_slam_tpu.solvers.pose_opt import pose_optimize
    from orb_slam_tpu.slam_map import MapConfig, empty_map
    from orb_slam_tpu.slam_map.map_state import add_points

    W, H = 640, 480
    scene = SyntheticScene(n_points=800, width=W, height=H)
    cam = CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                             width=W, height=H)
    config = ORBConfig(n_features=1000)
    ex = ORBExtractor(config)
    consts = ex.pyramid_consts((H, W))
    K_mat = jnp.asarray(scene.K)
    shp = tuple(pyramid_shapes(H, W, config.n_levels, config.scale_factor))
    quotas = tuple(config.level_quotas())

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
    T0 = jnp.eye(4)

    # Precompute per-frame features once (host) to feed the track stages.
    feats16 = []
    for i in range(16):
        f = _extract_stacked(imgs16[i], consts, config=config,
                             use_pallas=ex.use_pallas)
        feats16.append((undistort_points(cam, f.xy), f.desc_u32, f.octave,
                        f.valid))
    fxy = jnp.stack([f[0] for f in feats16])
    fdesc = jnp.stack([f[1] for f in feats16])
    foct = jnp.stack([f[2] for f in feats16])
    fval = jnp.stack([f[3] for f in feats16])

    def slope(name, fn, xs):
        def outer(xs_in):
            def body(carry, x):
                return carry, fn(x)
            _, out = jax.lax.scan(body, 0, xs_in)
            return jax.tree.map(
                lambda y: jnp.sum(y.astype(jnp.float32)), out)
        f = jax.jit(outer)
        sub4 = jax.tree.map(lambda a: a[:4], xs)
        jax.tree.map(float, f(sub4))
        jax.tree.map(float, f(xs))
        ts4, ts16 = [], []
        for k in range(4):
            pert4 = jax.tree.map(
                lambda a: a + (k + 1) * 1e-3 if a.dtype == jnp.float32 else a,
                sub4)
            pert16 = jax.tree.map(
                lambda a: a + (k + 1) * 1e-3 if a.dtype == jnp.float32 else a,
                xs)
            t0 = time.perf_counter()
            jax.tree.map(float, f(pert4))
            ts4.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.tree.map(float, f(pert16))
            ts16.append(time.perf_counter() - t0)
        dt = (min(ts16) - min(ts4)) / 12 * 1e3
        print(f"{name:44s} {dt:7.3f} ms/frame (device)", flush=True)
        return dt

    # ---------------- extraction tail sub-stages ----------------
    run_a = WHICH in ("A", "ALL")
    run_b = WHICH in ("B", "ALL")

    def _stack(img):
        return build_pyramid_stack(img, config.n_levels, config.scale_factor,
                                   consts=consts)[0]

    def _scored(img):
        return fast_score_nms_packed(_stack(img), shp, BH=48, BW=256,
                                     tree=True)

    if run_a:
        slope("A1 pyramid+packed-score", lambda im: _scored(im)[0], imgs16)
        slope("A2 ..+cell-select", lambda im: select_from_scores(
            *_scored(im), shp, quotas)[0], imgs16)

    def _detected(img):
        s = _stack(img)
        score, keep = fast_score_nms_packed(s, shp, BH=48, BW=256, tree=True)
        xy_l, sc, v = select_from_scores(score, keep, shp, quotas)
        return s, xy_l

    lut = consts[2]

    def _full_desc(img):
        from orb_slam_tpu.ops.descriptor_stack import angles_desc_fused
        s, xy_l = _detected(img)
        return angles_desc_fused(s, xy_l, shp, lut, 30, quotas=quotas)[1]

    if run_a:
        slope("A3 ..+angles+desc (fused 45px path)",
              lambda im: _full_desc(im), imgs16)
        slope("A5 full extract (epilogue incl.)", lambda im: _extract_stacked(
            im, consts, config=config, use_pallas=True).desc_u32, imgs16)

    # ---------------- tracking sub-stages ----------------
    if not run_b:
        return
    xs = (fxy, fdesc, foct, fval)

    slope("B1 frustum gate", lambda fr: frustum_gate(
        m, T0, K_mat, W, H)[0], xs)

    def _sel(fr):
        visible, proj, pred, dist = frustum_gate(m, T0, K_mat, W, H)
        score = visible.astype(jnp.float32)
        _, sel = jax.lax.top_k(score, 4096)
        return sel, visible, proj, pred

    slope("B2 ..+topk-select", lambda fr: _sel(fr)[0], xs)

    def _matched(fr):
        xy, desc, octv, val = fr
        sel, visible, proj, pred = _sel(fr)
        sel_ok = visible[sel]
        cand_desc = m.pt_desc[sel]
        cand_proj = proj[sel]
        cand_level = pred[sel]
        sf = 1.2 ** cand_level.astype(jnp.float32)
        r = 15.0 * sf
        d = cand_proj[:, None, :] - xy[None, :, :]
        gate = jnp.sum(d * d, axis=-1) <= (r * r)[:, None]
        gate &= (octv[None, :] >= cand_level[:, None] - 1) & (
            octv[None, :] <= cand_level[:, None] + 1)
        bi, bd, mt = match(cand_desc, desc, allowed=gate, valid_a=sel_ok,
                           valid_b=val, max_dist=TH_HIGH, nn_ratio=0.9,
                           unique=True)
        return sel, bi, mt

    slope("B3 ..+gate+match", lambda fr: _matched(fr)[1], xs)

    def _opt(fr):
        xy, desc, octv, val = fr
        sel, bi, mt = _matched(fr)
        muv = xy[bi]
        moct = octv[bi]
        inv_s2 = 1.0 / (1.2 ** (2.0 * moct.astype(jnp.float32)))
        T_opt, inl, n_in = pose_optimize(T0, m.pt_pos[sel], muv, inv_s2, mt,
                                         K_mat, iters=(4, 3, 2, 2))
        return T_opt

    slope("B4 ..+pose-GN(4,3,2,2)", _opt, xs)
    slope("B5 full track body", lambda fr: _track_body(
        m, fr[0], fr[1], fr[2], fr[3], T0, K_mat, p_local=4096,
        width=W, height=H).pose, xs)


if __name__ == "__main__":
    main()
