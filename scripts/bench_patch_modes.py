"""Device A/B of the fused angles+desc patch formulations (scan-slope).

Compares extract_patches_batch modes inside the production
angles_desc_fused stage (the dominant extraction cost after the round-5
select rework, PERF.md):
  rowfirst      — row one-hot then column one-hot, bf16 (round-3 default)
  colfirst      — column one-hot first: H < W, so the strip intermediate
                  and second contraction shrink by W/H (25% at 640x480)
  colfirst-int8 — colfirst with s8xs8->s32 selections (2x MXU rate,
                  half the strip traffic)

Also reports descriptor agreement (mean Hamming distance) of each variant
vs rowfirst on the same keypoints, so the speed/precision trade is
recorded next to the timing.

Usage: python scripts/bench_patch_modes.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.ops.image import pyramid_shapes
    from orb_slam_tpu.ops.fast_stack import (
        build_pyramid_stack, select_from_scores,
    )
    from orb_slam_tpu.ops.pallas_fast import fast_score_nms_packed
    from orb_slam_tpu.ops.descriptor_stack import angles_desc_fused

    W, H = 640, 480
    scene = SyntheticScene(n_points=800, width=W, height=H)
    config = ORBConfig(n_features=1000)
    ex = ORBExtractor(config)
    consts = ex.pyramid_consts((H, W))
    lut = consts[2]
    shp = tuple(pyramid_shapes(H, W, config.n_levels, config.scale_factor))
    quotas = tuple(config.level_quotas())

    poses = lateral_trajectory(16, step=0.01)
    imgs16 = jnp.asarray(np.stack(
        [np.asarray(scene.render_image(poses[i])) for i in range(16)]
    )).astype(jnp.float32)

    def detect(img):
        stack, _ = build_pyramid_stack(img, config.n_levels,
                                       config.scale_factor, consts=consts)
        score = fast_score_nms_packed(stack, shp, BH=64, BW=256, tree=True,
                                      border=config.edge_threshold)
        xy_l, _, v = select_from_scores(score, jnp.ones_like(score, bool),
                                        shp, quotas)
        return stack, xy_l, v

    # pre-detect on one frame for the agreement check
    stack0, xy0, v0 = jax.jit(detect)(imgs16[0])

    def fused(img, mode):
        stack, xy_l, _ = detect(img)
        return angles_desc_fused(stack, xy_l, shp, lut, 30, quotas=quotas,
                                 patch_mode=mode)[1]

    def slope(name, fn):
        def outer(imgs):
            def body(c, img):
                return c, fn(img)
            _, out = jax.lax.scan(body, 0, imgs)
            return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)),
                                out)
        f = jax.jit(outer)
        jax.tree.map(float, f(imgs16[:4]))
        jax.tree.map(float, f(imgs16))
        ts4, ts16 = [], []
        for k in range(3):
            t0 = time.perf_counter()
            jax.tree.map(float, f(imgs16[:4] + (k + 1) * 1e-3))
            ts4.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.tree.map(float, f(imgs16 + (k + 1) * 1e-3))
            ts16.append(time.perf_counter() - t0)
        dt = (min(ts16) - min(ts4)) / 12 * 1e3
        print(f"{name:20s} {dt:7.3f} ms/frame (device, detect incl.)",
              file=sys.stderr)
        return dt

    res = {}
    descs = {}
    for mode in ("rowfirst", "colfirst", "colfirst-int8"):
        res[mode + "_ms"] = round(slope(mode, lambda im, m=mode:
                                        fused(im, m)), 3)
        d = angles_desc_fused(stack0, xy0, shp, lut, 30, quotas=quotas,
                              patch_mode=mode)[1]
        descs[mode] = d

    ref = np.asarray(descs["rowfirst"]).reshape(-1, 32)
    vmask = np.asarray(v0).reshape(-1)
    for mode in ("colfirst", "colfirst-int8"):
        d = np.asarray(descs[mode]).reshape(-1, 32)
        hd = np.unpackbits(np.bitwise_xor(ref, d), axis=1).sum(1)[vmask]
        res[mode + "_mean_hamming_vs_rowfirst"] = round(float(hd.mean()), 3)
        res[mode + "_p99_hamming_vs_rowfirst"] = round(
            float(np.percentile(hd, 99)), 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
