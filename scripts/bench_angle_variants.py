"""Device A/B: IC-angle patch extraction output dtype (bf16 vs f32 strips).

Scan-slope method (see scripts/profile_device.py). One process so variants
share tunnel conditions."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.ops.fast_stack import (
        build_pyramid_stack, select_from_scores,
    )
    from orb_slam_tpu.ops.pallas_fast import fast_score_nms_packed
    from orb_slam_tpu.ops.image import pyramid_shapes
    from orb_slam_tpu.ops.orb_descriptor import _WX, _WY, PATCH

    W, H = 640, 480
    scene = SyntheticScene(n_points=800, width=W, height=H)
    poses = lateral_trajectory(16, step=0.01)
    imgs16 = jnp.asarray(np.stack(
        [np.asarray(scene.render_image(poses[i])) for i in range(16)]
    )).astype(jnp.float32)
    config = ORBConfig(n_features=1000)
    ex = ORBExtractor(config)
    consts = ex.pyramid_consts((H, W))
    shp = tuple(pyramid_shapes(H, W, config.n_levels, config.scale_factor))
    quotas = tuple(config.level_quotas())

    def detected(img):
        s = build_pyramid_stack(img, config.n_levels, config.scale_factor,
                                consts=consts)[0]
        score, keep = fast_score_nms_packed(s, shp, BH=48, BW=256, tree=True)
        xy_l, _, _ = select_from_scores(score, keep, shp, quotas)
        return s, xy_l

    def patches_dtype(stack, xy_l, size, acc_dtype):
        Lv, Hc, Wc = stack.shape
        half = size // 2
        offs = jnp.arange(size, dtype=jnp.int32) - half
        hs = jnp.asarray([h for h, w in shp], jnp.int32)[:, None, None]
        ws = jnp.asarray([w for h, w in shp], jnp.int32)[:, None, None]
        rows = jnp.clip(xy_l[:, :, 1:2] + offs[None, None, :], 0, hs - 1)
        cols = jnp.clip(xy_l[:, :, 0:1] + offs[None, None, :], 0, ws - 1)
        row_oh = jax.nn.one_hot(rows, Hc, dtype=jnp.bfloat16)
        col_oh = jax.nn.one_hot(cols, Wc, dtype=jnp.bfloat16)
        strips = jnp.einsum("lqrh,lhw->lqrw", row_oh,
                            stack.astype(jnp.bfloat16),
                            preferred_element_type=acc_dtype)
        return jnp.einsum("lqrw,lqcw->lqrc", strips.astype(jnp.bfloat16),
                          col_oh, preferred_element_type=acc_dtype)

    def angles(img, acc_dtype, wdt):
        s, xy_l = detected(img)
        p = patches_dtype(s, xy_l, PATCH, acc_dtype)
        wx = jnp.asarray(_WX, wdt)
        wy = jnp.asarray(_WY, wdt)
        m10 = jnp.einsum("lqij,ij->lq", p.astype(wdt), wx,
                         preferred_element_type=jnp.float32)
        m01 = jnp.einsum("lqij,ij->lq", p.astype(wdt), wy,
                         preferred_element_type=jnp.float32)
        return jnp.arctan2(m01, m10)

    def slope(name, fn):
        def outer(imgs):
            def body(c, img):
                return c, fn(img)
            _, out = jax.lax.scan(body, 0, imgs)
            return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
        f = jax.jit(outer)
        float(f(imgs16[:4]))
        float(f(imgs16))
        t4 = t16 = 1e9
        for k in range(4):
            t0 = time.perf_counter()
            float(f(imgs16[:4] + (k + 1) * 1e-3))
            t4 = min(t4, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f(imgs16 + (k + 1) * 1e-3))
            t16 = min(t16, time.perf_counter() - t0)
        dt = (t16 - t4) / 12 * 1e3
        print(f"{name:44s} {dt:7.3f} ms/frame (device)", flush=True)

    slope("detect only", lambda im: detected(im)[1])
    slope("angles bf16-acc bf16-moment",
          lambda im: angles(im, jnp.bfloat16, jnp.bfloat16))
    slope("angles f32-acc f32-moment",
          lambda im: angles(im, jnp.float32, jnp.float32))
    slope("angles f32-acc bf16-moment",
          lambda im: angles(im, jnp.float32, jnp.bfloat16))


if __name__ == "__main__":
    main()
