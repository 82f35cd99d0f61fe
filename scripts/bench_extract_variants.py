"""Device A/B of extractor patch-gather strategies (scan-slope method,
see scripts/profile_device.py for the methodology). ONE process so the
variants share the tunnel conditions.

Variants of the orientation/descriptor patch stage (the current dominant
cost of the frame hot path, PERF.md round 3):
  onehot    — row + column one-hot matmuls (round-2 design)
  rowgather — dynamic row gather + column one-hot matmul

Usage: python scripts/bench_extract_variants.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time
from dataclasses import replace

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from orb_slam_tpu.frontend.orb_extractor import (
        ORBConfig, ORBExtractor, _extract_stacked,
    )
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory

    W, H = 640, 480
    scene = SyntheticScene(n_points=800, width=W, height=H)
    poses = lateral_trajectory(16, step=0.01)
    imgs16 = jnp.asarray(np.stack(
        [np.asarray(scene.render_image(poses[i])) for i in range(16)]
    )).astype(jnp.float32)

    def slope(name, fn, consts):
        def outer(imgs, c):
            def body(carry, img):
                return carry, fn(img, c)
            _, out = jax.lax.scan(body, 0, imgs)
            return jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32)), out)
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

    results = {}
    for method in ("onehot", "rowgather"):
        cfg = ORBConfig(n_features=1000, patch_method=method)
        ex = ORBExtractor(cfg)
        consts = ex.pyramid_consts((H, W))
        results[method] = slope(
            f"full extract ({method})",
            lambda img, c, cfg=cfg, ex=ex: _extract_stacked(
                img, c, config=cfg, use_pallas=ex.use_pallas).desc_u32,
            consts)

    # identity check: both variants must produce identical descriptors
    cfg_a = ORBConfig(n_features=1000, patch_method="onehot")
    cfg_b = replace(cfg_a, patch_method="rowgather")
    ex = ORBExtractor(cfg_a)
    consts = ex.pyramid_consts((H, W))
    fa = _extract_stacked(imgs16[0], consts, config=cfg_a,
                          use_pallas=ex.use_pallas)
    fb = _extract_stacked(imgs16[0], consts, config=cfg_b,
                          use_pallas=ex.use_pallas)
    same = (np.asarray(fa.desc_u32) == np.asarray(fb.desc_u32))[
        np.asarray(fa.valid)].mean()
    ang = np.abs(np.asarray(fa.angle) - np.asarray(fb.angle))[
        np.asarray(fa.valid)].max()
    print(f"descriptor identity: {100*same:.2f}% equal words, "
          f"max |angle delta| {ang:.2e}", file=sys.stderr)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
