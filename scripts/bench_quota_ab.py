"""A/B: cost of the reference's starved-cell quota redistribution in the
per-frame program (VERDICT r4 #3a).

Compares the production cell-select tail (`_select_from_masked`, which
runs the batched `reference_quota` while_loop + per-cell retain mask)
against a flat fair-share variant (the pre-round-4 behavior: every cell
capped at ceil(quota/n_cells), no redistribution) via the scan-slope
method, plus the full extraction program both ways.

Usage: python scripts/bench_quota_ab.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.ops.image import pyramid_shapes
    from orb_slam_tpu.ops.fast_stack import (
        build_pyramid_stack, _select_from_masked,
    )
    from orb_slam_tpu.ops.pallas_fast import fast_score_nms_packed

    W, H = 640, 480
    scene = SyntheticScene(n_points=800, width=W, height=H)
    config = ORBConfig(n_features=1000)
    ex = ORBExtractor(config)
    consts = ex.pyramid_consts((H, W))
    shp = tuple(pyramid_shapes(H, W, config.n_levels, config.scale_factor))
    quotas = tuple(config.level_quotas())

    poses = lateral_trajectory(8, step=0.01)
    img = jnp.asarray(np.asarray(scene.render_image(poses[0])))
    stack, _ = build_pyramid_stack(img, config.n_levels, config.scale_factor,
                                   consts=consts)
    base = fast_score_nms_packed(stack, shp, BH=64, BW=256, tree=True,
                                 border=config.edge_threshold)
    jax.block_until_ready(base)

    import orb_slam_tpu.ops.fast as fast_mod

    real_quota = fast_mod.reference_quota

    def flat_quota(avail, max_kp, active=None):
        """Pre-round-4 flat fair share: min(avail, ceil(max_kp/n))."""
        n_cells_static = avail.shape[0]
        if active is None:
            active = jnp.ones((n_cells_static,), bool)
        max_kp = jnp.asarray(max_kp, jnp.int32)
        n = jnp.sum(active).astype(jnp.int32)
        fair = (-(-max_kp // jnp.maximum(n, 1))).astype(jnp.int32)
        return jnp.where(active, jnp.broadcast_to(fair, avail.shape), 0)

    def slope(fn, n_lo=4, n_hi=16):
        @jax.jit
        def f(xs):
            def body(c, dx):
                out = fn(dx)
                s = sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree.leaves(out))
                return c + s, None
            return jax.lax.scan(body, 0.0, xs)[0]

        float(f(jnp.linspace(0.0, 1e-5, n_lo)))
        float(f(jnp.linspace(0.0, 1e-5, n_hi)))
        ts = []
        for n in (n_lo, n_hi):
            best = 1e9
            for k in range(3):
                xs = jnp.linspace((k + 1) * 1e-6, 1e-5, n)
                t0 = time.perf_counter()
                float(f(xs))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / (n_hi - n_lo) * 1e3

    # the undecorated body: _select_from_masked is jitted with static
    # args, so a monkeypatched reference_quota would never retrace through
    # the cached entry — trace the raw function inside slope's own jit
    raw_select = _select_from_masked.__wrapped__

    def select(dx):
        return raw_select(base + dx, shp, quotas,
                          th_ini=config.fast_th_ini,
                          th_min=config.fast_th_min,
                          cell_size=config.cell_size,
                          border=config.edge_threshold)

    ms_ref = slope(select)
    print(f"select tail, reference_quota: {ms_ref:.3f} ms/frame",
          file=sys.stderr)

    fast_mod.reference_quota = flat_quota
    try:
        ms_flat = slope(select)
    finally:
        fast_mod.reference_quota = real_quota
    print(f"select tail, flat fair share: {ms_flat:.3f} ms/frame",
          file=sys.stderr)

    print(json.dumps({
        "metric": "cell_select_ms_per_frame",
        "reference_quota_ms": round(ms_ref, 3),
        "flat_fair_share_ms": round(ms_flat, 3),
        "redistribution_cost_ms": round(ms_ref - ms_flat, 3),
    }))


if __name__ == "__main__":
    main()
