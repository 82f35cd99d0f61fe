"""Micro-benchmark: FAST score kernels on the real TPU (scan-slope).

Compares the rectangular-grid Pallas kernel + XLA NMS (fast_score_nms_pallas)
against the packed-grid fused score+NMS kernel (fast_score_nms_packed) at
several block sizes. Device ms/frame via the scan-slope method (run the
stage R times inside one program at two R values; dispatch cost cancels).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial
    from orb_slam_tpu.ops.fast_stack import build_pyramid_stack
    from orb_slam_tpu.ops.pallas_fast import (
        fast_score_nms_pallas, fast_score_nms_packed)

    H, W, L = 480, 640, 8
    rng = np.random.default_rng(0)
    stack0, shapes = build_pyramid_stack(
        jnp.zeros((H, W), jnp.float32), L, 1.2)
    shapes = tuple(shapes)
    R_LO, R_HI = 2, 10
    stacks = jnp.asarray(
        rng.integers(0, 255, (R_HI, L) + tuple(stack0.shape[1:]))
        .astype(np.float32))

    def slope(fn, tag):
        def body(c, s):
            sc, kp = fn(s)
            return c + jnp.sum(sc) + jnp.sum(kp), None

        @jax.jit
        def run_lo(xs):
            return jax.lax.scan(body, 0.0, xs[:R_LO])[0]

        @jax.jit
        def run_hi(xs):
            return jax.lax.scan(body, 0.0, xs)[0]

        float(run_lo(stacks))  # compile + warm
        float(run_hi(stacks))
        ts = []
        for run in (run_lo, run_hi):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(stacks))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        ms = (ts[1] - ts[0]) / (R_HI - R_LO) * 1e3
        print(f"{tag:36s} {ms:7.3f} ms/frame", file=sys.stderr)
        return ms

    for BH, BW in ((48, 256), (32, 256), (64, 256), (48, 128), (32, 128),
                   (24, 512), (48, 512), (40, 320)):
        slope(partial(fast_score_nms_packed, shapes=shapes, BH=BH, BW=BW,
                      tree=True),
              f"packed TREE      BH={BH} BW={BW}")


if __name__ == "__main__":
    main()
