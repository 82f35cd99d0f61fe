"""Whole-system real-time evidence: sustained tracking fps WHILE the
mapper and loop-closing threads run live (VERDICT r4 missing #3).

The reference's 30 fps claim is tracking at frame rate with LocalMapping
and LoopClosing running concurrently (src/main.cc:123-133,
LocalMapping.cc:46-106). bench.py measures the tracking hot loop alone and
bench_full_pipeline.py runs the mapper INLINE (sequential); this script
runs AsyncSLAMSystem — mapper + loop threads live, keyframe queue,
InterruptBA, backpressure — over a rendered ring sequence and reports
end-to-end wall fps of the tracking thread plus mapper/loop activity.

Usage: python scripts/bench_async_pipeline.py [n_frames] [--out FILE.json]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_frames", type=int, nargs="?", default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from orb_slam_tpu.io.synthetic import SyntheticScene, ring_trajectory
    from orb_slam_tpu.pipeline.async_system import AsyncSLAMSystem
    from orb_slam_tpu.pipeline.system import SlamConfig
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig
    from orb_slam_tpu.slam_map import MapConfig
    from orb_slam_tpu.geometry import CameraModel

    N = args.n_frames
    W, H = 640, 480
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        scene = SyntheticScene(n_points=1200, seed=5, width=W, height=H,
                               fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                               ring=True, depth_range=(10.0, 13.0),
                               extent=(0, 3.0, 0))
        poses = ring_trajectory(N, orbit_radius=4.0,
                                total_angle=2.0 * np.pi * N / 240.0)
        print(f"rendering {N} frames...", file=sys.stderr)
        imgs = [np.asarray(scene.render_image(poses[i], patch=6))
                for i in range(N)]
    print("rendered.", file=sys.stderr)

    def make_cfg():
        return SlamConfig(
            camera=CameraModel.create(scene.fx, scene.fy, scene.cx,
                                      scene.cy, width=W, height=H),
            orb=ORBConfig(n_features=1000, n_levels=8),
            map=MapConfig(max_keyframes=128, max_points=16384,
                          n_features=1000),
            track_chunk_size=32, p_local=2048, min_init_matches=60,
            enable_loop_closing=True, enable_relocalisation=True)

    # one-off compile warm on a throwaway SEQUENTIAL system (same jitted
    # programs, persistent compile cache shared); keeps the timed async
    # run free of the remote-compile path
    from orb_slam_tpu.pipeline.system import SLAMSystem
    warm = SLAMSystem(make_cfg())
    t0 = time.perf_counter()
    for wi in range(0, 48, 8):
        warm.process_batch(imgs[wi:wi + 8])
        print(f"warm {wi + 8}/48 ({time.perf_counter()-t0:.0f}s, "
              f"state={warm.state})", file=sys.stderr, flush=True)
    del warm

    system = AsyncSLAMSystem(make_cfg())
    try:
        t0 = time.perf_counter()
        out = []
        for ci in range(0, N, 64):
            out.extend(system.process_batch(imgs[ci:ci + 64]))
            print(f"run {min(ci + 64, N)}/{N} "
                  f"({time.perf_counter()-t0:.0f}s, "
                  f"kf={int(np.asarray(system.map.kf_valid).sum())}, "
                  f"loops={system.n_loops_closed})",
                  file=sys.stderr, flush=True)
        track_wall = time.perf_counter() - t0   # tracking-thread wall
        system.finish()
        total_wall = time.perf_counter() - t0   # incl. mapper drain
    finally:
        system.close()

    tracked = sum(1 for p in out if p is not None)
    n_kf = int(np.asarray(system.map.kf_valid).sum())
    res = {
        "metric": "full_pipeline_async_fps",
        "value": round(N / track_wall, 2),
        "unit": "frames/sec (tracking thread, mapper+loop threads live)",
        "fps_incl_final_drain": round(N / total_wall, 2),
        "n_frames": N,
        "tracked": tracked,
        "keyframes": n_kf,
        "loops_closed": int(system.n_loops_closed),
        "backend": jax.default_backend(),
        "vs_baseline": round(N / track_wall / 30.0, 2),
    }
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
