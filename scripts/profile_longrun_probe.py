"""Probe: where does the longrun's PER-FRAME host time go as the map
grows? Runs the longrun configuration for N frames and prints per-100
tracking-only vs keyframe-integration seconds plus a cProfile top list
for the last 100 frames.

Usage: python scripts/profile_longrun_probe.py [frames]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import cProfile
import pstats
import sys
import time

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400

    from orb_slam_tpu.io.synthetic import SyntheticScene, ring_trajectory
    from orb_slam_tpu.geometry import CameraModel
    from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig
    from orb_slam_tpu.slam_map import MapConfig

    scene = SyntheticScene(n_points=16000, seed=91, ring=True,
                           depth_range=(99.0, 101.5), extent=(0, 2.0, 0),
                           width=640, height=480)
    poses = ring_trajectory(n, orbit_radius=95.4,
                            total_angle=np.deg2rad(385.0 * n / 1600.0))
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        orb=None,
        map=MapConfig(max_keyframes=1024, max_points=32768, n_features=320),
        p_local=4096, n_triangulation_neighbors=6, n_fuse_neighbors=6,
        n_fuse_second_neighbors=2, local_ba_window=8,
        min_frames_between_kf=2, max_frames_between_kf=4,
        kf_tracked_ratio=1.5,
        enable_loop_closing=True, enable_relocalisation=False,
        min_init_matches=60,
    )
    system = SLAMSystem(cfg)

    prof = None
    t_track, t_kf = 0.0, 0.0
    prev_kf = 0
    for i in range(n):
        feats = scene.observe(poses[i], n_slots=320, pix_noise=0.4,
                              desc_bit_noise=5)
        if i == n - 100:
            prof = cProfile.Profile()
            prof.enable()
        t0 = time.time()
        system.process(features=feats)
        dt = time.time() - t0
        if system.n_keyframes > prev_kf:
            t_kf += dt
            prev_kf = system.n_keyframes
        else:
            t_track += dt
        if (i + 1) % 100 == 0:
            print(f"frames {i-99}-{i}: track-only {t_track:.1f}s, "
                  f"kf-integration {t_kf:.1f}s, kf={system.n_keyframes}",
                  file=sys.stderr, flush=True)
            t_track, t_kf = 0.0, 0.0
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative")
    stats.print_stats(25)


if __name__ == "__main__":
    main()
