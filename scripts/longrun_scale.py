"""Scale-regime long run (VERDICT r2 #7): a session at max_keyframes=1024
with the compact-BA default (max_ba_cams=80, the reference's local-map
bound, Tracking.cc:814-816) that grows the map past 384 keyframes — the
threshold where essential-graph optimization switches from the dense
solver to matrix-free PCG (pipeline/loop_closing.py) — and closes a loop
there, while recording per-keyframe mapper integration time vs map size.

The claim under test is the reference's own scaling property: LocalMapping
cost must NOT grow with the global map (its local BA touches a bounded
covisible neighborhood, Optimizer.cc:287-536); here that bound is the
compact Schur camera space + fixed-shape kernels. Oracle features (no
extraction) keep a 1-CPU host run tractable; every mapper kernel is the
production path.

Writes LONGRUN_r03.json: per-quartile mean mapper seconds, KF/point
counts, loop + CG evidence, flatness verdict.

Usage: python scripts/longrun_scale.py [--out LONGRUN_r03.json]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import sys
import time

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="LONGRUN_r03.json")
    ap.add_argument("--frames", type=int, default=1600)
    # Compressed-schedule knobs (same per-keyframe angular spacing as the
    # stock 1600-frame schedule, fewer tracking frames between keyframes):
    # crossing >384 LIVE keyframes before the 360-deg wrap is what puts the
    # wrap's loop closure in the CG essential-graph regime.
    ap.add_argument("--kf-every", type=int, default=0,
                    help="force a keyframe every N frames (0 = stock 2..4)")
    ap.add_argument("--total-angle", type=float, default=0.0,
                    help="total ring angle in deg (0 = stock 385*n/1600)")
    ap.add_argument("--max-keyframes", type=int, default=1024)
    ap.add_argument("--max-points", type=int, default=32768)
    # Per-frame cost knobs for bounded-wall-time sessions (1-CPU host):
    # these bound LOCAL work only (tracking pool / BA window / neighbor
    # fan-out) — exactly the quantities the reference also bounds
    # (Tracking.cc:814-816 local map, Optimizer.cc:287-338 local BA) —
    # so shrinking them does not weaken the flat-vs-map-size claim.
    ap.add_argument("--p-local", type=int, default=4096)
    ap.add_argument("--ba-window", type=int, default=8)
    ap.add_argument("--tri-neighbors", type=int, default=6)
    ap.add_argument("--fuse-neighbors", type=int, default=6)
    ap.add_argument("--n-features", type=int, default=320)
    args = ap.parse_args()

    from orb_slam_tpu.io.synthetic import SyntheticScene, ring_trajectory
    from orb_slam_tpu.io.trajectory import ate_rmse, camera_centers_from_cw
    from orb_slam_tpu.geometry import CameraModel
    from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig
    from orb_slam_tpu.slam_map import MapConfig

    n = args.frames
    # LARGE-radius ring (the NewCollege-style scale regime): wall radius
    # ~100 m, orbit radius 95.4 m -> viewing depth ~4.6 m, so the visible
    # arc of the world is only ~3.4 deg and consecutive keyframes
    # decorrelate fast. Each world point is seen by ~3.5 keyframes — right
    # at the reference's 90%-redundancy cull boundary (LocalMapping.cc:
    # 524-578) — so live keyframes GROW with trajectory length instead of
    # saturating at the ~100 a small dwell-ring retains (a small ring's
    # whole world fits a few dozen non-redundant views; km-scale
    # trajectories are what the essential graph exists for,
    # Optimizer.cc:540-789). ~0.24 deg/frame, keyframe every ~4 frames
    # -> ~400 live KFs by the 360-deg wrap, where an ORGANIC loop closure
    # must fire in the >384-KF regime.
    scene = SyntheticScene(n_points=16000, seed=91, ring=True,
                           depth_range=(99.0, 101.5), extent=(0, 2.0, 0),
                           width=640, height=480)
    # constant 0.24 deg/frame regardless of --frames (short probe runs
    # keep the production angular rate and KF density)
    total_angle = args.total_angle if args.total_angle > 0 \
        else 385.0 * n / 1600.0
    poses = ring_trajectory(n, orbit_radius=95.4,
                            total_angle=np.deg2rad(total_angle))

    kf_min = args.kf_every if args.kf_every > 0 else 2
    kf_max = args.kf_every if args.kf_every > 0 else 4
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        orb=None,  # oracle features
        map=MapConfig(max_keyframes=args.max_keyframes,
                      max_points=args.max_points,
                      n_features=args.n_features),
        p_local=args.p_local,
        n_triangulation_neighbors=args.tri_neighbors,
        n_fuse_neighbors=args.fuse_neighbors,
        n_fuse_second_neighbors=2, local_ba_window=args.ba_window,
        min_frames_between_kf=kf_min, max_frames_between_kf=kf_max,
        kf_tracked_ratio=1.5,  # force regular keyframes (dwell regime)
        enable_loop_closing=True, enable_relocalisation=False,
        min_init_matches=60,
    )
    assert cfg.max_ba_cams == 80, "compact-BA default regressed"
    system = SLAMSystem(cfg)

    mapper_times = []   # (n_kf_at_step, seconds)
    loop_events = []    # (frame, live KFs at closure)
    est = {}
    t_start = time.time()
    prev_kf = 0
    prev_loops = 0

    def snapshot(frames_done):
        """Aggregate stats over the frames processed so far and write the
        artifact — called every 100 frames so a host restart mid-run still
        leaves the last checkpoint on disk."""
        secs = np.array([s for _, s in mapper_times])
        # drop compile-dominated warmup: first 10 integrations
        sec_c = secs[10:]
        # wall-clock samples on a shared 1-core host can absorb external
        # scheduler stalls (observed: a SIGSTOP'd probe inflated one
        # sample 60x); drop >20x-median outliers and RECORD the count —
        # the flatness claim is about mapper work, not host suspensions
        n_outliers = 0
        if len(sec_c) >= 8:
            med = float(np.median(sec_c))
            n_outliers = int((sec_c > 20 * med).sum())
            sec_c = sec_c[sec_c <= 20 * med]
        if len(sec_c) >= 8:
            qs = np.array_split(np.arange(len(sec_c)), 4)
            quartiles = [round(float(sec_c[q].mean()), 3) for q in qs]
            flat = quartiles[3] < 2.0 * quartiles[0]
        else:
            quartiles, flat = [], True
        ids = sorted(est.keys())
        C_est = camera_centers_from_cw(np.stack([est[i] for i in ids]))
        C_gt = camera_centers_from_cw(poses[ids])
        rmse, _ = ate_rmse(C_est, C_gt)
        traj_len = float(np.sum(np.linalg.norm(np.diff(C_gt, axis=0),
                                               axis=1)))
        out = {
            "metric": "mapper_integration_time_vs_map_size",
            "n_frames": frames_done,
            "n_frames_planned": n,
            "partial": frames_done < n,
            "n_keyframes_final": int(system.n_keyframes),
            "n_points_final": int(system.n_points),
            "loops_closed": int(system.n_loops_closed),
            # (frame, live keyframes) at each closure: the essential-graph
            # solver is CG at this capacity (loop_closing.py dense<=384
            # cap); a closure with >384 LIVE keyframes is the scale-regime
            # evidence
            "loop_events_kf": [[int(f), int(k)] for f, k in loop_events],
            "cg_regime": bool(system.n_keyframes > 384),
            "mapper_s_per_kf_quartiles": quartiles,
            "flat_scaling": bool(flat),
            "host_stall_outliers_dropped": n_outliers,
            "ate_rmse": round(float(rmse), 3),
            "trajectory_length": round(traj_len, 2),
            "ate_over_length_pct": round(100.0 * rmse / traj_len, 2),
            "wall_s": round(time.time() - t_start, 1),
            "config": {"max_keyframes": args.max_keyframes,
                       "max_points": args.max_points,
                       "max_ba_cams": cfg.max_ba_cams,
                       "kf_every": args.kf_every or "2..4",
                       "total_angle_deg": round(total_angle, 1),
                       "p_local": args.p_local,
                       "local_ba_window": args.ba_window,
                       "tri_neighbors": args.tri_neighbors,
                       "fuse_neighbors": args.fuse_neighbors,
                       "n_features": args.n_features,
                       "oracle_features": True},
        }
        tmp_path = args.out + ".tmp"
        with open(tmp_path, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp_path, args.out)
        return out, flat

    for i in range(n):
        feats = scene.observe(poses[i], n_slots=320, pix_noise=0.4,
                              desc_bit_noise=5)
        t0 = time.time()
        T = system.process(features=feats)
        dt = time.time() - t0
        nk = system.n_keyframes
        if nk > prev_kf:  # this frame triggered a keyframe integration
            mapper_times.append((nk, dt))
            prev_kf = nk
        if system.n_loops_closed > prev_loops:
            loop_events.append((i, nk))
            prev_loops = system.n_loops_closed
        if T is not None:
            est[i] = T
        if i % 100 == 0:
            print(f"\rframe {i}/{n} kf={nk} pts={system.n_points} "
                  f"loops={system.n_loops_closed} "
                  f"({time.time()-t_start:.0f}s)", end="", file=sys.stderr)
            if i > 0:
                snapshot(i)
    print(file=sys.stderr)

    out, flat = snapshot(n)
    print(json.dumps(out), file=sys.stderr)
    if not flat:
        raise SystemExit("mapper time grew with map size")


if __name__ == "__main__":
    main()
