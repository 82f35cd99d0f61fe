"""OBS_CAP study (VERDICT r1: "Lift OBS_CAP honestly").

Runs the same long oracle sequence at observation caps {8, 16, 32, 64} and
reports trajectory ATE, mean active BA edges per point, and the fraction of
observations dropped by the cap. Results recorded in PERF.md.

Usage: SLAM_OBS_CAP must be set BEFORE import (module-level constant), so
this script re-execs itself per cap value.
"""

import json
import os
import subprocess
import sys

CAPS = (8, 16, 32, 64)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one():
    sys.path.insert(0, REPO)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig
    from orb_slam_tpu.slam_map import MapConfig
    from orb_slam_tpu.slam_map.observations import (
        OBS_CAP, flatten_observations, observation_table,
    )
    from orb_slam_tpu.geometry import CameraModel, horn_sim3

    # A ring scene keeps the same landmarks in view across the whole run;
    # a keyframe is forced every 2 frames and culling is disabled, so
    # long-lived points accumulate ~n_keyframes observations and the cap
    # actually binds (a lateral pass creates ~5 KFs and never exercises it).
    from orb_slam_tpu.io.synthetic import ring_trajectory
    n_frames, n_slots = 120, 200
    scene = SyntheticScene(n_points=800, seed=5, width=320, height=240,
                           fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                           ring=True, depth_range=(10.0, 13.0),
                           extent=(0, 3.0, 0))
    poses = ring_trajectory(n_frames, orbit_radius=4.0,
                            total_angle=2.0 * np.pi * n_frames / 240.0)
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=scene.width, height=scene.height),
        map=MapConfig(max_keyframes=80, max_points=4096, n_features=n_slots),
        p_local=1024, enable_loop_closing=False,
        enable_relocalisation=False,
        max_frames_between_kf=2, kf_cull_redundancy=1.01,
        kf_tracked_ratio=2.0)  # c2 always true -> KF every 2 frames
    cfg.orb = None
    s = SLAMSystem.__new__(SLAMSystem)
    s.cfg = cfg
    s.extractor = None
    s.K = scene.K
    s.K_dev = jnp.asarray(scene.K)
    s.reset()
    est = {}
    for i in range(n_frames):
        T = s.process(features=scene.observe(poses[i], n_slots=n_slots))
        if T is not None:
            est[i] = T

    ids = sorted(est.keys())
    T_est = np.stack([est[i] for i in ids])
    T_gt = poses[ids]

    def centers(T):
        R, t = T[:, :3, :3], T[:, :3, 3]
        return -np.einsum("kij,kj->ki", R.transpose(0, 2, 1), t)

    C_est, C_gt = centers(T_est), centers(T_gt)
    sc, R, t = horn_sim3(jnp.asarray(C_gt), jnp.asarray(C_est))
    C_al = float(sc) * C_est @ np.asarray(R).T + np.asarray(t)
    ate = float(np.sqrt(np.mean(np.sum((C_al - C_gt) ** 2, axis=1))))

    # cap coverage: observations represented in the table vs total
    pid, _, _, valid = flatten_observations(s.map)
    total_obs = int(np.asarray(jnp.sum(valid)))
    _, _, obs_valid = observation_table(s.map)
    kept = int(np.asarray(jnp.sum(obs_valid)))
    counts = np.bincount(np.asarray(pid)[np.asarray(valid)],
                         minlength=cfg.map.max_points)
    print(json.dumps({
        "cap": OBS_CAP, "ate": round(ate, 5), "kf": s.n_keyframes,
        "points": s.n_points, "total_obs": total_obs, "ba_edges": kept,
        "dropped_frac": round(1 - kept / max(total_obs, 1), 4),
        "max_obs_per_point": int(counts.max()),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one()
    else:
        for cap in CAPS:
            env = dict(os.environ)
            env["SLAM_OBS_CAP"] = str(cap)
            env["JAX_PLATFORMS"] = "cpu"
            subprocess.run([sys.executable, __file__, "--one"], env=env,
                           check=True)
