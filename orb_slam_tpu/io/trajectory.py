"""Trajectory output (TUM format) + ATE / RPE evaluation.

The reference writes KeyFrameTrajectory.txt at shutdown in TUM format
`timestamp tx ty tz qx qy qz qw` (src/main.cc:160-185) and the paper's
evaluation protocol is ATE RMSE against ground truth (SURVEY.md §4). Both
the writer and the evaluator live here."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.geometry import se3_inverse, rot_to_quat, horn_sim3


def write_tum(path: str, rows, fps: float = 30.0):
    """rows: iterable of (frame_id, t_wc [3], q_xyzw [4]) — as returned by
    SLAMSystem.keyframe_trajectory()."""
    with open(path, "w") as f:
        for fid, t, q in rows:
            ts = fid / fps
            f.write(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def read_tum(path: str):
    """Returns (timestamps [N], positions [N,3], quaternions [N,4])."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    return data[:, 0], data[:, 1:4], data[:, 4:8]


def camera_centers_from_cw(T_cw):
    """[N,4,4] world->cam -> [N,3] camera centers."""
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    return -np.einsum("nij,ni->nj", R, t)


def ate_rmse(est_centers, gt_centers, with_scale=True):
    """Absolute trajectory error after Sim3 (or SE3) alignment — the
    standard monocular evaluation (scale is unobservable). Returns
    (rmse, aligned_est)."""
    s, R, t = horn_sim3(
        jnp.asarray(gt_centers.astype(np.float32)),
        jnp.asarray(est_centers.astype(np.float32)),
        fix_scale=not with_scale,
    )
    aligned = float(s) * est_centers @ np.asarray(R).T + np.asarray(t)
    err = aligned - gt_centers
    return float(np.sqrt(np.mean(np.sum(err * err, axis=1)))), aligned


def rpe(est_centers, gt_centers, delta: int = 1):
    """Relative pose (translation drift) error over `delta`-frame intervals."""
    de = est_centers[delta:] - est_centers[:-delta]
    dg = gt_centers[delta:] - gt_centers[:-delta]
    # per-interval scale-free comparison
    err = np.linalg.norm(de - dg, axis=1)
    return float(np.sqrt(np.mean(err * err)))
