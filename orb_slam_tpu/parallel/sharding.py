"""Sharded SLAM kernels over a jax.sharding.Mesh.

Design (scaling-book recipe): pick a mesh, annotate shardings with
PartitionSpec, express the computation per-shard with shard_map, let psum /
all_gather ride the ICI. The collectives here:
  * BA normal equations: each 'data' shard owns a block of points/edges,
    computes partial camera-system blocks, psum('data') replicates the
    reduced system, every chip solves the small dense system redundantly
    (cheaper than gather-scatter at this size), point updates stay local.
  * Dense Hamming matching: candidate rows sharded over 'data', feature
    columns over 'model'; per-shard argmin + all_gather('model') merge.
  * RANSAC: hypotheses sharded over 'data'; argmax of inlier counts via
    all_gather."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from orb_slam_tpu.solvers.local_ba import _solve_iteration


def make_mesh(n_devices: int | None = None, model_axis: int | None = None):
    """1- or 2-axis mesh ('data', 'model') over available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh: requested {n} devices but only {len(devs)} "
            f"available on platform {devs[0].platform!r}; provision virtual "
            f"devices (xla_force_host_platform_device_count) before jax "
            f"backend init, as tests/conftest.py does")
    devs = devs[:n]
    if model_axis is None:
        model_axis = 2 if n % 2 == 0 and n >= 4 else 1
    data_axis = n // model_axis
    arr = np.array(devs[: data_axis * model_axis]).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


# --------------------------------------------------------------------- BA

def sharded_ba_step(mesh: Mesh, n_cams: int, damping: float = 1e-3):
    """Build a jitted sharded BA Gauss-Newton step over raw edge arrays
    (a thin shard_map wrapper around the production solver iteration,
    solvers.local_ba._solve_iteration — one psum reduces the camera
    system; the full adaptive-LM loop is bundle_adjust(mesh=...)).

    Array layout: kf_pose [K,4,4] replicated; pt_pos [P,3], edge_kf [P,O],
    edge_uv [P,O,2], edge_w [P,O], pt_opt [P] sharded over 'data' on axis 0;
    cam_opt [K] replicated. Returns step(kf_pose, pt_pos, ...) -> (new
    kf_pose replicated, new pt_pos sharded)."""

    def local_step(kf_pose, pt_pos, edge_kf, edge_uv, edge_w, cam_opt,
                   pt_opt, K_mat):
        return _solve_iteration(
            kf_pose, pt_pos, edge_w, edge_kf, edge_uv, K_mat,
            cam_opt, pt_opt, damping, axis_name="data")

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(), P("data"), P("data"), P("data"), P("data"), P(), P("data"), P(),
        ),
        out_specs=(P(), P("data")),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------- matching

def sharded_hamming_argmin(mesh: Mesh):
    """Dense Hamming matching with the [Pl, N] matrix sharded over both mesh
    axes: rows ('data') x cols ('model'); per-shard argmin then
    all_gather('model') merge. Returns jitted fn(desc_p [P,8], desc_f [N,8])
    -> (best_idx [P], best_dist [P])."""

    def local(desc_p, desc_f):
        # desc_p: [P/data, 8]; desc_f: [N/model, 8]
        x = desc_p[:, None, :] ^ desc_f[None, :, :]
        d = jnp.sum(jax.lax.population_count(x), -1).astype(jnp.int32)
        loc_best = jnp.argmin(d, 1).astype(jnp.int32)
        loc_dist = jnp.take_along_axis(d, loc_best[:, None], 1)[:, 0]
        n_local = desc_f.shape[0]
        my_col = jax.lax.axis_index("model")
        glob_idx = loc_best + my_col * n_local
        all_dist = jax.lax.all_gather(loc_dist, "model", axis=1)   # [P/d, M]
        all_idx = jax.lax.all_gather(glob_idx, "model", axis=1)
        which = jnp.argmin(all_dist, 1)
        best = jnp.take_along_axis(all_idx, which[:, None], 1)[:, 0]
        dist = jnp.take_along_axis(all_dist, which[:, None], 1)[:, 0]
        return best, dist

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("model")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(sharded)


# ------------------------------------------------------------------ RANSAC

def sharded_ransac_best(mesh: Mesh):
    """Hypothesis fan-out sharded over 'data': each shard scores its
    hypotheses locally (here: count inliers of precomputed residuals),
    global best via all_gather. fn(scores [H]) -> (best_score, best_idx)."""

    def local(scores):
        h_local = scores.shape[0]
        loc_best = jnp.argmax(scores)
        my_row = jax.lax.axis_index("data")
        glob_idx = loc_best + my_row * h_local
        all_s = jax.lax.all_gather(scores[loc_best], "data")  # [D]
        all_i = jax.lax.all_gather(glob_idx, "data")
        w = jnp.argmax(all_s)
        return all_s[w], all_i[w]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P("data"),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
