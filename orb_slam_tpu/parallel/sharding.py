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

from orb_slam_tpu.geometry.se3 import se3_exp


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

def _edge_terms_flat(kf_pose, pt_pos, edge_kf, edge_uv, K_mat):
    """Per-edge residual/Jacobians; edges are (point-block local).
    pt_pos: [Pl, 3]; edge_kf: [Pl, O]; edge_uv: [Pl, O, 2]."""
    T = kf_pose[edge_kf]              # [Pl,O,4,4]
    fx, fy, cx, cy = K_mat[0, 0], K_mat[1, 1], K_mat[0, 2], K_mat[1, 2]
    pc = jnp.einsum("poij,pj->poi", T[..., :3, :3], pt_pos) + T[..., :3, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * x / zs + cx
    v = fy * y / zs + cy
    r = jnp.stack([u - edge_uv[..., 0], v - edge_uv[..., 1]], -1)
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(iz)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], -1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], -1)
    duv = jnp.stack([du, dv], -2)
    hat = jnp.stack(
        [jnp.stack([zero, -z, y], -1),
         jnp.stack([z, zero, -x], -1),
         jnp.stack([-y, x, zero], -1)], -2)
    I3 = jnp.broadcast_to(jnp.eye(3), hat.shape)
    Jc = duv @ jnp.concatenate([I3, -hat], -1)
    Jp = duv @ T[..., :3, :3]
    return r, Jc, Jp, z


def sharded_ba_step(mesh: Mesh, n_cams: int, damping: float = 1e-3):
    """Build a jitted sharded BA Gauss-Newton step.

    Array layout: kf_pose [K,4,4] replicated; pt_pos [P,3], edge_kf [P,O],
    edge_uv [P,O,2], edge_w [P,O], pt_opt [P] sharded over 'data' on axis 0;
    cam_opt [K] replicated. Returns step(kf_pose, pt_pos, ...) -> (new
    kf_pose replicated, new pt_pos sharded)."""
    Kk = n_cams

    def local_step(kf_pose, pt_pos, edge_kf, edge_uv, edge_w, cam_opt, pt_opt, K_mat):
        r, Jc, Jp, z = _edge_terms_flat(kf_pose, pt_pos, edge_kf, edge_uv, K_mat)
        w = edge_w * (z > 0)
        cam_is_opt = cam_opt[jnp.clip(edge_kf, 0, Kk - 1)]
        Jc = jnp.where(cam_is_opt[..., None, None], Jc, 0.0)
        wJc = Jc * w[..., None, None]
        wJp = Jp * w[..., None, None]

        Hpp = jnp.einsum("pokx,poky->pxy", wJp, Jp)
        bp = jnp.einsum("pokx,pok->px", wJp, r)
        Hpp = Hpp + damping * jnp.broadcast_to(jnp.eye(3), Hpp.shape)
        Hpp = jnp.where(pt_opt[:, None, None], Hpp,
                        jnp.broadcast_to(jnp.eye(3), Hpp.shape))
        bp = jnp.where(pt_opt[:, None], bp, 0.0)
        Hpp_inv = jnp.linalg.inv(Hpp)
        L = jnp.linalg.cholesky(
            0.5 * (Hpp_inv + jnp.swapaxes(Hpp_inv, -1, -2))
            + 1e-12 * jnp.broadcast_to(jnp.eye(3), Hpp.shape))
        L = jnp.where(jnp.isfinite(L), L, 0.0)

        kf_idx = jnp.where(w > 0, edge_kf, Kk)
        Hcc = jnp.zeros((Kk + 1, 6, 6)).at[kf_idx].add(
            jnp.einsum("pokx,poky->poxy", wJc, Jc))
        bc = jnp.zeros((Kk + 1, 6)).at[kf_idx].add(
            jnp.einsum("pokx,pok->pox", wJc, r))
        C = jnp.einsum("pokx,poky->poxy", wJc, Jp) * pt_opt[:, None, None, None]
        D = jnp.einsum("poxy,pyz->poxz", C, L)
        O = D.shape[1]
        S = jnp.zeros((Kk + 1, Kk + 1, 6, 6))
        for o2 in range(O):
            V = jnp.einsum("poxz,pyz->poxy", D, D[:, o2])
            cols = jnp.broadcast_to(kf_idx[:, o2:o2 + 1], kf_idx.shape)
            S = S.at[kf_idx, cols].add(-V)
        Hib = jnp.einsum("pxy,py->px", Hpp_inv, bp)
        bc = bc.at[kf_idx].add(-jnp.einsum("poxy,py->pox", C, Hib))

        # >>> the collective: reduce partial normal equations over 'data'
        Hcc = jax.lax.psum(Hcc, "data")
        S = jax.lax.psum(S, "data")
        bc = jax.lax.psum(bc, "data")

        H = S.at[jnp.arange(Kk + 1), jnp.arange(Kk + 1)].add(Hcc)[:Kk, :Kk]
        b = bc[:Kk]
        H = H.at[jnp.arange(Kk), jnp.arange(Kk)].add(
            jnp.where(cam_opt, damping, 0.0)[:, None, None] * jnp.eye(6)[None])
        fixed = ~cam_opt
        H = jnp.where(fixed[:, None, None, None], 0.0, H)
        H = jnp.where(fixed[None, :, None, None], 0.0, H)
        H = H.at[jnp.arange(Kk), jnp.arange(Kk)].add(
            fixed[:, None, None] * jnp.eye(6)[None])
        b = jnp.where(fixed[:, None], 0.0, b)
        dxc = jnp.linalg.solve(
            H.transpose(0, 2, 1, 3).reshape(Kk * 6, Kk * 6), -b.reshape(Kk * 6)
        ).reshape(Kk, 6)
        dxc = jnp.where(jnp.isfinite(dxc), dxc, 0.0)

        dxc_pad = jnp.concatenate([dxc, jnp.zeros((1, 6))], 0)
        Ct_dx = jnp.einsum("poxy,pox->py", C, dxc_pad[kf_idx])
        dxp = jnp.einsum("pxy,py->px", Hpp_inv, -bp - Ct_dx)
        dxp = jnp.where(jnp.isfinite(dxp), dxp, 0.0) * pt_opt[:, None]

        new_pose = jnp.where(
            cam_opt[:, None, None], jax.vmap(se3_exp)(dxc) @ kf_pose, kf_pose)
        return new_pose, pt_pos + dxp

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
