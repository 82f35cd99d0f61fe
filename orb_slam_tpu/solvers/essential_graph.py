"""Essential-graph (Sim3 pose graph) optimization.

Replaces Optimizer::OptimizeEssentialGraph (reference:
src/Optimizer.cc:540-789): after a loop closure, optimize all keyframe
poses as Sim(3) vertices over the sparsified graph (spanning tree +
covisibility >= 100 + loop edges + the new loop connections), with measured
relative Sim3 constraints; the loop keyframe is fixed, corrected keyframes
start from their loop-corrected Sim3.

TPU-first: vertices are a [K, 7] tangent update over base Sim3s; each GN
iteration builds residuals for a fixed padded edge list [E, 7] (relative
Sim3 log error) with jacfwd-through-the-edge Jacobians assembled into a
dense [7K, 7K] system — at the reference's own scale (hundreds of KFs) this
is a small dense Cholesky on the MXU, replacing g2o's sparse LM."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam_tpu.utils.dispatch import fused_jit
from orb_slam_tpu.geometry.sim3 import (
    sim3_exp, sim3_log, sim3_compose, sim3_inverse,
)


def _vertex(xi, base_s, base_R, base_t):
    ds, dR, dt = sim3_exp(xi)
    s = base_s * ds
    R = dR @ base_R
    t = ds[..., None] * jnp.einsum("...ij,...j->...i", dR, base_t) + dt
    return s, R, t


def _edge_residual(xi_i, xi_j, base_i, base_j, meas):
    """r = log( S_meas_ji^-1 * S_j * S_i^-1 ) in R^7  — the g2o EdgeSim3
    error (types_seven_dof_expmap.h:99)."""
    Si = _vertex(xi_i, *base_i)
    Sj = _vertex(xi_j, *base_j)
    # relative: S_ji = S_j * S_i^-1
    rel = sim3_compose(Sj, sim3_inverse(Si))
    err = sim3_compose(sim3_inverse(meas), rel)
    return sim3_log(err)


@partial(fused_jit, static_argnames=("iters",))
def optimize_essential_graph(
    base_s, base_R, base_t,     # [K], [K,3,3], [K,3] current vertex Sim3s
    edges_i, edges_j,           # [E] i32 endpoints
    meas_s, meas_R, meas_t,     # [E], [E,3,3], [E,3] measured S_ji
    edge_valid,                 # [E] bool
    fixed,                      # [K] bool (loop KF + invalid slots)
    iters: int = 20,
):
    """Returns optimized (s [K], R [K,3,3], t [K,3])."""
    K = base_s.shape[0]
    E = edges_i.shape[0]
    xi = jnp.zeros((K, 7))

    def one_edge_res(xi_all, e):
        i, j = edges_i[e], edges_j[e]
        return _edge_residual(
            xi_all[i], xi_all[j],
            (base_s[i], base_R[i], base_t[i]),
            (base_s[j], base_R[j], base_t[j]),
            (meas_s[e], meas_R[e], meas_t[e]),
        )

    def res_fn(xi_i, xi_j, e):
        i, j = edges_i[e], edges_j[e]
        return _edge_residual(
            xi_i, xi_j,
            (base_s[i], base_R[i], base_t[i]),
            (base_s[j], base_R[j], base_t[j]),
            (meas_s[e], meas_R[e], meas_t[e]),
        )

    def total_cost(xi):
        e_ids = jnp.arange(E)
        r = jax.vmap(one_edge_res, in_axes=(None, 0))(xi, e_ids)
        return jnp.sum(jnp.sum(r * r, -1) * edge_valid)

    def step(_, carry):
        # adaptive-lambda Levenberg-Marquardt (the reference uses g2o LM
        # with lambda_init=1e-16 for the essential graph, Optimizer.cc:553):
        # propose a step at lambda, accept only if the total squared
        # residual drops (lambda /= 2), else reject and stiffen (lambda *= 10)
        xi, lam = carry
        e_ids = jnp.arange(E)
        xi_i = xi[jnp.clip(edges_i, 0, K - 1)]
        xi_j = xi[jnp.clip(edges_j, 0, K - 1)]
        r = jax.vmap(res_fn)(xi_i, xi_j, e_ids)              # [E,7]
        Ji = jax.vmap(jax.jacfwd(res_fn, argnums=0))(xi_i, xi_j, e_ids)  # [E,7,7]
        Jj = jax.vmap(jax.jacfwd(res_fn, argnums=1))(xi_i, xi_j, e_ids)

        w = edge_valid.astype(jnp.float32)
        Ji = Ji * w[:, None, None]
        Jj = Jj * w[:, None, None]
        rw = r * w[:, None]

        # assemble dense block system
        H = jnp.zeros((K + 1, K + 1, 7, 7))
        b = jnp.zeros((K + 1, 7))
        ii = jnp.where(edge_valid, edges_i, K)
        jj = jnp.where(edge_valid, edges_j, K)
        H = H.at[ii, ii].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[jj, jj].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        H = H.at[ii, jj].add(jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[jj, ii].add(jnp.einsum("eki,ekj->eij", Jj, Ji))
        b = b.at[ii].add(jnp.einsum("eki,ek->ei", Ji, rw))
        b = b.at[jj].add(jnp.einsum("eki,ek->ei", Jj, rw))
        H = H[:K, :K]
        b = b[:K]

        H = H.at[jnp.arange(K), jnp.arange(K)].add(lam * jnp.eye(7)[None])
        # fixed vertices: identity rows
        H = jnp.where(fixed[:, None, None, None], 0.0, H)
        H = jnp.where(fixed[None, :, None, None], 0.0, H)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            fixed[:, None, None] * jnp.eye(7)[None]
        )
        b = jnp.where(fixed[:, None], 0.0, b)

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        bd = b.reshape(7 * K)
        dx = jnp.linalg.solve(Hd, -bd).reshape(K, 7)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * ~fixed[:, None]
        new_xi = xi + dx
        accept = total_cost(new_xi) < total_cost(xi)
        xi = jnp.where(accept, new_xi, xi)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0), 1e-16, 1e6)
        return (xi, lam)

    # lambda_init=1e-16 matches the reference's essential-graph setting
    # (Optimizer.cc:553): trust the Gauss-Newton step unless it misbehaves
    xi, _ = jax.lax.fori_loop(0, iters, step, (xi, jnp.float32(1e-16)))
    return _vertex(xi, base_s, base_R, base_t)


def relative_sim3(s_i, R_i, t_i, s_j, R_j, t_j):
    """Measured S_ji = S_j * S_i^-1 from two vertex Sim3s (how the reference
    builds spanning-tree/covisibility edge measurements from current poses,
    Optimizer.cc:620-700)."""
    return sim3_compose((s_j, R_j, t_j), sim3_inverse((s_i, R_i, t_i)))
