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

from orb_slam_tpu.utils.dispatch import precise_jit
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


@partial(precise_jit, static_argnames=("iters", "solver", "cg_iters"))
def optimize_essential_graph(
    base_s, base_R, base_t,     # [K], [K,3,3], [K,3] current vertex Sim3s
    edges_i, edges_j,           # [E] i32 endpoints
    meas_s, meas_R, meas_t,     # [E], [E,3,3], [E,3] measured S_ji
    edge_valid,                 # [E] bool
    fixed,                      # [K] bool (loop KF + invalid slots)
    iters: int = 20,
    solver: str = "dense",
    cg_iters: int = 100,
):
    """Returns optimized (s [K], R [K,3,3], t [K,3]).

    solver: "dense" assembles the full [7K, 7K] normal equations (one MXU
    Cholesky — right up to a few hundred keyframes); "cg" runs matrix-free
    block-Jacobi-preconditioned conjugate gradient on the SAME normal
    equations — O(E) memory and O(E * cg_iters) work, the scaling path for
    thousands of keyframes where the dense matrix (7K)^2 no longer fits
    (the reference's g2o uses a sparse Cholesky for the same reason,
    Optimizer.cc:548-550)."""
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

        # free-subspace masking: a fixed endpoint contributes nothing to
        # (and receives nothing from) the system — its edges still
        # constrain the free endpoint through the residual
        free = ~fixed
        wi = (edge_valid & free[jnp.clip(edges_i, 0, K - 1)]).astype(
            jnp.float32)
        wj = (edge_valid & free[jnp.clip(edges_j, 0, K - 1)]).astype(
            jnp.float32)
        Ji = Ji * wi[:, None, None]
        Jj = Jj * wj[:, None, None]
        rw = r * edge_valid[:, None]

        ii = jnp.where(edge_valid, edges_i, K)
        jj = jnp.where(edge_valid, edges_j, K)
        b = jnp.zeros((K + 1, 7))
        b = b.at[ii].add(jnp.einsum("eki,ek->ei", Ji, rw))
        b = b.at[jj].add(jnp.einsum("eki,ek->ei", Jj, rw))
        b = b[:K]
        b = jnp.where(fixed[:, None], 0.0, b)

        if solver == "dense":
            # assemble dense block system
            H = jnp.zeros((K + 1, K + 1, 7, 7))
            H = H.at[ii, ii].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
            H = H.at[jj, jj].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
            H = H.at[ii, jj].add(jnp.einsum("eki,ekj->eij", Ji, Jj))
            H = H.at[jj, ii].add(jnp.einsum("eki,ekj->eij", Jj, Ji))
            H = H[:K, :K]
            H = H.at[jnp.arange(K), jnp.arange(K)].add(
                lam * jnp.eye(7)[None])
            # fixed vertices: identity rows
            H = jnp.where(fixed[:, None, None, None], 0.0, H)
            H = jnp.where(fixed[None, :, None, None], 0.0, H)
            H = H.at[jnp.arange(K), jnp.arange(K)].add(
                fixed[:, None, None] * jnp.eye(7)[None]
            )
            Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
            bd = b.reshape(7 * K)
            dx = jnp.linalg.solve(Hd, -bd).reshape(K, 7)
        else:
            # matrix-free PCG. Hx product = two edge gathers + two
            # scatter-adds; block-Jacobi preconditioner from the [K,7,7]
            # diagonal blocks.
            ei = jnp.clip(edges_i, 0, K - 1)
            ej = jnp.clip(edges_j, 0, K - 1)

            def Hx(x):
                u = (jnp.einsum("eij,ej->ei", Ji, x[ei])
                     + jnp.einsum("eij,ej->ei", Jj, x[ej]))
                y = jnp.zeros((K + 1, 7))
                y = y.at[ii].add(jnp.einsum("eik,ei->ek", Ji, u))
                y = y.at[jj].add(jnp.einsum("eik,ei->ek", Jj, u))
                y = y[:K] + lam * x
                return jnp.where(fixed[:, None], x, y)

            Dg = jnp.zeros((K + 1, 7, 7))
            Dg = Dg.at[ii].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
            Dg = Dg.at[jj].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
            Dg = Dg[:K] + (lam + 1e-8) * jnp.eye(7)[None]
            Dg = jnp.where(fixed[:, None, None],
                           jnp.broadcast_to(jnp.eye(7), Dg.shape), Dg)
            D_inv = jnp.linalg.inv(Dg)

            def precond(v):
                return jnp.einsum("kij,kj->ki", D_inv, v)

            rhs = -b

            def cg_step(_, c):
                x, rr, p, rz = c
                Ap = Hx(p)
                denom = jnp.sum(p * Ap)
                alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
                x = x + alpha * p
                rr = rr - alpha * Ap
                z = precond(rr)
                rz_new = jnp.sum(rr * z)
                beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
                p = z + beta * p
                return (x, rr, p, rz_new)

            x0 = jnp.zeros((K, 7))
            r0 = rhs
            z0 = precond(r0)
            dx, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_step, (x0, r0, z0, jnp.sum(r0 * z0)))
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


@precise_jit
def relative_sim3_batch(s_i, R_i, t_i, s_j, R_j, t_j):
    """[E]-batched relative_sim3 as ONE device dispatch.

    CorrectLoop builds the essential graph's full edge-measurement set at
    once; round 3 called relative_sim3 once per edge from a host loop —
    hundreds of jitted dispatches (~400 ms tunnel RTT each) inside the
    exclusive-writer window while the mapper is parked (the reference does
    the whole graph in one optimizer call, Optimizer.cc:540-789)."""
    return jax.vmap(relative_sim3)(s_i, R_i, t_i, s_j, R_j, t_j)
