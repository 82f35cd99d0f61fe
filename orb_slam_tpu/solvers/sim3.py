"""Sim3 RANSAC solver + Sim3 optimization for loop closing.

Replaces Sim3Solver (reference: src/Sim3Solver.cc — Horn closed form from
3-point minimal sets with adaptive RANSAC and mutual-reprojection inlier
checks) and Optimizer::OptimizeSim3 (src/Optimizer.cc:791-987 — single Sim3
vertex with bidirectional projection edges, inlier-gated two-stage LM).

TPU-first: all RANSAC hypotheses solve in one batched Horn call; the Sim3
optimization is a 7-parameter Gauss-Newton with jacfwd-derived Jacobians
(the system is 7x7 — autodiff costs nothing at this size and removes a
whole class of hand-derived-Jacobian bugs)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry.horn import horn_sim3
from orb_slam_tpu.geometry.sim3 import sim3_exp
from orb_slam_tpu.utils.dispatch import precise_jit


def _project(p_cam, K_mat):
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-9, 1e-9, p_cam[..., 2])
    u = K_mat[0, 0] * p_cam[..., 0] / z + K_mat[0, 2]
    v = K_mat[1, 1] * p_cam[..., 1] / z + K_mat[1, 2]
    return jnp.stack([u, v], axis=-1)


@partial(precise_jit, static_argnames=("n_hypotheses", "fix_scale"))
def sim3_ransac(
    p1, p2, uv1, uv2, valid, sigma2_1, sigma2_2, K_mat, key,
    n_hypotheses: int = 300, fix_scale: bool = False,
):
    """Estimate S12 (mapping camera-2-frame points into camera 1's frame)
    from matched 3D points expressed in each camera frame, with mutual
    reprojection inlier checks (reference thresholds 9.21 sigma^2,
    Sim3Solver.cc:90-112, 335-359).

    p1, p2: [N,3] camera-frame 3D points. uv1, uv2: [N,2] observed pixels.
    Returns (s, R, t, inliers [N], n_inliers)."""
    N = p1.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hypotheses, N)) + logits[None, :]
    _, sets = jax.lax.top_k(g, 3)  # [H, 3] minimal sets

    def check(s, R, t):
        # project p2 through S12 into camera1 and p1 through S21 into cam2
        p2_in1 = s * p2 @ R.T + t
        e1 = jnp.sum((_project(p2_in1, K_mat) - uv1) ** 2, axis=-1)
        sinv = 1.0 / s
        Rt = R.T
        p1_in2 = sinv * p1 @ Rt.T - sinv * (Rt @ t)
        e2 = jnp.sum((_project(p1_in2, K_mat) - uv2) ** 2, axis=-1)
        inl = valid & (e1 < 9.21 * sigma2_1) & (e2 < 9.21 * sigma2_2)
        return inl

    def one(idx):
        s, R, t = horn_sim3(p1[idx], p2[idx], fix_scale=fix_scale)
        inl = check(s, R, t)
        return s, R, t, inl, jnp.sum(inl)

    ss, Rs, ts, inls, counts = jax.vmap(one)(sets)
    b = jnp.argmax(counts)
    # refit on the winning inlier set (improvement over the reference, which
    # returns the raw minimal-set estimate)
    w = inls[b].astype(jnp.float32)
    s_f, R_f, t_f = horn_sim3(p1, p2, weights=w, fix_scale=fix_scale)
    inl_f = check(s_f, R_f, t_f)
    better = jnp.sum(inl_f) >= counts[b]
    s_o = jnp.where(better, s_f, ss[b])
    R_o = jnp.where(better, R_f, Rs[b])
    t_o = jnp.where(better, t_f, ts[b])
    inl_o = jnp.where(better, inl_f, inls[b])
    return s_o, R_o, t_o, inl_o, jnp.sum(inl_o)


@partial(precise_jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(
    s0, R0, t0, p1, p2, uv1, uv2, valid, inv_sigma2_1, inv_sigma2_2, K_mat,
    iters: int = 10, fix_scale: bool = False, chi2_th: float = 10.0,
):
    """Refine S12 with bidirectional projection residuals + Huber, then gate
    outliers and refine again (Optimizer::OptimizeSim3's two-stage schedule,
    src/Optimizer.cc:791-987).

    Returns (s, R, t, inliers, n_inliers)."""
    delta = jnp.sqrt(chi2_th)

    def residuals(xi, w_mask):
        ds, dR, dt = sim3_exp(xi)
        s = s0 * ds
        R = dR @ R0
        t = ds * (dR @ t0) + dt
        p2_in1 = s * p2 @ R.T + t
        r1 = _project(p2_in1, K_mat) - uv1
        sinv = 1.0 / s
        Rt = R.T
        p1_in2 = sinv * p1 @ Rt.T - sinv * (Rt @ t)
        r2 = _project(p1_in2, K_mat) - uv2
        return r1, r2, (s, R, t)

    def chi2_of(xi, w_mask):
        r1, r2, _ = residuals(xi, w_mask)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        return c1, c2

    def gn(xi, active, n_iters):
        def step(_, xi):
            def flat_res(x):
                r1, r2, _ = residuals(x, active)
                c1, c2 = chi2_of(x, active)
                e1 = jnp.sqrt(jnp.maximum(c1, 1e-12))
                e2 = jnp.sqrt(jnp.maximum(c2, 1e-12))
                h1 = jnp.sqrt(jnp.where(e1 <= delta, 1.0, delta / e1) * inv_sigma2_1 * active)
                h2 = jnp.sqrt(jnp.where(e2 <= delta, 1.0, delta / e2) * inv_sigma2_2 * active)
                return jnp.concatenate(
                    [(r1 * h1[:, None]).ravel(), (r2 * h2[:, None]).ravel()]
                )

            r = flat_res(xi)
            J = jax.jacfwd(flat_res)(xi)  # [4N, 7]
            H = J.T @ J + 1e-6 * jnp.eye(7)
            b = J.T @ r
            if fix_scale:
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                b = b.at[6].set(0.0)
            dx = jnp.linalg.solve(H, -b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
            return xi + dx

        return jax.lax.fori_loop(0, n_iters, step, xi)

    xi = jnp.zeros(7)
    active = valid.astype(jnp.float32)
    xi = gn(xi, active, iters // 2)
    c1, c2 = chi2_of(xi, active)
    inlier = valid & (c1 < chi2_th) & (c2 < chi2_th)
    xi = gn(xi, inlier.astype(jnp.float32), iters)
    c1, c2 = chi2_of(xi, inlier.astype(jnp.float32))
    inlier = valid & (c1 < chi2_th) & (c2 < chi2_th)
    _, _, (s, R, t) = residuals(xi, inlier)
    return s, R, t, inlier, jnp.sum(inlier)
