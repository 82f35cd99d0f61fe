"""Horn's closed-form absolute orientation (Sim3 from 3D-3D pairs).

Replaces Sim3Solver::computeT (reference: src/Sim3Solver.cc:226-332, itself
Horn 1987 "Closed-form solution of absolute orientation using unit
quaternions"). Batched over leading dims so a RANSAC fan-out of hypothesis
triplets solves in one call (the TPU replacement for the reference's
sequential RANSAC loop, src/Sim3Solver.cc:140-207)."""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_tpu.geometry.so3 import quat_to_rot


def horn_sim3(P1, P2, weights=None, fix_scale: bool = False):
    """Sim3 (s, R, t) aligning P2 -> P1, i.e. P1 ≈ s R P2 + t.

    P1, P2: (..., N, 3) matched 3D points.
    weights: optional (..., N) non-negative weights (mask support).
    Returns (s: (...,), R: (...,3,3), t: (...,3))."""
    if weights is None:
        weights = jnp.ones(P1.shape[:-1], P1.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    wn = weights / wsum  # (...,N)

    O1 = jnp.sum(wn[..., None] * P1, axis=-2)  # centroids (...,3)
    O2 = jnp.sum(wn[..., None] * P2, axis=-2)
    Pr1 = P1 - O1[..., None, :]
    Pr2 = P2 - O2[..., None, :]

    # weighted correlation M = sum w * pr2 pr1^T (3x3); with this orientation
    # the largest eigenvector of Horn's N matrix is the quaternion of the
    # rotation mapping frame-2 vectors onto frame-1 vectors.
    M = jnp.einsum("...n,...ni,...nj->...ij", wn, Pr2, Pr1)

    # Horn's 4x4 N matrix; largest eigenvector = rotation quaternion (w,x,y,z)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        -2,
    )
    evals, evecs = jnp.linalg.eigh(N)  # ascending
    q_wxyz = evecs[..., :, -1]
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)
    R = quat_to_rot(q_xyzw)

    RPr2 = (R[..., None, :, :] @ Pr2[..., None])[..., 0]  # (...,N,3)
    if fix_scale:
        s = jnp.ones(P1.shape[:-2], P1.dtype)
    else:
        # s = sum w <pr1, R pr2> / sum w |pr2|^2  (asymmetric form, matching
        # the reference's dot/den at src/Sim3Solver.cc:305-315)
        num = jnp.sum(wn * jnp.sum(Pr1 * RPr2, axis=-1), axis=-1)
        den = jnp.maximum(jnp.sum(wn * jnp.sum(Pr2 * Pr2, axis=-1), axis=-1), 1e-12)
        s = num / den
    t = O1 - s[..., None] * (R @ O2[..., None])[..., 0]
    return s, R, t
