"""Linear (DLT) triangulation and two-view geometric checks.

Replaces Initializer::Triangulate (reference: src/Initializer.cc:732-745)
and the SVD triangulation in LocalMapping::CreateNewMapPoints (reference:
src/LocalMapping.cc:205-371). Batched: vmap/broadcast over leading dims —
on TPU we triangulate hundreds of candidate pairs per call instead of one."""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(xn1, xn2, P1, P2):
    """DLT triangulation from normalized image coords.

    xn1, xn2: (...,2) normalized (pre-undistorted, K-removed) coordinates.
    P1, P2:   (...,3,4) projection matrices (typically [R|t], K removed).
    Returns (...,3) world points (NaN-free; degenerate rows give garbage
    that downstream depth/parallax gates reject, matching the reference's
    "!isfinite -> skip" behavior at src/LocalMapping.cc:294-299)."""
    rows = []
    for xn, P in ((xn1, P1), (xn2, P2)):
        x, y = xn[..., 0], xn[..., 1]
        rows.append(x[..., None] * P[..., 2, :] - P[..., 0, :])
        rows.append(y[..., None] * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (...,4,4)
    # Smallest right singular vector of A. Use eigh of A^T A: 4x4 symmetric,
    # cheap and batched-friendly on TPU (jnp.linalg.svd also works but eigh
    # of the Gram matrix is faster for tiny fixed sizes).
    G = jnp.swapaxes(A, -1, -2) @ A
    w, V = jnp.linalg.eigh(G)  # ascending eigenvalues
    X = V[..., :, 0]
    wcoord = X[..., 3]
    safe = jnp.where(jnp.abs(wcoord) < 1e-12, 1e-12, wcoord)
    return X[..., :3] / safe[..., None]


def depth_in_frame(T_cw, p_world):
    """z-coordinate of world points in camera frame. T_cw: (...,4,4)."""
    return (T_cw[..., 2, :3] @ p_world[..., None])[..., 0] + T_cw[..., 2, 3]


def parallax_cos(C1, C2, p_world):
    """Cosine of the ray parallax angle at a 3D point between camera centers
    C1, C2 (...,3). Reference gate: cosParallax < 0.9998
    (src/Initializer.cc:860-870, src/LocalMapping.cc:276-292)."""
    r1 = p_world - C1
    r2 = p_world - C2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    denom = jnp.maximum(n1 * n2, 1e-12)
    return jnp.sum(r1 * r2, axis=-1) / denom
