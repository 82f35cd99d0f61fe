"""Sim(3): similarity transforms (scale, rotation, translation).

Replaces g2o::Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h) used by
loop closing and essential-graph optimization (reference:
src/Optimizer.cc:540-789, src/LoopClosing.cc:413-491).

Representation: a pytree-friendly flat vector (..., 8) = [q(4) xyzw, t(3),
log_s(1)] would hide the structure; instead we use an explicit dict-free
tuple convention (s, R, t) with s: (...,), R: (...,3,3), t: (...,3).
Tangent for sim3_exp/log is (...,7) = [rho(3), phi(3), sigma(1)] (g2o order:
translation, rotation, scale)."""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_tpu.geometry.so3 import _hat, so3_exp, so3_log

_EPS = 1e-8


def sim3_identity(dtype=jnp.float32):
    return (jnp.asarray(1.0, dtype), jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype))


def sim3_from_srt(s, R, t):
    return (jnp.asarray(s), R, t)


def sim3_compose(g1, g2):
    """g1 ∘ g2: x -> s1 R1 (s2 R2 x + t2) + t1."""
    s1, R1, t1 = g1
    s2, R2, t2 = g2
    return (s1 * s2, R1 @ R2, s1[..., None] * (R1 @ t2[..., None])[..., 0] + t1)


def sim3_inverse(g):
    s, R, t = g
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return (sinv, Rt, -sinv[..., None] * (Rt @ t[..., None])[..., 0])


def sim3_apply(g, p):
    s, R, t = g
    return s[..., None] * (R @ p[..., None])[..., 0] + t


def sim3_to_se3(g):
    """[R t/s] recovery used after essential-graph optimization
    (reference: src/Optimizer.cc:740-748)."""
    s, R, t = g
    from orb_slam_tpu.geometry.se3 import se3_from_rt

    return se3_from_rt(R, t / s[..., None])


def sim3_exp(xi):
    """Tangent (...,7) [rho, phi, sigma] -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-24)  # AD-safe at 0
    W = _hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # W-matrix of Sim(3) exp (Strasdat thesis eq. for the translation part):
    # t = Wm @ rho where Wm = A*I + B*W + C*W^2 with scale-coupled coefficients.
    sig = sigma
    small_sig = jnp.abs(sig) < 1e-5
    small_th = theta < 1e-5
    safe_sig = jnp.where(small_sig, 1.0, sig)
    safe_th = jnp.where(small_th, 1.0, theta)
    safe_th2 = jnp.where(small_th, 1.0, theta2)

    # A coefficient: (s - 1)/sigma, sigma->0: 1
    A = jnp.where(small_sig, 1.0 + sig / 2.0 + sig * sig / 6.0, (s - 1.0) / safe_sig)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = safe_sig * safe_sig + safe_th2

    # generic (sigma != 0, theta != 0)
    a_g = s * sin_t
    b_g = s * cos_t
    B_g = (a_g * safe_sig + (1.0 - b_g) * safe_th) / (safe_th * denom)
    C_g = (A - ((b_g - 1.0) * safe_sig + a_g * safe_th) / denom) / safe_th2
    # sigma -> 0 limits
    B_s0 = (1.0 - cos_t) / safe_th2
    C_s0 = (safe_th - sin_t) / (safe_th2 * safe_th)
    # theta -> 0 limits
    B_t0 = jnp.where(
        small_sig,
        0.5 + sig / 6.0,
        ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig),
    )
    C_t0 = jnp.where(
        small_sig,
        1.0 / 6.0 + sig / 24.0,
        (s * (0.5 * safe_sig * safe_sig - safe_sig + 1.0) - 1.0)
        / (safe_sig * safe_sig * safe_sig),
    )
    B = jnp.where(small_th, B_t0, jnp.where(small_sig, B_s0, B_g))
    C = jnp.where(small_th, C_t0, jnp.where(small_sig, C_s0, C_g))
    Wm = A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = (Wm @ rho[..., None])[..., 0]
    return (s, R, t)


def sim3_log(g):
    """(s, R, t) -> tangent (...,7). Inverse of sim3_exp (solves Wm rho = t)."""
    s, R, t = g
    sigma = jnp.log(s)
    phi = so3_log(R)
    # Rebuild Wm column-by-column (sim3_exp applied to basis rho vectors)
    # and solve the 3x3 system Wm @ rho = t.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), phi.shape[:-1] + (3, 3))
    cols = []
    for i in range(3):
        xi = jnp.concatenate([eye[..., i], phi, sigma[..., None]], axis=-1)
        cols.append(sim3_exp(xi)[2])
    Wm = jnp.stack(cols, axis=-1)
    rho = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_stack(g):
    """Pack (s,R,t) into a flat (...,13) array [s, R.flat(9), t(3)] for storage."""
    s, R, t = g
    return jnp.concatenate(
        [s[..., None], R.reshape(R.shape[:-2] + (9,)), t], axis=-1
    )


def sim3_unstack(a):
    return (a[..., 0], a[..., 1:10].reshape(a.shape[:-1] + (3, 3)), a[..., 10:13])
