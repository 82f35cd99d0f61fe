"""SE(3): rigid transforms as (...,4,4) homogeneous matrices + exp/log maps.

Replaces g2o::SE3Quat (reference: Thirdparty/g2o/g2o/types/se3quat.h) used by
every Optimizer routine (reference: src/Optimizer.cc). Representation choice:
dense 4x4 matrices — matmul-friendly for the MXU and trivially batched; the
6-vector tangent [rho, phi] (translation first, like g2o) is used only at
optimizer update sites."""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_tpu.geometry.so3 import _hat, so3_exp, so3_log

_EPS = 1e-8


def se3_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def se3_from_rt(R, t):
    """(...,3,3),(...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_rotation(T):
    return T[..., :3, :3]


def se3_translation(T):
    return T[..., :3, 3]


def se3_compose(T1, T2):
    return T1 @ T2


def se3_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_from_rt(Rt, -(Rt @ t[..., None])[..., 0])


def se3_apply(T, p):
    """Apply transform to points. T: (...,4,4), p: (...,3) -> (...,3)."""
    return (T[..., :3, :3] @ p[..., None])[..., 0] + T[..., :3, 3]


def _left_jacobian_factors(theta2):
    """A=sin/t, B=(1-cos)/t^2, C=(1-A)/t^2 with Taylor fallbacks.
    AD-safe at theta = 0 (double-where on sanitized inputs)."""
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / safe_t2)
    return A, B, C


def se3_exp(xi):
    """Tangent (...,6) [rho(3), phi(3)] -> (...,4,4).

    V-matrix form: t = V @ rho with V = I + B*W + C*W^2."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, B, C = _left_jacobian_factors(theta2)
    W = _hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    R = so3_exp(phi)
    t = (V @ rho[..., None])[..., 0]
    return se3_from_rt(R, t)


def se3_log(T):
    """(...,4,4) -> tangent (...,6) [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _left_jacobian_factors(theta2)
    W = _hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/t^2)(1 - A/(2B)) W^2
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / safe_t2)
    Vinv = I - 0.5 * W + coef[..., None, None] * (W @ W)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)
