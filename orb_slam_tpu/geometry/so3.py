"""SO(3): rotation exp/log maps and quaternion utilities.

Replaces the quaternion/rotation functionality of g2o's se3quat.h and
ORB-SLAM's Converter (reference: src/Converter.cc:28-160). All functions are
elementwise-batched: they accept arbitrary leading batch dimensions.

Numerics: small-angle branches are handled with jnp.where on Taylor
expansions (no data-dependent control flow — everything jits)."""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _hat(w):
    """Skew-symmetric matrix from axis vector. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues: axis-angle (...,3) -> rotation matrix (...,3,3).

    Autodiff-safe at w = 0: the generic branch is evaluated on sanitized
    inputs (double-where) so jacfwd/jacrev never see sqrt(0) or 0/0 —
    required by the pose-graph optimizer, which differentiates through
    exp/log chains."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = _hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R):
    """Rotation matrix (...,3,3) -> axis-angle (...,3).

    Conditioning: theta = atan2(|vee|/2, (tr-1)/2) — well-conditioned for all
    theta (arccos of the trace alone loses ~sqrt(eps) accuracy near pi, and
    evaluating sin() of that theta amplifies it 1/sin-fold). The axis comes
    from vee directly except very near pi, where |vee| -> 0 and the axis is
    recovered from the diagonal of (R + I)/2 instead."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    vee_norm = jnp.sqrt(jnp.sum(vee * vee, axis=-1) + 1e-24)  # = 2 sin(theta); AD-safe at 0
    theta = jnp.arctan2(vee_norm * 0.5, cos_t)
    small = theta < 1e-5
    near_pi = theta > (jnp.pi - 1e-3)
    # generic: w = theta * vee / |vee|  (|vee| error cancels in direction,
    # magnitude is the well-conditioned atan2 theta)
    safe_norm = jnp.where(small | near_pi, 1.0, vee_norm)
    k_generic = theta / safe_norm
    k_small = 0.5 + theta * theta / 12.0  # Taylor of theta/(2 sin theta)
    w_generic = jnp.where(small[..., None], k_small[..., None], k_generic[..., None]) * vee
    # near pi: R ≈ I + 2 ww^T/|w|^2*... use  w w^T = (R + I)/2 * theta^2 diag trick
    # axis from largest diagonal of (R + I)/2
    S = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    d = jnp.take_along_axis(diag, k[..., None], axis=-1)[..., 0]
    axis_unnorm = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    axis = axis_unnorm / jnp.sqrt(jnp.maximum(d, _EPS))[..., None]
    axis = axis / jnp.sqrt(jnp.sum(axis * axis, axis=-1, keepdims=True) + _EPS)
    # fix sign using vee (sin may be tiny but sign still informative); fall back to +
    sign = jnp.where(jnp.sum(axis * vee, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = axis * (sign * theta)[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def quat_to_rot(q):
    """Unit quaternion (...,4) [x,y,z,w] -> rotation matrix (...,3,3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) [x,y,z,w], w>=0.

    Branch-free Shepperd-style: compute all four candidate quaternions and
    select by the largest denominator (jit-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four squared magnitudes (may be negative numerically; clip)
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    # candidates scaled by 2*sqrt(q?2)
    def safe(x):
        return jnp.where(x < _EPS, 1.0, x)

    sw = 2.0 * jnp.sqrt(safe(qw2))
    sx = 2.0 * jnp.sqrt(safe(qx2))
    sy = 2.0 * jnp.sqrt(safe(qy2))
    sz = 2.0 * jnp.sqrt(safe(qz2))
    cand_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], -1)
    cand_x = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1)
    cand_y = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], -1)
    cand_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], -1)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (...,4,4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_mul(q1, q2):
    """Hamilton product, [x,y,z,w] convention."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
