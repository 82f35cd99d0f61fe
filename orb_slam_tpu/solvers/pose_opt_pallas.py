"""Pallas TPU kernel: the ENTIRE pose-only GN chain as ONE device op.

The per-frame pose optimization (solvers/pose_opt.py, the TPU form of
Optimizer::PoseOptimization, reference src/Optimizer.cc:154-285) is a
sequential chain of ~11 small damped-GN iterations. As XLA ops the chain is
latency-bound, not compute-bound: measured 0.47 ms/frame at 1024 rows where
the per-iteration vector math is ~100 KFLOP (PERF.md round 3 — scaling rows
4x scales time only 1.6x, so most of it is fixed per-op overhead). Fusing
the whole chain into one Pallas kernel keeps every iterate in VMEM/registers
and pays the dispatch cost once.

Semantics mirror pose_opt._gn_rounds exactly: 4 chi2-gated rounds
(9.21/7.378/5.991/5.991) with each round's re-gate folded into the next
round's first residual pass, Huber IRLS weights on the sigma-normalized
error, damped GN via an unrolled 6x6 scalar Cholesky, left-multiplied se3
exponential updates, and a final Gram-Schmidt orthonormalization. Pose math
runs on rank-0 scalars; per-edge math runs on [1, Np] VMEM vectors."""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam_tpu.solvers.pose_opt import HUBER_DELTA2, ROUND_CHI2


def _chol_solve6(S, b, damping):
    """x = (H + damping I)^-1 b with H from the scalar pair-sum dict S
    (S[(i,j)], i <= j). Mirrors pose_opt.solve6_cholesky on rank-0 values."""
    H = [[S[(i, j)] if i <= j else S[(j, i)] for j in range(6)]
         for i in range(6)]
    for i in range(6):
        H[i][i] = H[i][i] + damping
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _mm3(X, Y):
    return [[X[i][0] * Y[0][j] + X[i][1] * Y[1][j] + X[i][2] * Y[2][j]
             for j in range(3)] for i in range(3)]


def _se3_exp_compose(dx, R, t):
    """(R, t) <- exp(dx) o (R, t) on scalars; dx = [rho(3), phi(3)].
    Mirrors geometry/se3.py::se3_exp (Rodrigues + V-matrix translation,
    with the same small-angle Taylor guards)."""
    rho, phi = dx[:3], dx[3:]
    th2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    small = th2 < 1e-12
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-24))
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / jnp.maximum(th2 * th, 1e-36))
    z = jnp.float32(0.0)
    Ph = [[z, -phi[2], phi[1]], [phi[2], z, -phi[0]], [-phi[1], phi[0], z]]
    Ph2 = _mm3(Ph, Ph)
    I = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    Re = [[I[i][j] + A * Ph[i][j] + B * Ph2[i][j] for j in range(3)]
          for i in range(3)]
    V = [[I[i][j] + B * Ph[i][j] + C * Ph2[i][j] for j in range(3)]
         for i in range(3)]
    te = [V[i][0] * rho[0] + V[i][1] * rho[1] + V[i][2] * rho[2]
          for i in range(3)]
    Rn = _mm3(Re, R)
    tn = [Re[i][0] * t[0] + Re[i][1] * t[1] + Re[i][2] * t[2] + te[i]
          for i in range(3)]
    return Rn, tn


def _orthonormalize(R):
    """Gram-Schmidt on R's COLUMNS (pose_opt.orthonormalize_pose)."""
    c0 = [R[i][0] for i in range(3)]
    n0 = jnp.sqrt(c0[0] * c0[0] + c0[1] * c0[1] + c0[2] * c0[2])
    c0 = [v / n0 for v in c0]
    c1 = [R[i][1] for i in range(3)]
    d = c0[0] * c1[0] + c0[1] * c1[1] + c0[2] * c1[2]
    c1 = [c1[i] - d * c0[i] for i in range(3)]
    n1 = jnp.sqrt(c1[0] * c1[0] + c1[1] * c1[1] + c1[2] * c1[2])
    c1 = [v / n1 for v in c1]
    c2 = [c0[1] * c1[2] - c0[2] * c1[1],
          c0[2] * c1[0] - c0[0] * c1[2],
          c0[0] * c1[1] - c0[1] * c1[0]]
    return [[c0[i], c1[i], c2[i]] for i in range(3)]


def _make_pose_gn_kernel(iters, damping: float):
    delta = math.sqrt(HUBER_DELTA2)

    def kernel(sc_ref, pts_ref, uv_ref, is2_ref, valid_ref,
               tout_ref, inl_ref):
        # sc = [fx, fy, cx, cy, T00..T33 (row-major)]
        fx, fy, cx, cy = (sc_ref[0], sc_ref[1], sc_ref[2], sc_ref[3])
        R = [[sc_ref[4 + 4 * i + j] for j in range(3)] for i in range(3)]
        t = [sc_ref[4 + 4 * i + 3] for i in range(3)]

        px, py, pz = pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :]
        ou, ov = uv_ref[0:1, :], uv_ref[1:2, :]
        is2 = is2_ref[0:1, :]
        valid = valid_ref[0:1, :]
        inlier = valid

        def residual_jac(R, t, with_jac):
            x = R[0][0] * px + R[0][1] * py + R[0][2] * pz + t[0]
            y = R[1][0] * px + R[1][1] * py + R[1][2] * pz + t[1]
            zc = R[2][0] * px + R[2][1] * py + R[2][2] * pz + t[2]
            zs = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
            iz = 1.0 / zs
            ru = fx * x * iz + cx - ou
            rv = fy * y * iz + cy - ov
            chi2 = (ru * ru + rv * rv) * is2
            zpos = (zc > 0.0).astype(jnp.float32)
            if not with_jac:
                return chi2, zpos
            iz2 = iz * iz
            # J = d(uv)/d(pc) @ [I | -hat(pc)] (left-mult se3; identical
            # structure to pose_opt._residuals_jac)
            du = (fx * iz, None, -fx * x * iz2)          # du/dpc (du[1]=0)
            dv = (None, fy * iz, -fy * y * iz2)          # dv/dpc (dv[0]=0)
            # du . hat(pc) columns (literal, pc entries unguarded like XLA)
            hu0 = du[2] * (-y)
            hu1 = du[0] * (-zc) + du[2] * x
            hu2 = du[0] * y
            hv0 = dv[1] * zc + dv[2] * (-y)
            hv1 = dv[2] * x
            hv2 = dv[1] * (-x)
            zero = jnp.zeros_like(ru)
            Au = [du[0], zero, du[2], -hu0, -hu1, -hu2, ru]
            Av = [zero, dv[1], dv[2], -hv0, -hv1, -hv2, rv]
            return chi2, zpos, Au, Av

        pending = None
        for rnd in range(4):
            for it in range(iters[rnd]):
                chi2, zpos, Au, Av = residual_jac(R, t, True)
                if it == 0 and pending is not None:
                    inlier = (valid * zpos
                              * (chi2 <= pending).astype(jnp.float32))
                    pending = None
                e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
                w_h = jnp.where(e <= delta, 1.0, delta / e)
                w = is2 * w_h * inlier * zpos
                # ONE in-kernel MXU matmul builds all 28 pair sums at once:
                # B = [Au; Av] (14 x Np, padded to 16 sublanes), M = (wB)B^T,
                # S7 = M[:7,:7] + M[7:14,7:14] — replaces 28 cross-lane
                # reductions + 56 vector products per iteration
                z2 = jnp.zeros_like(Au[0])
                B = jnp.concatenate(Au + Av + [z2, z2], axis=0)  # [16, Np]
                WB = jnp.concatenate(
                    [w * a for a in Au] + [w * a for a in Av] + [z2, z2],
                    axis=0)
                M = jax.lax.dot_general(
                    WB, B, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [16, 16]
                S = {}
                for i in range(7):
                    for j in range(i, 7):
                        S[(i, j)] = M[i, j] + M[7 + i, 7 + j]
                b = [S[(i, 6)] for i in range(6)]
                dx = _chol_solve6(S, [-v for v in b], damping)
                fin = dx[0]
                for v in dx[1:]:
                    fin = fin + v
                ok = jnp.isfinite(fin)
                dx = [jnp.where(ok, v, 0.0) for v in dx]
                R, t = _se3_exp_compose(dx, R, t)
            pending = ROUND_CHI2[rnd]

        chi2, zpos = residual_jac(R, t, False)
        inlier = valid * zpos * (chi2 <= ROUND_CHI2[3]).astype(jnp.float32)
        Rn = _orthonormalize(R)

        vals = [Rn[0][0], Rn[0][1], Rn[0][2], t[0],
                Rn[1][0], Rn[1][1], Rn[1][2], t[1],
                Rn[2][0], Rn[2][1], Rn[2][2], t[2],
                0.0, 0.0, 0.0, 1.0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out = jnp.zeros((1, 128), jnp.float32)
        for i, v in enumerate(vals):
            out = out + jnp.where(lane == i, v, 0.0)
        tout_ref[...] = out
        inl_ref[...] = inlier

    return kernel


@partial(jax.jit, static_argnames=("iters", "damping", "interpret"))
def pose_optimize_pallas(T_cw0, points, uv, inv_sigma2, valid, K,
                         iters=(10, 10, 7, 5), damping: float = 1e-3,
                         interpret: bool = False):
    """Drop-in Pallas form of solvers.pose_opt.pose_optimize.
    Returns (T_cw [4,4], inlier [N] bool, n_inliers i32)."""
    N = points.shape[0]
    Np = -(-N // 128) * 128
    pad = Np - N
    pts_t = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0))).T  # [3,Np]
    uv_t = jnp.pad(uv.astype(jnp.float32), ((0, pad), (0, 0))).T       # [2,Np]
    is2 = jnp.pad(inv_sigma2.astype(jnp.float32), (0, pad))[None, :]
    val = jnp.pad(valid.astype(jnp.float32), (0, pad))[None, :]
    sc = jnp.concatenate([
        jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
        T_cw0.astype(jnp.float32).reshape(16),
    ]).astype(jnp.float32)

    tout, inl = pl.pallas_call(
        _make_pose_gn_kernel(tuple(iters), damping),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ],
        interpret=interpret,
    )(sc, pts_t, uv_t, is2, val)
    T = tout[0, :16].reshape(4, 4)
    inlier = inl[0, :N] > 0.5
    return T, inlier, jnp.sum(inlier)
