"""EPnP: batched perspective-n-point + RANSAC for relocalisation.

Replaces PnPsolver (reference: src/PnPsolver.cc, itself Lepetit et al.'s
EPnP + adaptive RANSAC). The reference iterates minimal 4-point sets one at
a time with an adaptive budget (PnPsolver.cc:166-306); here ALL hypotheses
run at once as one vmapped batch (the fixed-budget fan-out pattern,
SURVEY.md §7) and the best-by-inliers hypothesis is refined on its full
inlier set.

EPnP internals mirror the standard algorithm (and the reference's layout):
control points via centroid + PCA (PnPsolver.cc:376-410), barycentric
coordinates (412-435), the 2n x 12 M matrix (437-452), null-space of M^T M,
beta cases N=1/2/3 from the L_6x10 system (497-525, 668-859), Gauss-Newton
refinement of the betas, and absolute orientation for (R, t) — here via our
Horn solver with fixed scale instead of the reference's bespoke
estimate_R_and_t (570-628)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry.horn import horn_sim3
from orb_slam_tpu.utils.dispatch import precise_jit


def _control_points(pw):
    """World control points from centroid + PCA. pw: [n,3] -> cw [4,3]."""
    c0 = jnp.mean(pw, axis=0)
    A = pw - c0
    cov = A.T @ A / pw.shape[0]
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    evals = jnp.maximum(evals, 1e-12)
    # largest first like the reference
    dirs = evecs[:, ::-1] * jnp.sqrt(evals[::-1])[None, :]
    cws = jnp.stack([c0, c0 + dirs[:, 0], c0 + dirs[:, 1], c0 + dirs[:, 2]])
    return cws


def _barycentric(pw, cw):
    """alphas [n,4] with p = sum alpha_j c_j, sum alpha = 1."""
    B = (cw[1:] - cw[0]).T  # [3,3]
    rhs = (pw - cw[0]).T    # [3,n]
    a123 = jnp.linalg.solve(
        B + 1e-9 * jnp.eye(3), rhs
    ).T                      # [n,3]
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_M(alphas, uv, fx, fy, cx, cy):
    """[2n, 12] EPnP system."""
    n = alphas.shape[0]
    u, v = uv[:, 0], uv[:, 1]
    rows = []
    for j in range(4):
        a = alphas[:, j]
        rows.append(jnp.stack([a * fx, jnp.zeros(n), a * (cx - u)], axis=1))
    Mu = jnp.concatenate(rows, axis=1)  # [n, 12]
    rows = []
    for j in range(4):
        a = alphas[:, j]
        rows.append(jnp.stack([jnp.zeros(n), a * fy, a * (cy - v)], axis=1))
    Mv = jnp.concatenate(rows, axis=1)
    return jnp.concatenate([Mu, Mv], axis=0)  # [2n, 12]


_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _rho(cw):
    return jnp.stack(
        [jnp.sum((cw[a] - cw[b]) ** 2) for a, b in _PAIRS]
    )  # [6]


def _L6x10(V):
    """V: [12, 4] null-space basis (columns ordered smallest eigenvalue
    first). Returns L [6, 10] for beta products ordered
    [b11, b12, b22, b13, b23, b33, b14, b24, b34, b44]."""
    vs = [V[:, i].reshape(4, 3) for i in range(4)]
    dv = []
    for v in vs:
        dv.append(jnp.stack([v[a] - v[b] for a, b in _PAIRS]))  # [6,3]
    cols = []
    order = [(0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2),
             (0, 3), (1, 3), (2, 3), (3, 3)]
    for (i, j) in order:
        dot = jnp.sum(dv[i] * dv[j], axis=1)
        cols.append(jnp.where(i == j, dot, 2.0 * dot))
    return jnp.stack(cols, axis=1)  # [6, 10]


def _betas_case1(L, rho):
    """Approx using columns [b11, b12, b13, b14] (reference find_betas_approx_1)."""
    A = L[:, [0, 1, 3, 6]]
    x = jnp.linalg.lstsq(A, rho)[0]
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
    b1 = jnp.where(x[0] < 0, 1e-3, b1)
    b2 = x[1] / b1
    b3 = x[2] / b1
    b4 = x[3] / b1
    return jnp.stack([b1, b2, b3, b4])


def _betas_case2(L, rho):
    """Columns [b11, b12, b22] (find_betas_approx_2)."""
    A = L[:, [0, 1, 2]]
    x = jnp.linalg.lstsq(A, rho)[0]
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
    b2 = jnp.sqrt(jnp.maximum(jnp.abs(x[2]), 1e-12))
    b2 = b2 * jnp.sign(x[1]) * jnp.sign(x[0] + 1e-30)
    return jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])


def _betas_case3(L, rho):
    """Columns [b11, b12, b22, b13, b23] (find_betas_approx_3)."""
    A = L[:, [0, 1, 2, 3, 4]]
    x = jnp.linalg.lstsq(A, rho)[0]
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
    b2 = jnp.sqrt(jnp.maximum(jnp.abs(x[2]), 1e-12)) * jnp.sign(x[1])
    b3 = x[3] / b1
    return jnp.stack([b1, b2, b3, jnp.zeros(())])


def _gauss_newton_betas(L, rho, betas, iters=5):
    """Refine betas on the 6 distance constraints (PnPsolver::gauss_newton)."""

    def products(b):
        b1, b2, b3, b4 = b[0], b[1], b[2], b[3]
        return jnp.stack(
            [b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3,
             b1 * b4, b2 * b4, b3 * b4, b4 * b4]
        )

    def body(_, b):
        r = L @ products(b) - rho  # [6]
        J = jax.jacfwd(lambda bb: L @ products(bb))(b)  # [6,4]
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        db = jnp.linalg.solve(JtJ, -J.T @ r)
        return b + jnp.where(jnp.all(jnp.isfinite(db)), db, 0.0)

    return jax.lax.fori_loop(0, iters, body, betas)


def _pose_from_betas(V, betas, alphas, pw):
    """Camera control points = sum beta_i v_i -> point depths -> rigid
    alignment (Horn, fixed scale)."""
    ccs = (V @ betas).reshape(4, 3)  # [4,3] camera-frame control points
    pc = alphas @ ccs                # [n,3] camera-frame points
    # enforce positive depth (EPnP sign ambiguity): flip if mean z < 0
    flip = jnp.mean(pc[:, 2]) < 0
    pc = jnp.where(flip, -pc, pc)
    s, R, t = horn_sim3(pc, pw, fix_scale=True)  # pc ≈ R pw + t
    return R, t


def _reproj_err(R, t, pw, uv, fx, fy, cx, cy):
    pc = pw @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2


def epnp_solve(pw, uv, K_mat):
    """Single EPnP solve. pw: [n,3] world points, uv: [n,2] pixels.
    Returns (R [3,3], t [3]) with x_cam = R x_world + t."""
    fx, fy, cx, cy = K_mat[0, 0], K_mat[1, 1], K_mat[0, 2], K_mat[1, 2]
    cw = _control_points(pw)
    alphas = _barycentric(pw, cw)
    M = _build_M(alphas, uv, fx, fy, cx, cy)
    MtM = M.T @ M
    _, evecs = jnp.linalg.eigh(MtM)  # ascending
    V = evecs[:, :4]                 # 4 smallest
    L = _L6x10(V)
    rho = _rho(cw)

    best = None
    for case_fn in (_betas_case1, _betas_case2, _betas_case3):
        betas0 = case_fn(L, rho)
        betas = _gauss_newton_betas(L, rho, betas0)
        R, t = _pose_from_betas(V, betas, alphas, pw)
        err = jnp.sum(_reproj_err(R, t, pw, uv, fx, fy, cx, cy))
        if best is None:
            best = (err, R, t)
        else:
            take = err < best[0]
            best = (
                jnp.where(take, err, best[0]),
                jnp.where(take, R, best[1]),
                jnp.where(take, t, best[2]),
            )
    return best[1], best[2]


@partial(precise_jit, static_argnames=("n_hypotheses", "min_set"))
def epnp_ransac(
    pw, uv, valid, inv_sigma2, K_mat, key,
    n_hypotheses: int = 128, min_set: int = 4, chi2_th: float = 5.991,
):
    """Batched EPnP RANSAC (replaces PnPsolver::iterate,
    src/PnPsolver.cc:166-306).

    pw: [N,3], uv: [N,2], valid: [N], inv_sigma2: [N] per-match information.
    Returns (R [3,3], t [3], inliers [N], n_inliers)."""
    N = pw.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hypotheses, N)) + logits[None, :]
    _, sets = jax.lax.top_k(g, min_set)  # [H, 4]

    def one(idx):
        R, t = epnp_solve(pw[idx], uv[idx], K_mat)
        err = _reproj_err(R, t, pw, uv,
                          K_mat[0, 0], K_mat[1, 1], K_mat[0, 2], K_mat[1, 2])
        inl = valid & (err * inv_sigma2 < chi2_th)
        return R, t, inl, jnp.sum(inl)

    Rs, ts, inls, counts = jax.vmap(one)(sets)
    b = jnp.argmax(counts)
    # Full-inlier refinement (the reference's PnPsolver::Refine) is done by
    # the caller via pose_optimize on the returned inlier set — mirroring
    # the reference's reloc ladder (EPnP -> PoseOptimization,
    # src/Tracking.cc:908-948).
    return Rs[b], ts[b], inls[b], counts[b]
