"""Bundle adjustment: Schur-complement Gauss-Newton over the MapState.

Replaces Optimizer::BundleAdjustment / GlobalBundleAdjustemnt [sic] and
Optimizer::LocalBundleAdjustment (reference: src/Optimizer.cc:38-152,
287-536), i.e. g2o's sparse LM with marginalized point vertices.

TPU-first formulation: edges live in the capped per-point observation table
([P, O] from slam_map.observations) so every quantity is a fixed-shape
batched tensor:
  * per-edge residuals/Jacobians: [P, O, 2, {6,3}] — one fused VPU pass;
  * point blocks Hpp: [P, 3, 3] batched inverse;
  * Schur cross terms: D[p,o] = C[p,o] @ chol(Hpp^-1); the reduced camera
    system accumulates D D^T into a COMPACT [Kl+1, Kl+1, 6, 6] via
    scatter-add (Kl = bound on optimized cameras, see _camera_compaction),
    looping over the O second-observation index to bound peak memory;
  * the reduced system is a dense 6Kl x 6Kl Cholesky solve — at the
    reference's own locality bound (local BA sees <= ~80 cameras,
    SURVEY.md §5) this is tiny for the MXU and independent of the map's
    keyframe capacity;
  * back-substitution recovers point updates.

Outlier policy mirrors the reference's two-phase schedule
(Optimizer.cc:442-515): phase-1 iterations, chi2 re-gate (5.991), phase-2
iterations, final gate returned to the caller so it can unbind bad
observations from kf_obs."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry.se3 import se3_exp
from orb_slam_tpu.slam_map.map_state import MapState
from orb_slam_tpu.slam_map.observations import observation_table, OBS_CAP
from orb_slam_tpu.utils.dispatch import fused_jit

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(CHI2_MONO)


def _edge_terms(kf_pose, pt_pos, obs_kf, uv, K_mat):
    """Residuals + Jacobians for every (point, obs) edge.

    uv: [P,O,2] observed pixels (gathered once from kf_xy by the caller —
    constant across solver iterations, and it keeps this function free of
    the [K,N] arrays so the sharded path can pass per-shard edge slices).
    Returns r [P,O,2], Jc [P,O,2,6] (camera, left-mult convention),
    Jp [P,O,2,3] (point), z [P,O] depth."""
    Kk = kf_pose.shape[0]
    kf_safe = jnp.clip(obs_kf, 0, Kk - 1)
    T = kf_pose[kf_safe]              # [P,O,4,4]
    fx, fy, cx, cy = K_mat[0, 0], K_mat[1, 1], K_mat[0, 2], K_mat[1, 2]

    pc = jnp.einsum("poij,pj->poi", T[..., :3, :3], pt_pos) + T[..., :3, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * x / zs + cx
    v = fy * y / zs + cy
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], axis=-1)

    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(iz)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    duv_dpc = jnp.stack([du, dv], axis=-2)  # [P,O,2,3]

    hat = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # [P,O,3,3]
    I3 = jnp.broadcast_to(jnp.eye(3), hat.shape)
    dpc_dxi = jnp.concatenate([I3, -hat], axis=-1)  # [P,O,3,6]
    Jc = duv_dpc @ dpc_dxi                           # [P,O,2,6]
    Jp = duv_dpc @ T[..., :3, :3]                    # [P,O,2,3]
    return r, Jc, Jp, z


def _inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate / det). jnp.linalg.inv
    lowers to generic batched LU, which is slow on TPU for tiny blocks
    (~27 ms at P=16k, scripts/profile_ba.py); the cofactor formula is a
    handful of fused VPU ops."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    C00 = e * i - f * h
    C01 = c * h - b * i
    C02 = b * f - c * e
    C10 = f * g - d * i
    C11 = a * i - c * g
    C12 = c * d - a * f
    C20 = d * h - e * g
    C21 = b * g - a * h
    C22 = a * e - b * d
    det = a * C00 + b * C10 + c * C20
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    rows = [
        jnp.stack([C00, C01, C02], -1),
        jnp.stack([C10, C11, C12], -1),
        jnp.stack([C20, C21, C22], -1),
    ]
    return jnp.stack(rows, -2) * idet[..., None, None]


def _chol3x3(A):
    """Batched closed-form lower Cholesky of (symmetrized) 3x3 SPD blocks
    with clamped pivots (mirrors the jnp.linalg.cholesky + isfinite-zero
    guard of the generic path)."""
    a00 = jnp.maximum(A[..., 0, 0], 1e-18)
    l00 = jnp.sqrt(a00)
    l10 = A[..., 1, 0] / l00
    l20 = A[..., 2, 0] / l00
    d11 = jnp.maximum(A[..., 1, 1] - l10 * l10, 1e-18)
    l11 = jnp.sqrt(d11)
    l21 = (A[..., 2, 1] - l20 * l10) / l11
    d22 = jnp.maximum(A[..., 2, 2] - l20 * l20 - l21 * l21, 1e-18)
    l22 = jnp.sqrt(d22)
    z = jnp.zeros_like(l00)
    L = jnp.stack([
        jnp.stack([l00, z, z], -1),
        jnp.stack([l10, l11, z], -1),
        jnp.stack([l20, l21, l22], -1),
    ], -2)
    return jnp.where(jnp.isfinite(L), L, 0.0)


def _camera_compaction(cam_opt, Kl: int):
    """Compact camera index space: the Schur/reduced system only needs
    slots for OPTIMIZED cameras (fixed cameras have zero camera Jacobian
    and contribute nothing to it), so the [..] scatter space shrinks from
    the full keyframe capacity K to Kl = max optimized cameras. This is
    what keeps local BA O(edges + Kl^3) regardless of map size — the
    reference's own locality property (local BA sees <= ~80 covisible
    cameras however large the map is, Optimizer.cc:289-338).

    Returns (local_id [K] int32: cam slot -> compact slot or Kl dump,
    opt_cams [Kl] int32: compact slot -> cam slot, slot_used [Kl] bool).
    Cameras beyond Kl (should not happen for callers that bound their
    covisible window) fall into the dump slot = treated as fixed."""
    K = cam_opt.shape[0]
    rank = jnp.cumsum(cam_opt) - 1                    # [K]
    local_id = jnp.where(cam_opt & (rank < Kl), rank, Kl).astype(jnp.int32)
    order = jnp.argsort(~cam_opt, stable=True)        # optimized first
    opt_cams = order[:Kl].astype(jnp.int32)
    slot_used = jnp.arange(Kl) < jnp.sum(cam_opt)
    return local_id, opt_cams, slot_used


def _point_compaction(pt_opt, Pl: int):
    """Compact point index space: local BA only touches the pt_opt points
    (edges to non-opt points are ignored entirely — reference local-BA edge
    selection, Optimizer.cc:289-338), yet round 3 ran every edge pass over
    the FULL point capacity ([P=16384, O] terms for ~1-2k live points).
    Gathering the optimized rows into a compact [Pl] space before the
    solver cuts the edge pass, the 3x3 point blocks and the one-hot Schur
    assembly by P/Pl (~8x at production shapes) — the point-side mirror of
    _camera_compaction.

    Returns (opt_pts [Pl] i32: compact slot -> point slot,
    slot_used [Pl] bool). Points beyond Pl (callers bound their local point
    set) are left un-optimized, exactly like cameras beyond Kl."""
    order = jnp.argsort(~pt_opt, stable=True)  # optimized points first
    opt_pts = order[:Pl].astype(jnp.int32)
    slot_used = jnp.arange(Pl) < jnp.sum(pt_opt)
    return opt_pts, slot_used


def _solve_iteration(kf_pose, pt_pos, edge_w, obs_kf, uv,
                     K_mat, cam_opt, pt_opt, damping, axis_name=None,
                     Kl: int | None = None, terms=None):
    """One Gauss-Newton step. edge_w: [P,O] weights (0 = excluded edge,
    else information * Huber). Returns (new kf_pose, new pt_pos).
    terms: optional precomputed _edge_terms(kf_pose, pt_pos, ...) —
    callers that already evaluated residuals at this state (for weights /
    cost) pass them in to avoid a redundant edge pass.

    Kl: static bound on the number of optimized cameras (the compact
    Schur space, see _camera_compaction). None = full capacity.

    axis_name: when running inside shard_map with points/edges sharded
    over that mesh axis, the reduced camera system (Hcc, Schur S, bc) is
    psum'd across shards before the (replicated) dense solve — the
    scaling-book recipe: local partial normal equations + one collective.
    Point updates never leave their shard."""
    P, O = edge_w.shape
    Kk = kf_pose.shape[0]
    # compact = camera system assembled in a [Kl]-slot space holding only
    # optimized cameras. When no bound is requested the legacy full-capacity
    # assembly runs VERBATIM — it is numerically identical scatter-order-wise
    # (compaction permutes the float accumulation order, which measurably
    # shifts marginal downstream decisions over long runs).
    compact = Kl is not None
    if compact:
        local_id, opt_cams, slot_used = _camera_compaction(cam_opt, Kl)
    else:
        Kl = Kk
    if terms is None:
        terms = _edge_terms(kf_pose, pt_pos, obs_kf, uv, K_mat)
    r, Jc, Jp, z = terms
    w = edge_w * (z > 0)
    # zero camera Jacobians of fixed cameras (they still constrain points)
    obs_kf_safe = jnp.clip(obs_kf, 0, Kk - 1)
    cam_is_opt = cam_opt[obs_kf_safe]  # [P,O]
    Jc = jnp.where(cam_is_opt[..., None, None], Jc, 0.0)

    wJc = Jc * w[..., None, None]
    wJp = Jp * w[..., None, None]

    # point blocks
    Hpp = jnp.einsum("pokx,poky->pxy", wJp, Jp)  # [P,3,3]
    bp = jnp.einsum("pokx,pok->px", wJp, r)      # [P,3]
    Hpp = Hpp + damping * jnp.broadcast_to(jnp.eye(3), Hpp.shape)
    # fixed points: make their block identity so their update is 0 and they
    # contribute no Schur term (their C entries are zeroed below)
    Hpp = jnp.where(pt_opt[:, None, None], Hpp, jnp.broadcast_to(jnp.eye(3), Hpp.shape))
    bp = jnp.where(pt_opt[:, None], bp, 0.0)
    if jax.default_backend() == "tpu":
        # closed-form tiny-block linalg (generic batched LU/cholesky
        # lowerings are slow on TPU; see _inv3x3/_chol3x3)
        Hpp_inv = _inv3x3(Hpp)
        L = _chol3x3(0.5 * (Hpp_inv + jnp.swapaxes(Hpp_inv, -1, -2))
                     + 1e-12 * jnp.broadcast_to(jnp.eye(3), Hpp.shape))
    else:
        Hpp_inv = jnp.linalg.inv(Hpp)
        L = jnp.linalg.cholesky(
            0.5 * (Hpp_inv + jnp.swapaxes(Hpp_inv, -1, -2))
            + 1e-12 * jnp.broadcast_to(jnp.eye(3), Hpp.shape)
        )
        L = jnp.where(jnp.isfinite(L), L, 0.0)

    # camera blocks and rhs, in the COMPACT space (dump slot Kl for dead
    # edges and edges to fixed/overflow cameras); legacy: full capacity,
    # dead edges dumped, fixed-camera edges land in their own (zero) rows
    if compact:
        kf_idx = jnp.where((w > 0) & cam_is_opt, local_id[obs_kf_safe], Kl)
    else:
        kf_idx = jnp.where(w > 0, obs_kf, Kk)

    # Schur: C[p,o] = Jc^T W Jp ; D = C @ L ; S -= D_o D_o'^T
    C = jnp.einsum("pokx,poky->poxy", wJc, Jp)  # [P,O,6,3]
    C = C * pt_opt[:, None, None, None]
    D = jnp.einsum("poxy,pyz->poxz", C, L)      # [P,O,6,3]
    Hib = jnp.einsum("pxy,py->px", Hpp_inv, bp)  # [P,3]
    bred_contrib = jnp.einsum("poxy,py->pox", C, Hib)

    if jax.default_backend() == "tpu":
        # MXU assembly of the reduced camera system. TPU scatter-add is
        # serialized enough that the O^2 Schur accumulation measured
        # 1.6 s/iteration at production shapes (P=16k, O=32, Kl=80,
        # scripts/profile_ba.py); the same sums as one-hot segment
        # matmuls cost ~10-100 ms. Precision.HIGHEST keeps the f32
        # operands effectively exact through the MXU (single-pass-bf16
        # rounding of the normal equations measurably degraded BA
        # convergence: ~4e-2 pose drift vs the scatter path; HIGHEST
        # brings it to ~1e-3 at ~6x the matmul cost — still two orders
        # under the scatter). The CPU path below keeps the exact f32
        # scatters (tests are CPU; bit-stable round-2 behavior).
        hi = jax.lax.Precision.HIGHEST
        E = jax.nn.one_hot(kf_idx, Kl + 1, dtype=jnp.float32)  # [P,O,Kl+1]
        JcJc = jnp.einsum("pokx,poky->poxy", wJc, Jc)
        Hcc = jnp.einsum("poa,poxy->axy", E, JcJc, precision=hi)
        bc_e = jnp.einsum("pokx,pok->pox", wJc, r)
        bc = jnp.einsum("poa,pox->ax", E, bc_e - bred_contrib, precision=hi)
        G = jnp.einsum("poa,poxz->paxz", E, D, precision=hi)
        S = -jnp.einsum("paxz,pbyz->abxy", G, G, precision=hi)
    else:
        Hcc = jnp.zeros((Kl + 1, 6, 6))
        bc = jnp.zeros((Kl + 1, 6))
        Hcc = Hcc.at[kf_idx].add(jnp.einsum("pokx,poky->poxy", wJc, Jc))
        bc = bc.at[kf_idx].add(jnp.einsum("pokx,pok->pox", wJc, r))

        S = jnp.zeros((Kl + 1, Kl + 1, 6, 6))
        for o2 in range(O):
            V = jnp.einsum("poxz,pyz->poxy", D, D[:, o2])  # [P,O,6,6]
            cols = jnp.broadcast_to(kf_idx[:, o2 : o2 + 1], kf_idx.shape)
            S = S.at[kf_idx, cols].add(-V)
        # reduced rhs: bc_red = bc - sum_o C Hpp^-1 bp
        bc = bc.at[kf_idx].add(-bred_contrib)

    if axis_name is not None:
        # >>> the collective: reduce partial normal equations over shards
        Hcc = jax.lax.psum(Hcc, axis_name)
        S = jax.lax.psum(S, axis_name)
        bc = jax.lax.psum(bc, axis_name)

    H = S.at[jnp.arange(Kl + 1), jnp.arange(Kl + 1)].add(Hcc)
    H = H[:Kl, :Kl]
    b = bc[:Kl]

    if compact:
        # every compact slot is an optimized camera; empty (padding) slots
        # get identity rows, live ones the LM diagonal boost
        H = H.at[jnp.arange(Kl), jnp.arange(Kl)].add(
            jnp.where(slot_used, damping, 1.0)[:, None, None]
            * jnp.eye(6)[None]
        )
        b = jnp.where(slot_used[:, None], b, 0.0)
    else:
        # fixed / unused cameras: identity rows
        diag_boost = jnp.where(cam_opt, damping, 0.0)
        H = H.at[jnp.arange(Kl), jnp.arange(Kl)].add(
            diag_boost[:, None, None] * jnp.eye(6)[None]
        )
        fixed = ~cam_opt
        H = jnp.where(fixed[:, None, None, None], 0.0, H)
        H = jnp.where(fixed[None, :, None, None], 0.0, H)
        H = H.at[jnp.arange(Kl), jnp.arange(Kl)].add(
            fixed[:, None, None] * jnp.eye(6)[None]
        )
        b = jnp.where(fixed[:, None], 0.0, b)

    Hd = H.transpose(0, 2, 1, 3).reshape(Kl * 6, Kl * 6)
    bd = b.reshape(Kl * 6)
    dxc = jnp.linalg.solve(Hd, -bd).reshape(Kl, 6)
    dxc = jnp.where(jnp.isfinite(dxc), dxc, 0.0)
    if compact:
        dxc = dxc * slot_used[:, None]

    # back-substitute points: dxp = Hpp^-1 (-bp - sum_o C^T dxc_kf)
    dxc_pad = jnp.concatenate([dxc, jnp.zeros((1, 6))], axis=0)
    Ct_dx = jnp.einsum("poxy,pox->py", C, dxc_pad[kf_idx])
    dxp = jnp.einsum("pxy,py->px", Hpp_inv, -bp - Ct_dx)
    dxp = jnp.where(jnp.isfinite(dxp), dxp, 0.0)
    dxp = dxp * pt_opt[:, None]

    if compact:
        # scatter compact camera updates back to global slots
        dxc_g = jnp.zeros((Kk, 6)).at[opt_cams].add(
            dxc * slot_used[:, None])
    else:
        dxc_g = dxc
    new_pose = jnp.where(
        cam_opt[:, None, None],
        jax.vmap(se3_exp)(dxc_g) @ kf_pose,
        kf_pose,
    )
    new_pts = pt_pos + dxp
    return new_pose, new_pts


def _edge_chi2(kf_pose, pt_pos, obs_kf, uv, K_mat, inv_sigma2):
    r, _, _, z = _edge_terms(kf_pose, pt_pos, obs_kf, uv, K_mat)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    return chi2, z


def _ba_core(kf_pose, pt_pos, obs_kf, uv, inv_sigma2, edge_on,
             cam_opt, pt_opt, K_mat, *, iters1, iters2, damping,
             axis_name=None, Kl=None):
    """The BA solver body, shared by the single-device and sharded paths.

    All [P,...] arrays (pt_pos, obs_kf, uv, inv_sigma2, edge_on, pt_opt)
    may be per-shard slices when called inside shard_map with `axis_name`
    set; kf_pose/cam_opt/K_mat are replicated and the reduced camera
    system is psum'd (see _solve_iteration)."""

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def robust_from_chi2(chi2, z, edge_on):
        e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        rho = jnp.where(e <= HUBER_DELTA, chi2,
                        2.0 * HUBER_DELTA * e - HUBER_DELTA ** 2)
        return psum(jnp.sum(rho * (edge_on & (z > 0))))

    def robust_cost(kf_pose, pt_pos, edge_on):
        """Total Huber cost over active edges (the LM acceptance metric)."""
        chi2, z = _edge_chi2(kf_pose, pt_pos, obs_kf, uv, K_mat, inv_sigma2)
        return robust_from_chi2(chi2, z, edge_on)

    def phase(carry, n_iters, gate_chi2):
        # adaptive-lambda Levenberg-Marquardt (the reference's g2o
        # OptimizationAlgorithmLevenberg, Optimizer.cc:56): each iteration
        # proposes a step at the current lambda, accepts it only if the
        # robust cost decreases (lambda /= 2), else rejects and retries
        # stiffer (lambda *= 10). Fixed-damping GN diverges on
        # ill-conditioned local geometry (measured: a curved-trajectory KF
        # blew 614/800 edges past the chi2 gate in one phase).
        #
        # Early exit (round 4): LM at keyframe rate usually converges in
        # 2-4 iterations from the incremental prior; the fixed 5+10
        # schedule paid ~3x idle iterations per keyframe. The loop stops
        # once an ACCEPTED step improves the robust cost by < 1e-4
        # relative, or lambda escalates to its ceiling (hopeless local
        # geometry) — g2o's own terminate criterion is the same gain
        # threshold idea. The condition is computed from the psum'd cost,
        # so it is uniform across shards in the sharded path.
        kf_pose, pt_pos, edge_on, lam = carry

        def cond(c):
            i, _, _, lam_c, done = c
            return (i < n_iters) & ~done

        def step(c):
            i, kf_pose, pt_pos, lam, done = c
            # ONE edge pass serves the IRLS weights, the acceptance
            # reference cost AND the solve's residuals/Jacobians (the
            # terms at (kf_pose, pt_pos) are identical in all three —
            # previously computed 3x per iteration)
            terms = _edge_terms(kf_pose, pt_pos, obs_kf, uv, K_mat)
            r, _, _, z = terms
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_huber = jnp.where(e <= HUBER_DELTA, 1.0, HUBER_DELTA / e)
            w = inv_sigma2 * w_huber * edge_on * (z > 0)
            new_pose, new_pts = _solve_iteration(
                kf_pose, pt_pos, w, obs_kf, uv,
                K_mat, cam_opt, pt_opt, lam, axis_name=axis_name, Kl=Kl,
                terms=terms)
            cost0 = robust_from_chi2(chi2, z, edge_on)
            cost1 = robust_cost(new_pose, new_pts, edge_on)
            accept = cost1 < cost0
            rel_gain = (cost0 - cost1) / jnp.maximum(cost0, 1e-12)
            kf_pose = jnp.where(accept, new_pose, kf_pose)
            pt_pos = jnp.where(accept, new_pts, pt_pos)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0),
                           1e-9, 1e6)
            done = (accept & (rel_gain < 1e-4)) | (~accept & (lam >= 1e6))
            return (i + 1, kf_pose, pt_pos, lam, done)

        _, kf_pose, pt_pos, lam, _ = jax.lax.while_loop(
            cond, step,
            (jnp.int32(0), kf_pose, pt_pos, lam, jnp.bool_(False)))
        chi2, z = _edge_chi2(kf_pose, pt_pos, obs_kf, uv, K_mat, inv_sigma2)
        edge_on = edge_on & (chi2 <= gate_chi2) & (z > 0)
        return (kf_pose, pt_pos, edge_on, lam)

    carry = (kf_pose, pt_pos, edge_on, jnp.float32(damping))
    carry = phase(carry, iters1, CHI2_MONO)
    carry = phase(carry, iters2, CHI2_MONO)
    kf_pose, pt_pos, edge_in, _ = carry
    return kf_pose, pt_pos, edge_in


def _ba_inputs(state: MapState, pt_opt, scale_factor: float = 1.2):
    """Observation table + per-edge uv / information / initial mask.
    scale_factor sets the per-octave information weights (the reference
    reads mvInvLevelSigma2 from the extractor settings, Optimizer.cc:120)."""
    obs_kf, obs_feat, obs_valid = observation_table(state)
    Kk, N = state.kf_xy.shape[0], state.kf_xy.shape[1]
    kf_safe = jnp.clip(obs_kf, 0, Kk - 1)
    feat_safe = jnp.clip(obs_feat, 0, N - 1)
    uv = state.kf_xy[kf_safe, feat_safe]
    octv = state.kf_octave[kf_safe, feat_safe]
    inv_sigma2 = 1.0 / (scale_factor ** (2.0 * octv.astype(jnp.float32)))
    edge_on = obs_valid & pt_opt[:, None]
    return obs_kf, obs_feat, obs_valid, uv, inv_sigma2, edge_on


@partial(fused_jit, static_argnames=("iters1", "iters2", "Kl", "Pl",
                                     "scale_factor"))
def _bundle_adjust_single(state, K_mat, cam_opt, pt_opt, iters1, iters2,
                          damping, Kl=None, Pl=None, scale_factor=1.2):
    # HIGHEST matmul precision throughout: TPU's DEFAULT f32 dot is a
    # single bf16 pass (~4e-3 relative), which measurably degrades the
    # normal equations and the recovered poses (~4e-2 pose drift vs the
    # CPU solver, round 3); HIGHEST restores f32-grade accuracy at
    # negligible cost for BA's small einsums.
    with jax.default_matmul_precision("highest"):
        obs_kf, obs_feat, obs_valid, uv, inv_sigma2, edge_on = _ba_inputs(
            state, pt_opt, scale_factor)
        if Pl is None:
            kf_pose, pt_pos, edge_in = _ba_core(
                state.kf_pose, state.pt_pos, obs_kf, uv, inv_sigma2, edge_on,
                cam_opt, pt_opt, K_mat, iters1=iters1, iters2=iters2,
                damping=damping, Kl=Kl)
            outlier = obs_valid & pt_opt[:, None] & ~edge_in
        else:
            # compact point space: every solver pass runs over [Pl, O]
            # instead of the full capacity [P, O] (see _point_compaction)
            opt_pts, slot_used = _point_compaction(pt_opt, Pl)
            kf_pose, pt_pos_c, edge_in_c = _ba_core(
                state.kf_pose, state.pt_pos[opt_pts], obs_kf[opt_pts],
                uv[opt_pts], inv_sigma2[opt_pts],
                edge_on[opt_pts] & slot_used[:, None],
                cam_opt, slot_used, K_mat, iters1=iters1, iters2=iters2,
                damping=damping, Kl=Kl)
            pt_pos = state.pt_pos.at[opt_pts].set(
                jnp.where(slot_used[:, None], pt_pos_c,
                          state.pt_pos[opt_pts]))
            P, O = obs_valid.shape
            outlier_c = obs_valid[opt_pts] & slot_used[:, None] & ~edge_in_c
            outlier = jnp.zeros((P, O), bool).at[opt_pts].set(outlier_c)
    new_state = state._replace(kf_pose=kf_pose, pt_pos=pt_pos)
    return new_state, outlier, (obs_kf, obs_feat)


_SHARDED_BA_CACHE = {}


def _bundle_adjust_sharded(mesh, iters1, iters2, Kl=None, Pl=None,
                           scale_factor=1.2):
    """Jitted sharded BA: points/edges sharded over the mesh's 'data' axis
    (each shard owns a block of the observation table), cameras replicated,
    one psum per solver iteration reduces the camera system over ICI.
    Pl: optional compact point space (see _point_compaction) — the gather
    runs replicated before shard_map; the [Pl] arrays then shard."""
    key = (mesh, iters1, iters2, Kl, Pl, scale_factor)
    if key in _SHARDED_BA_CACHE:
        return _SHARDED_BA_CACHE[key]
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as Pspec

    core = partial(_ba_core, iters1=iters1, iters2=iters2, axis_name="data",
                   Kl=Kl)

    def with_damping(kf_pose, pt_pos, obs_kf, uv, inv_sigma2, edge_on,
                     cam_opt, pt_opt, K_mat, damping):
        return core(kf_pose, pt_pos, obs_kf, uv, inv_sigma2, edge_on,
                    cam_opt, pt_opt, K_mat, damping=damping)

    D = Pspec("data")
    R = Pspec()
    sharded = shard_map(
        with_damping, mesh=mesh,
        in_specs=(R, D, D, D, D, D, R, D, R, R),
        out_specs=(R, D, D),
        check_vma=False,
    )

    @partial(fused_jit)
    def run(state, K_mat, cam_opt, pt_opt, damping):
        with jax.default_matmul_precision("highest"):  # see single-device
            obs_kf, obs_feat, obs_valid, uv, inv_sigma2, edge_on = \
                _ba_inputs(state, pt_opt, scale_factor)
            if Pl is None:
                kf_pose, pt_pos, edge_in = sharded(
                    state.kf_pose, state.pt_pos, obs_kf, uv, inv_sigma2,
                    edge_on, cam_opt, pt_opt, K_mat, jnp.float32(damping))
                outlier = obs_valid & pt_opt[:, None] & ~edge_in
            else:
                opt_pts, slot_used = _point_compaction(pt_opt, Pl)
                kf_pose, pt_pos_c, edge_in_c = sharded(
                    state.kf_pose, state.pt_pos[opt_pts], obs_kf[opt_pts],
                    uv[opt_pts], inv_sigma2[opt_pts],
                    edge_on[opt_pts] & slot_used[:, None],
                    cam_opt, slot_used, K_mat, jnp.float32(damping))
                pt_pos = state.pt_pos.at[opt_pts].set(
                    jnp.where(slot_used[:, None], pt_pos_c,
                              state.pt_pos[opt_pts]))
                P, O = obs_valid.shape
                outlier_c = (obs_valid[opt_pts] & slot_used[:, None]
                             & ~edge_in_c)
                outlier = jnp.zeros((P, O), bool).at[opt_pts].set(outlier_c)
        new_state = state._replace(kf_pose=kf_pose, pt_pos=pt_pos)
        return new_state, outlier, (obs_kf, obs_feat)

    _SHARDED_BA_CACHE[key] = run
    return run


def bundle_adjust(
    state: MapState,
    K_mat,
    cam_opt,
    pt_opt,
    iters1: int = 5,
    iters2: int = 10,
    damping: float = 1e-3,
    mesh=None,
    max_opt_cams: int | None = None,
    max_opt_pts: int | None = None,
    scale_factor: float = 1.2,
):
    """Run (local or global) BA over the MapState.

    cam_opt: [K] bool — cameras to optimize (fixed-boundary cameras False
    but still constrain points; invalid slots False).
    pt_opt: [P] bool — points to optimize; edges to non-opt points ignored
    (matches reference local-BA edge selection, Optimizer.cc:289-338).
    mesh: optional jax.sharding.Mesh with a 'data' axis — points/edges
    shard across it; results are identical to the single-device path
    (tests/test_parallel.py).
    max_opt_cams: static bound on |cam_opt| — the reduced camera system is
    built in a compact [max_opt_cams]-slot space, making the solve
    independent of the map's keyframe CAPACITY (local BA at K=4096 costs
    the same as at K=64). Cameras beyond the bound are treated as fixed.
    None = use full capacity (exact legacy shapes).
    max_opt_pts: static bound on |pt_opt| — every solver pass (edge terms,
    point blocks, Schur assembly) runs in a compact [max_opt_pts, O] space
    instead of the full point capacity (the round-3 bottleneck: ~8x wasted
    edge work at production shapes). Points beyond the bound stay fixed.
    None = full capacity (exact legacy shapes).
    Returns (new_state, edge_outlier [P, O] bool, obs table (kf, feat))."""
    P = state.pt_valid.shape[0]
    if max_opt_pts is not None and max_opt_pts >= P:
        max_opt_pts = None  # compaction would be a no-op permutation
    if mesh is None:
        return _bundle_adjust_single(state, K_mat, cam_opt, pt_opt,
                                     iters1, iters2, damping,
                                     Kl=max_opt_cams, Pl=max_opt_pts,
                                     scale_factor=scale_factor)
    n_data = mesh.shape["data"]
    P_sh = max_opt_pts if max_opt_pts is not None else P
    if P_sh % n_data:
        raise ValueError(
            f"bundle_adjust: point space {P_sh} must divide the mesh "
            f"'data' axis ({n_data})")
    return _bundle_adjust_sharded(mesh, iters1, iters2, Kl=max_opt_cams,
                                  Pl=max_opt_pts,
                                  scale_factor=scale_factor)(
        state, K_mat, cam_opt, pt_opt, damping)


@partial(fused_jit, static_argnames=("kill_starved",))
def apply_edge_outliers(state: MapState, outlier, obs_kf, obs_feat,
                        kill_starved: bool = True) -> MapState:
    """Unbind observations flagged as BA outliers (reference erases the
    observation both ways, Optimizer.cc:497-515).

    kill_starved: a point that had an observation ejected and is left with
    <= 2 observations dies entirely (MapPoint::EraseObservation ->
    SetBadFlag, reference MapPoint.cc:93-103) — this is the reference's
    cleanup path for MATURE bad points, which the age-gated MapPointCulling
    no longer touches. False for the init global BA (the reference's
    GlobalBundleAdjustemnt has no ejection step at all)."""
    Kk, N = state.kf_obs.shape
    rows = jnp.where(outlier, obs_kf, Kk)  # dump row
    cols = jnp.clip(obs_feat, 0, N - 1)
    obs = jnp.concatenate([state.kf_obs, jnp.full((1, N), -1, jnp.int32)], 0)
    obs = obs.at[rows, cols].set(jnp.where(outlier, -1, obs[rows, cols]))
    obs = obs[:Kk]
    if not kill_starved:
        return state._replace(kf_obs=obs)
    P = state.pt_valid.shape[0]
    remaining = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(obs >= 0, obs, P)
    ].add((obs >= 0) & state.kf_valid[:, None])[:P]
    had_ejection = jnp.any(outlier, axis=1)  # outlier rows are point slots
    killed = state.pt_valid & had_ejection & (remaining <= 2)
    obs = jnp.where(
        (obs >= 0) & killed[jnp.clip(obs, 0, P - 1)], -1, obs
    )
    return state._replace(kf_obs=obs, pt_valid=state.pt_valid & ~killed)
