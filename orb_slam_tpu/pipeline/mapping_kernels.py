"""Jitted local-mapping kernels: new-point triangulation, fuse, culling.

Replaces LocalMapping's per-keyframe work (reference: src/LocalMapping.cc):
  * CreateNewMapPoints (205-371): epipolar-gated dense matching between the
    new KF and a covisible neighbor + SVD triangulation + the 6 acceptance
    gates — here one fused kernel per KF pair, batched over all N features;
  * SearchInNeighbors / Fuse (373-450, ORBmatcher.cc:1016-1134): projection
    fuse as a dense masked match + winner-by-observation-count merge;
  * MapPointCulling (175-203) and KeyFrameCulling (524-578): dense statistics
    the host turns into kill decisions."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry.triangulation import triangulate_dlt
from orb_slam_tpu.ops.matching import match, TH_LOW, TH_HIGH
from orb_slam_tpu.slam_map.map_state import MapState
from orb_slam_tpu.slam_map.observations import observation_table
from orb_slam_tpu.utils.dispatch import fused_jit, precise_jit

CHI2_2D = 5.991


def _fundamental_from_poses(T_a, T_b, K_mat):
    """F_ab with x_b^T F x_a = 0, from world->cam poses (replaces
    LocalMapping::ComputeF12, src/LocalMapping.cc:452-469)."""
    T_ba = T_b @ jnp.linalg.inv(T_a)
    R = T_ba[:3, :3]
    t = T_ba[:3, 3]
    tx = jnp.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
    )
    Kinv = jnp.linalg.inv(K_mat)
    return Kinv.T @ tx @ R @ Kinv


class TriangulationCandidates(NamedTuple):
    pos: jnp.ndarray       # [N,3] world positions
    feat_a: jnp.ndarray    # [N] feature index in kf_a
    feat_b: jnp.ndarray    # [N] feature index in kf_b
    valid: jnp.ndarray     # [N] bool


@partial(precise_jit, static_argnames=("scale_factor",))
def triangulate_new_points(
    state: MapState, kf_a, kf_b, K_mat, scale_factor: float = 1.2
) -> TriangulationCandidates:
    """Match UNBOUND features of kf_a against unbound features of kf_b under
    the epipolar constraint, triangulate, and gate.

    Gates (reference: src/LocalMapping.cc:269-352): positive depth both
    views, parallax, reprojection chi2 < 5.991 sigma^2 both views, scale
    consistency ratio."""
    N = state.kf_obs.shape[1]
    fx, fy = K_mat[0, 0], K_mat[1, 1]
    cx, cy = K_mat[0, 2], K_mat[1, 2]

    T_a, T_b = state.kf_pose[kf_a], state.kf_pose[kf_b]
    xy_a, xy_b = state.kf_xy[kf_a], state.kf_xy[kf_b]
    oct_a, oct_b = state.kf_octave[kf_a], state.kf_octave[kf_b]
    free_a = (state.kf_obs[kf_a] < 0) & state.kf_feat_valid[kf_a]
    free_b = (state.kf_obs[kf_b] < 0) & state.kf_feat_valid[kf_b]

    # epipolar gate: distance of x_b to line F x_a, threshold 3.84 sigma^2_b
    # (ORBmatcher::CheckDistEpipolarLine, src/ORBmatcher.cc:136-153)
    F = _fundamental_from_poses(T_a, T_b, K_mat)
    ha = jnp.concatenate([xy_a, jnp.ones((N, 1))], axis=1)  # [N,3]
    lines = ha @ F.T  # [N,3] line coeffs in image b
    num = lines[:, None, 0] * xy_b[None, :, 0] + lines[:, None, 1] * xy_b[None, :, 1] + lines[:, None, 2:3][:, :, 0]
    den = jnp.maximum(lines[:, 0] ** 2 + lines[:, 1] ** 2, 1e-12)[:, None]
    epi_d2 = num * num / den
    sigma2_b = scale_factor ** (2.0 * oct_b.astype(jnp.float32))
    gate = epi_d2 < 3.84 * sigma2_b[None, :]

    best_idx, best_dist, matched = match(
        state.kf_desc[kf_a],
        state.kf_desc[kf_b],
        allowed=gate,
        valid_a=free_a,
        valid_b=free_b,
        max_dist=TH_LOW,
        nn_ratio=1.0,
        unique=True,
    )

    # triangulate all rows (masked later)
    xn_a = jnp.stack([(xy_a[:, 0] - cx) / fx, (xy_a[:, 1] - cy) / fy], -1)
    xb = xy_b[best_idx]
    xn_b = jnp.stack([(xb[:, 0] - cx) / fx, (xb[:, 1] - cy) / fy], -1)
    Pa = T_a[:3, :4]
    Pb = T_b[:3, :4]
    X = triangulate_dlt(
        xn_a, xn_b,
        jnp.broadcast_to(Pa, (N, 3, 4)),
        jnp.broadcast_to(Pb, (N, 3, 4)),
    )
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    X = jnp.where(finite[:, None], X, 0.0)

    # gates
    Ca = -T_a[:3, :3].T @ T_a[:3, 3]
    Cb = -T_b[:3, :3].T @ T_b[:3, 3]
    r_a = X - Ca
    r_b = X - Cb
    na = jnp.linalg.norm(r_a, axis=-1)
    nb = jnp.linalg.norm(r_b, axis=-1)
    cos_par = jnp.sum(r_a * r_b, axis=-1) / jnp.maximum(na * nb, 1e-12)
    parallax_ok = cos_par < 0.9998

    pca = X @ T_a[:3, :3].T + T_a[:3, 3]
    pcb = X @ T_b[:3, :3].T + T_b[:3, 3]
    depth_ok = (pca[:, 2] > 0) & (pcb[:, 2] > 0)

    za = jnp.where(jnp.abs(pca[:, 2]) < 1e-9, 1e-9, pca[:, 2])
    zb = jnp.where(jnp.abs(pcb[:, 2]) < 1e-9, 1e-9, pcb[:, 2])
    ua = fx * pca[:, 0] / za + cx
    va = fy * pca[:, 1] / za + cy
    ub = fx * pcb[:, 0] / zb + cx
    vb = fy * pcb[:, 1] / zb + cy
    sigma2_a = scale_factor ** (2.0 * oct_a.astype(jnp.float32))
    e_a = (ua - xy_a[:, 0]) ** 2 + (va - xy_a[:, 1]) ** 2
    e_b = (ub - xb[:, 0]) ** 2 + (vb - xb[:, 1]) ** 2
    reproj_ok = (e_a < CHI2_2D * sigma2_a) & (
        e_b < CHI2_2D * sigma2_b[best_idx]
    )

    # scale consistency (LocalMapping.cc:335-352)
    ratio_dist = na / jnp.maximum(nb, 1e-12)
    ratio_oct = scale_factor ** (
        (oct_a - oct_b[best_idx]).astype(jnp.float32)
    )
    ratio_factor = 1.5 * scale_factor
    scale_ok = (ratio_dist * ratio_factor > ratio_oct) & (
        ratio_dist < ratio_oct * ratio_factor
    )

    valid = matched & finite & parallax_ok & depth_ok & reproj_ok & scale_ok
    return TriangulationCandidates(
        pos=X,
        feat_a=jnp.arange(N, dtype=jnp.int32),
        feat_b=best_idx,
        valid=valid,
    )


@fused_jit
def insert_new_points(
    state: MapState, kf_a, kf_b, cand: TriangulationCandidates, free_slots
):
    """Allocate slots for valid candidates and bind both observations.
    free_slots: [F] i32 unused point slots from the host allocator (-1 pad).
    Returns (new_state, n_created)."""
    N = cand.valid.shape[0]
    P = state.pt_valid.shape[0]
    F_cap = free_slots.shape[0]
    rank = jnp.cumsum(cand.valid.astype(jnp.int32)) - 1
    has_slot = cand.valid & (rank < F_cap) & (rank >= 0)
    slot = jnp.where(has_slot, free_slots[jnp.clip(rank, 0, F_cap - 1)], -1)
    slot = jnp.where(slot >= 0, slot, -1)
    active = has_slot & (slot >= 0)

    # write points
    slot_safe = jnp.where(active, slot, P)  # dump row
    pt_pos = jnp.concatenate([state.pt_pos, jnp.zeros((1, 3))], 0)
    pt_pos = pt_pos.at[slot_safe].set(jnp.where(active[:, None], cand.pos, pt_pos[slot_safe]))
    pt_valid = jnp.concatenate([state.pt_valid, jnp.zeros((1,), bool)], 0)
    pt_valid = pt_valid.at[slot_safe].set(active | pt_valid[slot_safe])
    desc_a = state.kf_desc[kf_a]
    pt_desc = jnp.concatenate([state.pt_desc, jnp.zeros((1, 8), jnp.uint32)], 0)
    pt_desc = pt_desc.at[slot_safe].set(
        jnp.where(active[:, None], desc_a, pt_desc[slot_safe])
    )
    pt_ref = jnp.concatenate([state.pt_ref_kf, jnp.full((1,), -1, jnp.int32)], 0)
    pt_ref = pt_ref.at[slot_safe].set(jnp.where(active, kf_a, pt_ref[slot_safe]))
    pt_first = jnp.concatenate([state.pt_first_kf, jnp.full((1,), -1, jnp.int32)], 0)
    pt_first = pt_first.at[slot_safe].set(jnp.where(active, kf_a, pt_first[slot_safe]))
    pt_vis = jnp.concatenate([state.pt_visible, jnp.zeros((1,), jnp.int32)], 0)
    pt_vis = pt_vis.at[slot_safe].set(jnp.where(active, 1, pt_vis[slot_safe]))
    pt_fnd = jnp.concatenate([state.pt_found, jnp.zeros((1,), jnp.int32)], 0)
    pt_fnd = pt_fnd.at[slot_safe].set(jnp.where(active, 1, pt_fnd[slot_safe]))

    # bind observations in both keyframes
    obs = state.kf_obs
    row_a = obs[kf_a].at[cand.feat_a].set(
        jnp.where(active, slot, obs[kf_a][cand.feat_a])
    )
    obs = obs.at[kf_a].set(row_a)
    feat_b_safe = jnp.clip(cand.feat_b, 0, obs.shape[1] - 1)
    row_b = obs[kf_b]
    row_b = row_b.at[feat_b_safe].set(
        jnp.where(active, slot, row_b[feat_b_safe])
    )
    obs = obs.at[kf_b].set(row_b)

    new_state = state._replace(
        pt_pos=pt_pos[:P],
        pt_valid=pt_valid[:P],
        pt_desc=pt_desc[:P],
        pt_ref_kf=pt_ref[:P],
        pt_first_kf=pt_first[:P],
        pt_visible=pt_vis[:P],
        pt_found=pt_fnd[:P],
        kf_obs=obs,
    )
    return new_state, jnp.sum(active)


@partial(fused_jit, static_argnames=("width", "height", "scale_factor",
                                     "n_levels", "bounds"))
def fuse_into_keyframe(state: MapState, src_kf, dst_kf, K_mat,
                       width: int = 640, height: int = 480,
                       scale_factor: float = 1.2, n_levels: int = 8,
                       bounds=None):
    """Project src_kf's bound points into dst_kf, match, then either bind
    unbound features or MERGE duplicate points (keep the one with more
    observations; rebind the loser everywhere). Replaces ORBmatcher::Fuse +
    MapPoint::Replace (ORBmatcher.cc:1016-1134, MapPoint.cc:124-158)."""
    N = state.kf_obs.shape[1]
    P = state.pt_valid.shape[0]
    pids = state.kf_obs[src_kf]  # [N] point ids bound in src
    pid_safe = jnp.clip(pids, 0, P - 1)
    is_pt = (pids >= 0) & state.pt_valid[pid_safe]

    T_dst = state.kf_pose[dst_kf]
    pos = state.pt_pos[pid_safe]
    pc = pos @ T_dst[:3, :3].T + T_dst[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K_mat[0, 0] * pc[:, 0] / zs + K_mat[0, 2]
    v = K_mat[1, 1] * pc[:, 1] / zs + K_mat[1, 2]
    proj = jnp.stack([u, v], -1)
    # undistorted image bounds (Frame.cc:321-349; kf_xy are undistorted)
    mnx, mxx, mny, mxy = bounds if bounds is not None else (
        0.0, float(width), 0.0, float(height))
    in_img = (z > 0) & (u >= mnx) & (u < mxx) & (v >= mny) & (v < mxy)

    C = -T_dst[:3, :3].T @ T_dst[:3, 3]
    dist = jnp.linalg.norm(pos - C, axis=-1)
    band_ok = (dist >= 0.8 * state.pt_min_dist[pid_safe]) & (
        dist <= 1.2 * state.pt_max_dist[pid_safe]
    )
    candidate = is_pt & in_img & band_ok

    # gate: 3 sigma radius by predicted level (Fuse uses th=3.0 * scale)
    ratio = jnp.maximum(state.pt_max_dist[pid_safe], 1e-9) / jnp.maximum(dist, 1e-9)
    pred = jnp.clip(
        jnp.ceil(
            jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor)
        ).astype(jnp.int32),
        0, n_levels - 1,
    )
    r = 3.0 * scale_factor ** pred.astype(jnp.float32)
    xy_dst = state.kf_xy[dst_kf]
    d = proj[:, None, :] - xy_dst[None, :, :]
    gate = jnp.sum(d * d, -1) <= (r * r)[:, None]
    oct_dst = state.kf_octave[dst_kf]
    gate &= (oct_dst[None, :] >= pred[:, None] - 1) & (
        oct_dst[None, :] <= pred[:, None] + 1
    )

    best_idx, best_dist, matched = match(
        state.pt_desc[pid_safe],
        state.kf_desc[dst_kf],
        allowed=gate,
        valid_a=candidate,
        valid_b=state.kf_feat_valid[dst_kf],
        max_dist=TH_LOW,
        nn_ratio=1.0,
        unique=True,
    )

    obs_counts = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(state.kf_obs >= 0, state.kf_obs, P)
    ].add(state.kf_obs >= 0)[:P]

    dst_bound = state.kf_obs[dst_kf][best_idx]  # [N] existing binding
    dst_bound_safe = jnp.clip(dst_bound, 0, P - 1)
    has_existing = matched & (dst_bound >= 0) & state.pt_valid[dst_bound_safe] & (dst_bound != pids)

    # case 1: bind free features to src point
    bind_free = matched & (dst_bound < 0)
    row = state.kf_obs[dst_kf]
    row = row.at[best_idx].set(jnp.where(bind_free, pids, row[best_idx]))
    obs_all = state.kf_obs.at[dst_kf].set(row)

    # case 2: merge duplicates — winner = more observations
    src_wins = obs_counts[pid_safe] >= obs_counts[dst_bound_safe]
    loser = jnp.where(src_wins, dst_bound, pids)
    winner = jnp.where(src_wins, pids, dst_bound)
    # build replacement map
    remap = jnp.arange(P, dtype=jnp.int32)
    loser_safe = jnp.where(has_existing, loser, P)
    remap_pad = jnp.concatenate([remap, jnp.full((1,), -1, jnp.int32)])
    remap_pad = remap_pad.at[loser_safe].set(
        jnp.where(has_existing, winner, -1)
    )
    remap = remap_pad[:P]
    killed = remap != jnp.arange(P)
    # resolve chained merges transitively (remap[Y]=X while remap[X]=Z must
    # send Y's observations to Z, not to the killed slot X): pointer-doubling,
    # log2(P) gathers. Mutual-kill cycles (ties) collapse to identity and are
    # cleared below.
    n_doubling = max(P.bit_length(), 1)
    for _ in range(n_doubling):
        remap = remap[remap]
    # apply remap to all observations, kill losers
    obs_remapped = jnp.where(
        obs_all >= 0, remap[jnp.clip(obs_all, 0, P - 1)], -1
    )
    # clear observations whose final target is itself killed (cycle case)
    obs_remapped = jnp.where(
        (obs_remapped >= 0) & killed[jnp.clip(obs_remapped, 0, P - 1)],
        -1, obs_remapped,
    )
    pt_valid = state.pt_valid & ~killed

    # inherit found/visible counters (Replace adds them to the winner)
    add_vis = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(killed, remap, P)
    ].add(jnp.where(killed, state.pt_visible, 0))[:P]
    add_fnd = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(killed, remap, P)
    ].add(jnp.where(killed, state.pt_found, 0))[:P]

    # the resolved remap is also returned so callers can maintain a
    # persistent forwarding table for stale point ids held OUTSIDE the map
    # (queued async keyframes) — the reference's MapPoint::Replace keeps
    # mpReplaced pointers for exactly this (MapPoint.cc:124-158)
    remap_out = jnp.where(killed & killed[jnp.clip(remap, 0, P - 1)],
                          -1, remap)
    return state._replace(
        kf_obs=obs_remapped,
        pt_valid=pt_valid,
        pt_visible=state.pt_visible + add_vis,
        pt_found=state.pt_found + add_fnd,
    ), jnp.sum(bind_free), jnp.sum(has_existing), remap_out


@partial(fused_jit, static_argnames=("width", "height", "scale_factor",
                                     "n_levels", "bounds"))
def fuse_points_into_keyframes(state: MapState, pt_mask, dst_kfs, K_mat,
                               width: int = 640, height: int = 480,
                               scale_factor: float = 1.2, n_levels: int = 8,
                               bounds=None):
    """SearchAndFuse (reference: src/LoopClosing.cc:557-570 +
    ORBmatcher::Fuse(KF, Scw, ...), src/ORBmatcher.cc:1136-1265): project a
    point SET (pt_mask, the loop neighborhood's mvpLoopMapPoints) into
    EVERY keyframe of dst_kfs and bind/merge duplicates — ONE device
    dispatch (a lax.scan over destinations) instead of one kernel per
    (src, dst) pair. dst_kfs: [G] i32 keyframe slots, -1 = no-op padding.

    Merge semantics match fuse_into_keyframe: an unbound matched feature is
    bound to the projected point; a bound one merges, the point with more
    observations winning (MapPoint::Replace). Returns (new_state,
    remap [P] i32) where remap composes all per-destination merges for the
    host's forwarding table."""
    P = state.pt_valid.shape[0]
    N = state.kf_obs.shape[1]

    def one_dst(carry, dst_kf):
        st, remap_acc = carry
        valid_dst = dst_kf >= 0
        dst = jnp.maximum(dst_kf, 0)

        T_dst = st.kf_pose[dst]
        pc = st.pt_pos @ T_dst[:3, :3].T + T_dst[:3, 3]
        z = pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = K_mat[0, 0] * pc[:, 0] / zs + K_mat[0, 2]
        v = K_mat[1, 1] * pc[:, 1] / zs + K_mat[1, 2]
        proj = jnp.stack([u, v], -1)
        mnx, mxx, mny, mxy = bounds if bounds is not None else (
            0.0, float(width), 0.0, float(height))
        in_img = (z > 0) & (u >= mnx) & (u < mxx) & (v >= mny) & (v < mxy)

        C = -T_dst[:3, :3].T @ T_dst[:3, 3]
        dist = jnp.linalg.norm(st.pt_pos - C, axis=-1)
        # bare scale band — Fuse(Scw) has no 0.8/1.2 slack
        # (ORBmatcher.cc:1178-1181)
        band_ok = (dist >= st.pt_min_dist) & (dist <= st.pt_max_dist)
        # viewing angle < 60 deg (ORBmatcher.cc:1188-1191)
        rays = st.pt_pos - C
        view_ok = jnp.sum(rays * st.pt_normal, axis=-1) > 0.5 * dist
        # skip points the destination already observes (pAlreadyFound /
        # IsInKeyFrame check, ORBmatcher.cc:1163)
        dst_obs = st.kf_obs[dst]
        already = jnp.zeros((P + 1,), bool).at[
            jnp.where(dst_obs >= 0, dst_obs, P)].set(True)[:P]
        candidate = (st.pt_valid & pt_mask & valid_dst & in_img & band_ok
                     & view_ok & ~already)

        ratio = jnp.maximum(st.pt_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
        pred = jnp.clip(
            jnp.ceil(
                jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor)
            ).astype(jnp.int32),
            0, n_levels - 1)
        # Fuse(Scw) uses radius 4.0 * scale (ORBmatcher.cc:1199)
        r = 4.0 * scale_factor ** pred.astype(jnp.float32)
        xy_dst = st.kf_xy[dst]
        d = proj[:, None, :] - xy_dst[None, :, :]
        gate = jnp.sum(d * d, -1) <= (r * r)[:, None]
        oct_dst = st.kf_octave[dst]
        gate &= (oct_dst[None, :] >= pred[:, None] - 1) & (
            oct_dst[None, :] <= pred[:, None] + 1)

        best_idx, best_dist, matched = match(
            st.pt_desc, st.kf_desc[dst],
            allowed=gate, valid_a=candidate,
            valid_b=st.kf_feat_valid[dst],
            max_dist=TH_LOW, nn_ratio=1.0, unique=True,
        )

        pids = jnp.arange(P, dtype=jnp.int32)  # src point per row

        dst_bound = st.kf_obs[dst][best_idx]
        dst_bound_safe = jnp.clip(dst_bound, 0, P - 1)
        has_existing = (matched & (dst_bound >= 0)
                        & st.pt_valid[dst_bound_safe] & (dst_bound != pids))

        # bind free features
        bind_free = matched & (dst_bound < 0)
        row = st.kf_obs[dst]
        row = row.at[best_idx].set(jnp.where(bind_free, pids, row[best_idx]))
        obs_all = st.kf_obs.at[dst].set(row)

        # merge duplicates — the LOOP point always wins: the reference
        # replaces the keyframe's existing point with the loop map point
        # unconditionally (pRep->Replace(mvpLoopMapPoints[i]),
        # LoopClosing.cc:565-570)
        loser = dst_bound
        winner = pids
        remap = jnp.arange(P, dtype=jnp.int32)
        loser_safe = jnp.where(has_existing, loser, P)
        remap_pad = jnp.concatenate([remap, jnp.full((1,), -1, jnp.int32)])
        remap_pad = remap_pad.at[loser_safe].set(
            jnp.where(has_existing, winner, -1))
        remap = remap_pad[:P]
        killed = remap != jnp.arange(P)
        n_doubling = max(P.bit_length(), 1)
        for _ in range(n_doubling):
            remap = remap[remap]
        obs_remapped = jnp.where(
            obs_all >= 0, remap[jnp.clip(obs_all, 0, P - 1)], -1)
        obs_remapped = jnp.where(
            (obs_remapped >= 0) & killed[jnp.clip(obs_remapped, 0, P - 1)],
            -1, obs_remapped)
        pt_valid = st.pt_valid & ~killed

        add_vis = jnp.zeros((P + 1,), jnp.int32).at[
            jnp.where(killed, remap, P)
        ].add(jnp.where(killed, st.pt_visible, 0))[:P]
        add_fnd = jnp.zeros((P + 1,), jnp.int32).at[
            jnp.where(killed, remap, P)
        ].add(jnp.where(killed, st.pt_found, 0))[:P]

        st = st._replace(
            kf_obs=obs_remapped,
            pt_valid=pt_valid,
            pt_visible=st.pt_visible + add_vis,
            pt_found=st.pt_found + add_fnd,
        )
        # compose this destination's merge into the running forward table
        step_fwd = jnp.where(killed & killed[jnp.clip(remap, 0, P - 1)],
                             -1, remap)
        acc_ok = remap_acc >= 0
        remap_acc = jnp.where(
            acc_ok, step_fwd[jnp.clip(remap_acc, 0, P - 1)], -1)
        return (st, remap_acc), None

    remap0 = jnp.arange(P, dtype=jnp.int32)
    (new_state, remap_out), _ = jax.lax.scan(
        one_dst, (state, remap0), dst_kfs)
    return new_state, remap_out


@fused_jit
def point_cull_stats(state: MapState, current_kf_counter):
    """Per-point statistics for MapPointCulling (LocalMapping.cc:175-203).
    Returns (found_ratio [P], n_obs [P], age_kfs [P])."""
    P = state.pt_valid.shape[0]
    obs_counts = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(state.kf_obs >= 0, state.kf_obs, P)
    ].add((state.kf_obs >= 0) & state.kf_valid[:, None])[:P]
    ratio = state.pt_found.astype(jnp.float32) / jnp.maximum(
        state.pt_visible.astype(jnp.float32), 1.0
    )
    age = current_kf_counter - state.pt_first_kf
    return ratio, obs_counts, age


@fused_jit
def keyframe_redundancy(state: MapState, kf):
    """Fraction of kf's bound points seen by >= 3 other KFs at the same or
    finer scale (KeyFrameCulling, LocalMapping.cc:524-578)."""
    N = state.kf_obs.shape[1]
    P = state.pt_valid.shape[0]
    pids = state.kf_obs[kf]
    pid_safe = jnp.clip(pids, 0, P - 1)
    bound = (pids >= 0) & state.pt_valid[pid_safe]
    my_oct = state.kf_octave[kf]

    obs_kf, obs_feat, obs_valid = observation_table(state)
    o_kf = obs_kf[pid_safe]          # [N, O]
    o_feat = jnp.clip(obs_feat[pid_safe], 0, N - 1)
    o_valid = obs_valid[pid_safe]
    o_oct = state.kf_octave[jnp.clip(o_kf, 0, state.kf_valid.shape[0] - 1), o_feat]
    other = o_valid & (o_kf != kf)
    finer = other & (o_oct <= my_oct[:, None] + 1)
    n_finer = jnp.sum(finer, axis=-1)
    redundant = bound & (n_finer >= 3)
    n_bound = jnp.maximum(jnp.sum(bound), 1)
    return jnp.sum(redundant) / n_bound, jnp.sum(bound)
