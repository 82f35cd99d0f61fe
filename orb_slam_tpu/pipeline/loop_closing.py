"""Loop closing: detection, Sim3 computation, loop correction.

Replaces LoopClosing (reference: src/LoopClosing.cc):
  * DetectLoop (107-219): 10-KF cooldown, min-score from covisible
    neighbors, database candidates, 3-consecutive covisibility-consistency;
  * ComputeSim3 (225-394): per-candidate dense matching -> batched Sim3
    RANSAC (Horn) -> Sim3 optimization -> acceptance gates;
  * CorrectLoop (397-550): Sim3 propagation to the current KF's covisible
    group and their map points, duplicate fusion, essential-graph
    optimization, loop-edge insertion.

Host logic is thin; the heavy steps (matching, RANSAC, Sim3 GN, pose-graph
GN) are the jitted kernels from solvers/."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.ops.matching import match, TH_LOW
from orb_slam_tpu.place.database import KeyFrameDatabase
from orb_slam_tpu.slam_map.covisibility import covisibility_weights
from orb_slam_tpu.slam_map.observations import refresh_point_stats
from orb_slam_tpu.solvers.sim3 import sim3_ransac, optimize_sim3
from orb_slam_tpu.solvers.essential_graph import (
    optimize_essential_graph, relative_sim3_batch,
)
from orb_slam_tpu.pipeline.mapping_kernels import fuse_points_into_keyframes


from orb_slam_tpu.utils.dispatch import fused_jit
from orb_slam_tpu.utils.log import dbg


@fused_jit
def search_by_sim3(state, kf1, kf2, s, R, t, K_mat, radius: float = 7.5):
    """Guided Sim3 matching (replaces ORBmatcher::SearchBySim3,
    src/ORBmatcher.cc:1267-1505): transform each keyframe's bound map
    points into the OTHER camera through S12 / S21, gate by projection
    radius, Hamming-match, and demand mutual agreement.

    Returns (idx2_of_1 [N] i32, ok [N] bool): for each feature of kf1, the
    agreed feature index in kf2."""
    P = state.pt_valid.shape[0]
    pid1 = state.kf_obs[kf1]
    pid2 = state.kf_obs[kf2]
    b1 = (pid1 >= 0) & state.pt_valid[jnp.clip(pid1, 0, P - 1)]
    b2 = (pid2 >= 0) & state.pt_valid[jnp.clip(pid2, 0, P - 1)]
    T1 = state.kf_pose[kf1]
    T2 = state.kf_pose[kf2]
    x1 = state.pt_pos[jnp.clip(pid1, 0, P - 1)]
    x2 = state.pt_pos[jnp.clip(pid2, 0, P - 1)]
    # camera-frame coords
    c1 = x1 @ T1[:3, :3].T + T1[:3, 3]
    c2 = x2 @ T2[:3, :3].T + T2[:3, 3]
    # S12: p1 = s R p2 + t ; S21 = inverse
    c2_in1 = s * c2 @ R.T + t
    Rt = R.T
    c1_in2 = (1.0 / s) * (c1 - t) @ R

    def proj(p):
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        return jnp.stack([K_mat[0, 0] * p[:, 0] / z + K_mat[0, 2],
                          K_mat[1, 1] * p[:, 1] / z + K_mat[1, 2]], -1), p[:, 2]

    uv2_in1, z21 = proj(c2_in1)   # kf2 points in image 1
    uv1_in2, z12 = proj(c1_in2)   # kf1 points in image 2
    xy1 = state.kf_xy[kf1]
    xy2 = state.kf_xy[kf2]
    d_a = xy1[:, None, :] - uv2_in1[None, :, :]   # feature_i vs point_j
    d_b = uv1_in2[:, None, :] - xy2[None, :, :]   # point_i vs feature_j
    gate = (jnp.sum(d_a * d_a, -1) < radius * radius) & (z21 > 0)[None, :]
    gate &= (jnp.sum(d_b * d_b, -1) < radius * radius) & (z12 > 0)[:, None]
    idx, dist, ok = match(
        state.kf_desc[kf1], state.kf_desc[kf2], allowed=gate,
        valid_a=b1, valid_b=b2, max_dist=TH_LOW, nn_ratio=1.0,
        mutual=True, unique=True,
    )
    return idx, ok


@partial(fused_jit, static_argnames=("scale_factor", "n_levels", "bounds"))
def project_loop_points(state, new_kf, loop_mask, matched_feat, matched_pts,
                        s, R, t, T_cand, K_mat,
                        width: float, height: float, th: float = 10.0,
                        scale_factor: float = 1.2, n_levels: int = 8,
                        bounds=None):
    """SearchByProjection(KF, Scw, vpPoints, vpMatched, th) — the loop
    verification matcher (reference: src/ORBmatcher.cc:286-407, called
    from LoopClosing::ComputeSim3 at LoopClosing.cc:375-394): project the
    loop neighborhood's map points into the current keyframe through the
    corrected Sim3, gate by image bounds / scale-band distance / viewing
    angle / predicted-octave radius, Hamming-match against features not
    already matched. matched_pts [P] masks loop points already bound by the
    Sim3 inliers (the reference's sAlreadyFound, ORBmatcher.cc:300-304) so
    an inlier point cannot double-count toward the >=40 acceptance gate.
    Returns (point_of_feat [N] i32, ok [N] bool)."""
    P = state.pt_valid.shape[0]
    N = state.kf_obs.shape[1]
    # de-scaled camera coords (the reference divides Scw by its scale,
    # ORBmatcher.cc:306-310, so distances compare in map units)
    p_cand = state.pt_pos @ T_cand[:3, :3].T + T_cand[:3, 3]
    p_cur = p_cand @ R.T + (t / s)
    z = p_cur[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K_mat[0, 0] * p_cur[:, 0] / zs + K_mat[0, 2]
    v = K_mat[1, 1] * p_cur[:, 1] / zs + K_mat[1, 2]
    dist = jnp.linalg.norm(p_cur, axis=-1)
    # undistorted image bounds (Frame.cc:321-349; kf_xy are undistorted)
    mnx, mxx, mny, mxy = bounds if bounds is not None else (
        0.0, float(width), 0.0, float(height))
    in_img = (z > 0) & (u >= mnx) & (u < mxx) & (v >= mny) & (v < mxy)
    band = (dist >= state.pt_min_dist) & (dist <= state.pt_max_dist)
    # viewing angle < 60 deg (ORBmatcher.cc:334-337): ray from the current
    # camera center (in world) vs the point's mean viewing normal
    R_cur = R @ T_cand[:3, :3]           # world -> cur rotation
    t_cur = (t / s) + (T_cand[:3, 3] @ R.T)
    C_cur = -(R_cur.T @ t_cur)           # cur camera center in world
    PO = state.pt_pos - C_cur
    view_ok = jnp.sum(PO * state.pt_normal, axis=-1) > 0.5 * dist
    pt_ok = (state.pt_valid & loop_mask & ~matched_pts & in_img & band
             & view_ok)
    # predicted octave + radius (ORBmatcher.cc:340-350)
    ratio = jnp.maximum(state.pt_max_dist / jnp.maximum(dist, 1e-9), 1.0)
    pred = jnp.clip(jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)),
                    0, n_levels - 1)
    radius = th * scale_factor ** pred
    d = jnp.stack([u, v], -1)[:, None, :] - state.kf_xy[new_kf][None, :, :]
    gate = jnp.sum(d * d, -1) <= (radius * radius)[:, None]
    octv = state.kf_octave[new_kf].astype(jnp.float32)
    gate &= (octv[None, :] >= pred[:, None] - 1) & (
        octv[None, :] <= pred[:, None])
    idx, dist_h, ok = match(
        state.pt_desc, state.kf_desc[new_kf], allowed=gate,
        valid_a=pt_ok, valid_b=state.kf_feat_valid[new_kf] & ~matched_feat,
        max_dist=TH_LOW, nn_ratio=1.0, unique=True,
    )
    # invert: feature -> point
    feat_pt = jnp.full((N,), -1, jnp.int32)
    rows = jnp.where(ok, idx, N)
    src = jnp.arange(P, dtype=jnp.int32)
    feat_pt = jnp.concatenate(
        [feat_pt, jnp.full((1,), -1, jnp.int32)]).at[rows].set(
        jnp.where(ok, src, -1))[:N]
    return feat_pt, feat_pt >= 0


class LoopCloser:
    def __init__(self, db: KeyFrameDatabase, cfg, rng_key=None):
        self.db = db
        self.cfg = cfg
        self.consistent_groups = []  # list[(set(kf), count)]
        self.last_loop_kf_counter = -100
        self._key = rng_key if rng_key is not None else jax.random.PRNGKey(7)

    # ------------------------------------------------------------- detection

    def detect(self, system, new_kf: int):
        """DetectLoop. Returns list of consistent candidate slots."""
        m = system.map
        feat_valid = m.kf_feat_valid[new_kf]
        ids, w, _ = self.db.compute_bow(m.kf_desc[new_kf], feat_valid)
        W_np = np.asarray(covisibility_weights(m))
        covis = [int(k) for k in np.where(W_np[new_kf] > 0)[0]]

        try:
            if system.kf_counter - self.last_loop_kf_counter < 10:
                return [], ids, w
            # min score among covisible neighbors (LoopClosing.cc:114-131),
            # computed under the database lock (the mapper thread may be
            # adding/erasing concurrently). With no covisible BoW entries
            # the reference keeps its initial minScore=1, admitting no
            # candidate — required under perceptual aliasing, where a
            # fixed floor admits look-alike keyframes from distinct
            # places (tests/test_perceptual_aliasing.py).
            min_score = self.db.min_covisible_score(ids, w, covis)

            cands = self.db.detect_loop_candidates(
                ids, w, new_kf, covis, min_score, W_np)
            dbg(f"loop kf{new_kf}: min_score={min_score:.3f} "
                f"cands={cands} covis={len(covis)}")
            if not cands:
                self.consistent_groups = []
                return [], ids, w

            # covisibility-consistency over 3 consecutive KFs
            # (LoopClosing.cc:146-219)
            enough = []
            new_groups = []
            for c in cands:
                group = set(np.where(W_np[c] > 0)[0].tolist()) | {c}
                best_count = 0
                for prev_group, count in self.consistent_groups:
                    if group & prev_group:
                        best_count = max(best_count, count + 1)
                new_groups.append((group, best_count))
                if best_count >= 3:
                    enough.append(c)
            self.consistent_groups = new_groups
            dbg(f"loop kf{new_kf}: consistent={enough} "
                f"groups={[c for _, c in new_groups]}")
            return enough, ids, w
        finally:
            # the reference adds the KF to the database at the end of
            # DetectLoop regardless of outcome (LoopClosing.cc:141,216)
            self.db.add(new_kf, ids, w)

    # ------------------------------------------------------------ sim3 stage

    def compute_sim3(self, system, new_kf: int, candidates):
        """Per-candidate Sim3 estimation. Returns (cand, (s,R,t) mapping
        cand-frame -> cur-frame, matched pairs) or None."""
        m = system.map
        P = m.pt_valid.shape[0]
        for cand in candidates:
            # match features that have bound map points on both sides —
            # reference SearchByBoW(KF,KF) semantics (ORBmatcher.cc:715-850):
            # ONE-DIRECTIONAL best/second ratio 0.75 + rotation-consistency
            # histogram (mOrientation=true at the call site,
            # LoopClosing.cc:255). NOT mutual: the reference never
            # cross-checks KF2->KF1, and requiring it here measurably
            # halves the match yield on marginal loop seams (round 3 —
            # the organic-loop seam match dropped to single digits where
            # the reference's gate needs >=20)
            bound_cur = (m.kf_obs[new_kf] >= 0) & m.kf_feat_valid[new_kf]
            bound_cand = (m.kf_obs[cand] >= 0) & m.kf_feat_valid[cand]
            idx, dist, ok = match(
                m.kf_desc[new_kf], m.kf_desc[cand],
                valid_a=bound_cur, valid_b=bound_cand,
                angle_a=m.kf_angle[new_kf], angle_b=m.kf_angle[cand],
                max_dist=TH_LOW, nn_ratio=0.75, mutual=False,
                check_rotation=True, unique=True,
            )
            n_matches = int(jnp.sum(ok))
            self.debug_last = {"cand": cand, "matches": n_matches}
            dbg(f"sim3 kf-cand {cand}: matches={n_matches}")
            if n_matches < 20:
                continue

            pid_cur = m.kf_obs[new_kf]
            pid_cand = m.kf_obs[cand][idx]
            ok = ok & (pid_cur >= 0) & (pid_cand >= 0)
            pid_cur_s = jnp.clip(pid_cur, 0, P - 1)
            pid_cand_s = jnp.clip(pid_cand, 0, P - 1)
            ok = ok & m.pt_valid[pid_cur_s] & m.pt_valid[pid_cand_s]

            T_cur = m.kf_pose[new_kf]
            T_cand = m.kf_pose[cand]
            x_cur = m.pt_pos[pid_cur_s]
            x_cand = m.pt_pos[pid_cand_s]
            p1 = x_cur @ T_cur[:3, :3].T + T_cur[:3, 3]     # cur cam frame
            p2 = x_cand @ T_cand[:3, :3].T + T_cand[:3, 3]  # cand cam frame
            sf = system.cfg.map.scale_factor
            uv1 = m.kf_xy[new_kf]
            uv2 = m.kf_xy[cand][idx]
            oct1 = m.kf_octave[new_kf].astype(jnp.float32)
            oct2 = m.kf_octave[cand][idx].astype(jnp.float32)
            s2_1 = sf ** (2.0 * oct1)
            s2_2 = sf ** (2.0 * oct2)

            self._key, key = jax.random.split(self._key)
            self.debug_last["with_points"] = int(jnp.sum(ok))
            s, R, t, inl, n_in = sim3_ransac(
                p1, p2, uv1, uv2, ok, s2_1, s2_2, system.K_dev, key)
            self.debug_last["ransac_inl"] = int(n_in)
            dbg(f"sim3 cand {cand}: ransac_inliers={int(n_in)}")
            if int(n_in) < 20:
                continue

            # guided SearchBySim3 (reference: LoopClosing.cc:341-345):
            # gather additional matches under the RANSAC Sim3 before the
            # final optimization
            g_idx, g_ok = search_by_sim3(
                m, new_kf, cand, s, R, t, system.K_dev)
            idx2 = jnp.where(g_ok, g_idx, idx)
            ok2 = (inl | g_ok)
            pid_cand2 = m.kf_obs[cand][idx2]
            ok2 = ok2 & (pid_cur >= 0) & (pid_cand2 >= 0)
            pc2s = jnp.clip(pid_cand2, 0, P - 1)
            ok2 = ok2 & m.pt_valid[pid_cur_s] & m.pt_valid[pc2s]
            x_cand2 = m.pt_pos[pc2s]
            p2m = x_cand2 @ T_cand[:3, :3].T + T_cand[:3, 3]
            uv2m = m.kf_xy[cand][idx2]
            oct2m = m.kf_octave[cand][idx2].astype(jnp.float32)
            s2_2m = sf ** (2.0 * oct2m)

            s, R, t, inl, n_in = optimize_sim3(
                s, R, t, p1, p2m, uv1, uv2m, ok2,
                1.0 / s2_1, 1.0 / s2_2m, system.K_dev)
            if int(n_in) < 20:
                continue

            # final verification (LoopClosing.cc:347-394): project the
            # candidate's covisible neighborhood's points into the current
            # KF through the corrected Sim3 and demand >= 40 total matches
            W_np = np.asarray(covisibility_weights(m))
            group = np.where(W_np[cand] > 0)[0].tolist() + [cand]
            loop_mask = np.zeros(P, bool)
            obs_g = np.asarray(m.kf_obs[np.asarray(group, np.int32)])
            loop_mask[obs_g[obs_g >= 0]] = True
            # loop points already bound through the Sim3 inliers must not
            # re-match to a second feature (sAlreadyFound,
            # ORBmatcher.cc:300-304)
            matched_pts = np.zeros(P, bool)
            found_pids = np.asarray(pid_cand2)[np.asarray(inl)]
            matched_pts[found_pids[found_pids >= 0]] = True
            feat_pt, proj_ok = project_loop_points(
                m, new_kf, jnp.asarray(loop_mask), inl,
                jnp.asarray(matched_pts),
                s, R, t, m.kf_pose[cand], system.K_dev,
                width=float(system.cfg.camera.width),
                height=float(system.cfg.camera.height),
                scale_factor=sf, n_levels=system.cfg.map.n_levels,
                bounds=system.img_bounds)
            n_total = int(jnp.sum(inl)) + int(jnp.sum(proj_ok))
            dbg(f"sim3 cand {cand}: opt_inliers={int(n_in)} "
                f"projected={int(jnp.sum(proj_ok))} total={n_total}")
            if n_total < 40:
                continue
            dbg(f"sim3 cand {cand}: ACCEPTED total={n_total}")
            return cand, (s, R, t), inl
        return None

    # ------------------------------------------------------------ correction

    def correct(self, system, new_kf: int, cand: int, S12):
        """CorrectLoop (LoopClosing.cc:397-550). S12 = (s,R,t) with
        p_cur = s R p_cand + t."""
        _sf = system.cfg.map.scale_factor
        _nl = system.cfg.map.n_levels
        m = refresh_point_stats(system.map, scale_factor=_sf, n_levels=_nl)
        K = m.kf_valid.shape[0]
        P = m.pt_valid.shape[0]
        kf_valid = np.asarray(m.kf_valid)
        poses = np.asarray(m.kf_pose)

        s12 = float(S12[0])
        R12 = np.asarray(S12[1])
        t12 = np.asarray(S12[2])

        # corrected Sim3 of current KF: S_cw = S12 ∘ T_cand
        T_cand = poses[cand]
        S_cw_s = s12
        S_cw_R = R12 @ T_cand[:3, :3]
        S_cw_t = s12 * (R12 @ T_cand[:3, 3]) + t12

        # covisible group of current KF gets corrected via relative poses
        W_np = np.asarray(covisibility_weights(m))
        group = [new_kf] + [int(k) for k in np.where(W_np[new_kf] > 0)[0]]
        T_cur = poses[new_kf]
        T_cur_inv = np.linalg.inv(T_cur)

        base_s = np.ones(K, np.float32)
        base_R = poses[:, :3, :3].copy()
        base_t = poses[:, :3, 3].copy()
        old_s = base_s.copy()
        old_R = base_R.copy()
        old_t = base_t.copy()
        for k in group:
            T_rel = poses[k] @ T_cur_inv  # k <- cur
            base_s[k] = s12
            base_R[k] = T_rel[:3, :3] @ S_cw_R
            base_t[k] = T_rel[:3, :3] @ S_cw_t + T_rel[:3, 3]

        # correct the group's map points: x' = S_new^-1( S_old(x) ) using
        # each point's reference KF within the group (LoopClosing.cc:438-472)
        pt_ref = np.asarray(m.pt_ref_kf)
        pt_valid = np.asarray(m.pt_valid)
        pos = np.array(m.pt_pos)
        in_group = np.isin(pt_ref, group) & pt_valid
        if in_group.any():
            # one gather by pt_ref instead of a per-KF loop: each point maps
            # through x' = S_new^-1(S_old(x)) of ITS reference KF
            ref = np.clip(pt_ref, 0, K - 1)
            p_cam = (np.einsum("pij,pj->pi", old_R[ref], pos)
                     + old_t[ref])  # S_old (scale 1)
            # S_new^-1: x = (R^T (p - t)) / s
            x_new = np.einsum(
                "pji,pj->pi", base_R[ref], p_cam - base_t[ref]
            ) / base_s[ref][:, None]
            pos = np.where(in_group[:, None], x_new, pos)
        m = m._replace(pt_pos=jnp.asarray(pos))

        # corrected SE3 for the group before pose graph: [R, t/s]
        poses_corr = poses.copy()
        for k in group:
            poses_corr[k][:3, :3] = base_R[k]
            poses_corr[k][:3, 3] = base_t[k] / base_s[k]
        m = m._replace(kf_pose=jnp.asarray(poses_corr))

        # pre-fusion neighbor sets of the group (baseline for detecting NEW
        # cross-loop connections, LoopClosing.cc:521-525)
        prev_nb = {k: set(np.where(W_np[k] >= 15)[0].tolist()) for k in group}

        # --- fuse duplicates: project the loop-side neighborhood's point
        # SET into EVERY corrected keyframe (SearchAndFuse,
        # LoopClosing.cc:557-570 over mvpLoopMapPoints = points of cand +
        # its covisibles) — ONE device dispatch (lax.scan over the corrected
        # group) so the exclusive-writer window stays short in async mode
        cand_group = [cand] + [int(k) for k in np.where(W_np[cand] > 0)[0]]
        loop_pts = np.zeros(P, bool)
        obs_cg = np.asarray(m.kf_obs[np.asarray(cand_group, np.int32)])
        loop_pts[obs_cg[obs_cg >= 0]] = True
        dsts = [d for d in group if kf_valid[d]]
        G_pad = 1
        while G_pad < max(len(dsts), 2):
            G_pad *= 2
        dst_arr = np.full(G_pad, -1, np.int32)
        dst_arr[:len(dsts)] = dsts
        m, remap = fuse_points_into_keyframes(
            m, jnp.asarray(loop_pts), jnp.asarray(dst_arr), system.K_dev,
            width=system.cfg.camera.width,
            height=system.cfg.camera.height,
            scale_factor=system.cfg.map.scale_factor,
            n_levels=system.cfg.map.n_levels,
            bounds=system.img_bounds)
        system._compose_forward(remap)
        system._reclaim_points(m)

        # --- essential graph -------------------------------------------------
        W_np2 = np.asarray(covisibility_weights(m))

        # new loop connections: post-fusion links of group members to
        # non-group KFs that were not neighbors before (LoopClosing.cc:518-537);
        # they enter the pose graph with CORRECTED measurements at weight>=100
        # (plus the cur<->loop edge regardless, Optimizer.cc:609-636)
        loop_conn = set()
        group_set = set(group)
        for i in group:
            if not kf_valid[i]:
                continue
            for j in np.where(W_np2[i] >= 15)[0]:
                j = int(j)
                if (not kf_valid[j] or j in group_set
                        or j in prev_nb.get(i, set())):
                    continue
                if W_np2[i, j] >= 100 or {i, j} == {new_kf, cand}:
                    loop_conn.add((min(i, j), max(i, j)))
        loop_conn.add((min(new_kf, cand), max(new_kf, cand)))
        sp = np.asarray(m.spanning_parent)
        loop_edges_np = np.asarray(m.loop_edges)
        edges = set()
        # spanning-tree edges
        for k in np.where(kf_valid & (sp >= 0))[0]:
            p = int(sp[k])
            if kf_valid[p]:
                edges.add((min(int(k), p), max(int(k), p)))
        # strong covisibility edges (vectorized upper triangle)
        strong = np.argwhere(np.triu(W_np2, 1) >= 100)
        for a, b in strong:
            if kf_valid[a] and kf_valid[b]:
                edges.add((int(a), int(b)))
        # recorded loop edges
        for k, le in np.argwhere(loop_edges_np >= 0):
            j = int(loop_edges_np[k, le])
            if kf_valid[k] and kf_valid[j]:
                edges.add((min(int(k), j), max(int(k), j)))
        edges |= loop_conn
        edges = sorted(edges)

        E_pad = 1
        while E_pad < max(len(edges), 4):
            E_pad *= 2
        ei = np.zeros(E_pad, np.int32)
        ej = np.zeros(E_pad, np.int32)
        ev = np.zeros(E_pad, bool)
        n_e = len(edges)
        if n_e:
            ea = np.asarray([a for a, _ in edges], np.int32)
            eb = np.asarray([b for _, b in edges], np.int32)
            ei[:n_e], ej[:n_e], ev[:n_e] = ea, eb, True
            # measurement from PRE-correction poses, except the new loop
            # connections which use the corrected Sim3s of group members
            # (vScw in Optimizer.cc:578-636: CorrectedSim3 for the group).
            # Assembled as select-gathers + ONE batched device dispatch
            # (round 3 looped relative_sim3 per edge — hundreds of ~400 ms
            # tunnel RTTs inside the exclusive-writer window).
            is_loop = np.asarray([(a, b) in loop_conn for a, b in edges])
            in_grp = np.isin(np.arange(K), list(group_set))
            use_corr_a = is_loop & in_grp[ea]
            use_corr_b = is_loop & in_grp[eb]
            sa = np.where(use_corr_a, base_s[ea], old_s[ea])
            Ra = np.where(use_corr_a[:, None, None], base_R[ea], old_R[ea])
            ta = np.where(use_corr_a[:, None], base_t[ea], old_t[ea])
            sb = np.where(use_corr_b, base_s[eb], old_s[eb])
            Rb = np.where(use_corr_b[:, None, None], base_R[eb], old_R[eb])
            tb = np.where(use_corr_b[:, None], base_t[eb], old_t[eb])
            rs, rR, rt = relative_sim3_batch(
                jnp.asarray(sa), jnp.asarray(Ra), jnp.asarray(ta),
                jnp.asarray(sb), jnp.asarray(Rb), jnp.asarray(tb))
            rs, rR, rt = np.asarray(rs), np.asarray(rR), np.asarray(rt)
        ms_ = np.ones(E_pad, np.float32)
        mR_ = np.tile(np.eye(3, dtype=np.float32), (E_pad, 1, 1))
        mt_ = np.zeros((E_pad, 3), np.float32)
        if n_e:
            ms_[:n_e], mR_[:n_e], mt_[:n_e] = rs, rR, rt

        fixed = ~kf_valid.copy()
        fixed[cand] = True

        # dense Cholesky up to a few hundred KFs; past that the [7K,7K]
        # matrix stops making sense and the matrix-free PCG path (O(E)
        # memory) takes over — the same split g2o makes with its sparse
        # solver (Optimizer.cc:548-550)
        K_cap = len(base_s)
        solver = "dense" if K_cap <= 384 else "cg"
        s_o, R_o, t_o = optimize_essential_graph(
            jnp.asarray(base_s), jnp.asarray(base_R), jnp.asarray(base_t),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(ms_), jnp.asarray(mR_), jnp.asarray(mt_),
            jnp.asarray(ev), jnp.asarray(fixed), iters=15, solver=solver)
        s_o = np.asarray(s_o)
        R_o = np.asarray(R_o)
        t_o = np.asarray(t_o)

        # re-map ALL points through their reference KF's correction
        # (Optimizer.cc:749-789) — one gather by pt_ref instead of a
        # per-keyframe host loop over the full point array
        pos = np.array(m.pt_pos)
        pt_ref = np.asarray(m.pt_ref_kf)
        pt_valid = np.asarray(m.pt_valid)
        # old vertex value (post group-correction state): for group
        # members base_*, others old SE3
        in_grp = np.isin(np.arange(K), group)
        v_s = np.where(in_grp, base_s, old_s)
        v_R = np.where(in_grp[:, None, None], base_R, old_R)
        v_t = np.where(in_grp[:, None], base_t, old_t)
        ref = np.clip(pt_ref, 0, K - 1)
        sel = pt_valid & kf_valid[ref] & (pt_ref >= 0) & (pt_ref < K)
        if sel.any():
            p_cam = (v_s[ref][:, None]
                     * np.einsum("pij,pj->pi", v_R[ref], pos) + v_t[ref])
            x_new = np.einsum(
                "pji,pj->pi", R_o[ref], p_cam - t_o[ref]
            ) / s_o[ref][:, None]
            pos = np.where(sel[:, None], x_new, pos)

        # recover SE3 poses [R, t/s]
        poses_new = poses_corr.copy()
        poses_new[:, :3, :3] = np.where(
            kf_valid[:, None, None], R_o, poses_corr[:, :3, :3])
        poses_new[:, :3, 3] = np.where(
            kf_valid[:, None], t_o / s_o[:, None], poses_corr[:, :3, 3])

        # record the loop edge both ways (KeyFrame::AddLoopEdge)
        le = np.array(m.loop_edges)
        for a, b in ((new_kf, cand), (cand, new_kf)):
            row = le[a]
            for i in range(len(row)):
                if row[i] < 0:
                    row[i] = b
                    break
        m = m._replace(
            pt_pos=jnp.asarray(pos),
            kf_pose=jnp.asarray(poses_new),
            loop_edges=jnp.asarray(le),
        )
        system.map = refresh_point_stats(m, scale_factor=_sf, n_levels=_nl)
        system.last_pose = poses_new[new_kf].copy()
        system.velocity = np.eye(4, dtype=np.float32)
        self.last_loop_kf_counter = system.kf_counter
        self.consistent_groups = []
        return True

    # ----------------------------------------------------------------- entry

    def process(self, system, new_kf: int) -> bool:
        """Full loop-closing pass for a freshly inserted keyframe."""
        candidates, ids, w = self.detect(system, new_kf)
        if not candidates:
            return False
        hit = self.compute_sim3(system, new_kf, candidates)
        if hit is None:
            return False
        cand, S12, inl = hit
        return self.correct(system, new_kf, cand, S12)
