"""Jitted per-frame tracking kernels.

TPU-first redesign of the reference's per-frame hot path (SURVEY.md §3.2):
the reference runs TrackWithMotionModel (match against the previous frame)
THEN TrackLocalMap (match against covisibility-voted local points) because a
CPU cannot afford to match against the whole local map at frame rate. On
TPU we fuse both into ONE dense stage: project every candidate map point
under the predicted pose, gate by frustum / scale band / viewing angle
(Frame::isInFrustum, src/Frame.cc:137-198), select the best P_LOCAL
candidates, run one dense masked Hamming match (SearchByProjection,
src/ORBmatcher.cc:49-133), then pose-optimize with the reference's 4-round
chi2 schedule."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry.se3 import se3_inverse
from orb_slam_tpu.ops.matching import match, TH_HIGH
from orb_slam_tpu.solvers.pose_opt import pose_optimize
from orb_slam_tpu.slam_map.map_state import MapState
from orb_slam_tpu.utils.dispatch import fused_jit


class TrackResult(NamedTuple):
    pose: jnp.ndarray          # [4,4] optimized T_cw
    obs: jnp.ndarray           # [N] i32 point id per frame feature (-1 none)
    n_inliers: jnp.ndarray     # i32
    n_matches: jnp.ndarray     # i32 (pre-optimization matches)
    visible_inc: jnp.ndarray   # [P] i32 (for MapPoint::IncreaseVisible)
    found_inc: jnp.ndarray     # [P] i32 (IncreaseFound)


def project_points(pt_pos, T_cw, K_mat):
    pc = pt_pos @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K_mat[0, 0] * pc[:, 0] / zs + K_mat[0, 2]
    v = K_mat[1, 1] * pc[:, 1] / zs + K_mat[1, 2]
    return jnp.stack([u, v], axis=-1), z


def frustum_gate(state: MapState, T_cw, K_mat, width, height,
                 view_cos_limit=0.5, scale_factor: float = 1.2,
                 n_levels: int = 8, bounds=None):
    """Frame::isInFrustum for every map point at once (src/Frame.cc:137-198).
    Returns (visible [P], proj [P,2], pred_level [P], dist [P]).

    scale_factor / n_levels come from the extractor settings (the reference
    derives mfLogScaleFactor and the octave clamp from them, Frame.cc:95-107,
    181-190).

    bounds = (min_x, max_x, min_y, max_y) UNDISTORTED image bounds (the
    reference computes mnMinX/mnMaxX/mnMinY/mnMaxY once from the
    undistorted corners, Frame.cc:321-349, and gates isInFrustum on them —
    with barrel distortion, undistorted keypoint coords near the frame
    edge lie OUTSIDE [0,W)x[0,H), so raw bounds wrongly cull edge points).
    None = (0, width, 0, height)."""
    if bounds is None:
        bounds = (0.0, float(width), 0.0, float(height))
    min_x, max_x, min_y, max_y = bounds
    proj, z = project_points(state.pt_pos, T_cw, K_mat)
    in_img = (
        (z > 0.0)
        & (proj[:, 0] >= min_x)
        & (proj[:, 0] < max_x)
        & (proj[:, 1] >= min_y)
        & (proj[:, 1] < max_y)
    )
    C = -T_cw[:3, :3].T @ T_cw[:3, 3]
    rays = state.pt_pos - C
    dist = jnp.linalg.norm(rays, axis=-1)
    # scale band with the reference's 0.8 / 1.2 slack (Frame.cc:170-177)
    dist_ok = (dist >= 0.8 * state.pt_min_dist) & (dist <= 1.2 * state.pt_max_dist)
    view_cos = jnp.sum(rays * state.pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    angle_ok = view_cos > view_cos_limit
    visible = state.pt_valid & in_img & dist_ok & angle_ok
    # predicted octave (Frame.cc:181-190): ratio = max_dist / dist
    ratio = jnp.maximum(state.pt_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    pred = jnp.ceil(
        jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor)
    ).astype(jnp.int32)
    pred = jnp.clip(pred, 0, n_levels - 1)
    return visible, proj, pred, dist


def _track_body(
    state: MapState,
    feat_xy,          # [N,2] undistorted keypoint pixels
    feat_desc,        # [N,8] u32
    feat_octave,      # [N] i32
    feat_valid,       # [N] bool
    T_pred,           # [4,4] predicted pose (motion model)
    K_mat,
    pt_mask=None,     # [P] bool local-map membership (None = whole map)
    *,
    p_local: int = 4096,
    width: int = 640,
    height: int = 480,
    radius: float = 15.0,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_dist: int = TH_HIGH,
    bounds=None,
) -> TrackResult:
    """One fused tracking step. Returns optimized pose + feature->point
    bindings for potential keyframe creation.

    pt_mask restricts candidates to the LOCAL MAP (covisibility-derived,
    slam_map/covisibility.py::local_point_mask) — the reference's
    TrackLocalMap semantics (Tracking.cc:728-839). None = match the whole
    map (the raw-kernel benches and oracle fixtures)."""
    P = state.pt_valid.shape[0]
    N = feat_xy.shape[0]

    visible, proj, pred_level, dist = frustum_gate(
        state, T_pred, K_mat, width, height,
        scale_factor=scale_factor, n_levels=n_levels, bounds=bounds,
    )
    if pt_mask is not None:
        visible = visible & pt_mask

    # --- select up to p_local visible candidates (stable order by id) ---
    # NOTE: selection is a pure function of the map snapshot + pose: lowest
    # slot id wins on overflow (slot ids correlate with age, so the most
    # established points survive). A found-counter tiebreak was measured
    # equivalent but makes candidate order depend on per-frame counter
    # updates, which breaks scan-chained tracking (track_chunk) bitwise
    # reproducibility against the sequential path.
    score = visible.astype(jnp.float32)
    _, sel = jax.lax.top_k(score, p_local)
    sel_ok = visible[sel]

    cand_desc = state.pt_desc[sel]
    cand_proj = proj[sel]
    cand_level = pred_level[sel]

    # --- geometric gate: radius scaled by predicted level (the reference
    # scales the window by the scale factor of the predicted octave,
    # ORBmatcher.cc:85-90), octave within [pred-1, pred+1] ---
    sf = scale_factor ** cand_level.astype(jnp.float32)
    r = radius * sf  # [p_local]
    d = cand_proj[:, None, :] - feat_xy[None, :, :]
    gate = jnp.sum(d * d, axis=-1) <= (r * r)[:, None]
    gate &= (feat_octave[None, :] >= cand_level[:, None] - 1) & (
        feat_octave[None, :] <= cand_level[:, None] + 1
    )

    best_idx, best_dist, matched = match(
        cand_desc,
        feat_desc,
        allowed=gate,
        valid_a=sel_ok,
        valid_b=feat_valid,
        max_dist=max_dist,
        nn_ratio=0.9,
        unique=True,
    )

    # --- pose optimization over matches ---
    # Compact rows first: matches are one-to-one with features
    # (unique=True), so at most N of the p_local candidate rows carry a
    # correspondence. The GN chain is the latency-critical cost of the
    # whole track body (measured 0.92 of 0.93 ms/frame, PERF.md round 3);
    # gathering the matched rows into ceil(N/128)*128 slots cuts every
    # one of its passes ~4x at p_local=4096.
    n_c = min(-(-N // 128) * 128, p_local)
    if n_c < p_local:
        _, crow = jax.lax.top_k(matched.astype(jnp.float32), n_c)
        c_idx = best_idx[crow]
        muv = feat_xy[c_idx]
        moct = feat_octave[c_idx]
        inv_sigma2 = 1.0 / (scale_factor ** (2.0 * moct.astype(jnp.float32)))
        T_opt, inl_c, n_in = pose_optimize(
            T_pred, state.pt_pos[sel[crow]], muv, inv_sigma2,
            matched[crow], K_mat, iters=(4, 3, 2, 2),
        )
        inlier = jnp.zeros(matched.shape, bool).at[crow].set(inl_c)
    else:
        muv = feat_xy[best_idx]
        moct = feat_octave[best_idx]
        inv_sigma2 = 1.0 / (scale_factor ** (2.0 * moct.astype(jnp.float32)))
        # short GN schedule: each iteration is a sequentially-dependent
        # small solve (latency-bound on TPU); with a motion-model init
        # 4+3+2+2 rounds converge as well as the reference's 10+10+7+5
        T_opt, inlier, n_in = pose_optimize(
            T_pred, state.pt_pos[sel], muv, inv_sigma2, matched, K_mat,
            iters=(4, 3, 2, 2),
        )

    # --- bindings: feature -> point id for inlier matches ---
    obs = jnp.full((N,), -1, jnp.int32)
    tgt = jnp.where(matched & inlier, best_idx, N)  # dump slot N
    obs_pad = jnp.concatenate([obs, jnp.full((1,), -1, jnp.int32)])
    obs_pad = obs_pad.at[tgt].set(jnp.where(matched & inlier, sel, -1))
    obs = obs_pad[:N]

    visible_inc = visible.astype(jnp.int32)
    found_pad = jnp.zeros((P,), jnp.int32)
    found_inc = found_pad.at[jnp.where(matched & inlier, sel, 0)].add(
        (matched & inlier).astype(jnp.int32)
    )

    return TrackResult(
        pose=T_opt,
        obs=obs,
        n_inliers=n_in,
        n_matches=jnp.sum(matched),
        visible_inc=visible_inc,
        found_inc=found_inc,
    )


track_frame = partial(
    fused_jit,
    static_argnames=("p_local", "width", "height", "radius", "scale_factor",
                     "n_levels", "max_dist", "bounds"),
)(_track_body)


def _prev_frame_ladder_body(
    state: MapState,
    prev_xy,          # [N,2] previous frame undistorted keypoints
    prev_desc,        # [N,8] u32
    prev_octave,      # [N] i32
    prev_angle,       # [N] f32
    prev_obs,         # [N] i32 point id bound to each prev feature (-1 none)
    cur_xy,           # [M,2]
    cur_desc,         # [M,8] u32
    cur_octave,       # [M] i32
    cur_angle,        # [M] f32
    cur_valid,        # [M] bool
    T_last,           # [4,4] previous frame pose
    K_mat,
    coarse_min_octave,  # i32 scalar: maxOctave/2+1 once >5 KFs, else 0
    *,
    width: int = 640,
    height: int = 480,
    scale_factor: float = 1.2,
    n_levels: int = 8,
):
    """The reference's TrackPreviousFrame as ONE fused program
    (src/Tracking.cc:486-552): frame-to-frame correspondence recovery for
    when motion-model map tracking fails — matches against the previous
    FRAME's bound points, which works even when the map-side candidate
    selection is starved (sparse map, init hiccups).

    Ladder (each stage a dense masked match instead of the reference's
    per-feature grid loops, ORBmatcher.cc:409-517/519-594):
      1. WindowSearch, 200 px, coarse octaves only (>= coarse_min_octave),
         same-octave candidates, ratio 0.9 + rotation histogram;
      2. if <10 matches: WindowSearch, 100 px, all octaves;
      3. if >=10: pose-GN (4-round chi2) + outlier discard, then
         SearchByProjection top-up at 15 px; else last-chance
         SearchByProjection at 50 px from the unoptimized pose;
      4. final pose-GN over the combined correspondences.

    Both WindowSearch stages are computed unconditionally and selected by
    count (two tiny MXU Hamming matmuls beat a lax.cond's serialization);
    the projection stage folds the 15/50 px branch into traced
    (pose, radius) operands. Returns (T_opt, n_inliers, n_matches); the
    caller follows up with the fused local-map step from T_opt (the
    reference always runs TrackLocalMap after, Tracking.cc:245-270)."""
    P = state.pt_valid.shape[0]
    M = cur_xy.shape[0]
    obs_c = jnp.clip(prev_obs, 0, P - 1)
    pt_ok = (prev_obs >= 0) & state.pt_valid[obs_c]
    pts = state.pt_pos[obs_c]

    from orb_slam_tpu.ops.matching import window_gate

    # --- stage 1: coarse-octave 200 px window, same octave ---
    gate1 = window_gate(prev_xy, cur_xy, 200.0, octave_b=cur_octave,
                        min_level=prev_octave, max_level=prev_octave)
    i1, _, m1 = match(
        prev_desc, cur_desc, allowed=gate1,
        valid_a=pt_ok & (prev_octave >= coarse_min_octave),
        valid_b=cur_valid, angle_a=prev_angle, angle_b=cur_angle,
        max_dist=TH_HIGH, nn_ratio=0.9, check_rotation=True, unique=True)
    n1 = jnp.sum(m1)

    # --- stage 2: all octaves, 100 px window (selected when n1 < 10) ---
    gate2 = window_gate(prev_xy, cur_xy, 100.0, octave_b=cur_octave,
                        min_level=prev_octave, max_level=prev_octave)
    i2, _, m2 = match(
        prev_desc, cur_desc, allowed=gate2, valid_a=pt_ok,
        valid_b=cur_valid, angle_a=prev_angle, angle_b=cur_angle,
        max_dist=TH_HIGH, nn_ratio=0.9, check_rotation=True, unique=True)
    use2 = n1 < 10
    best_idx = jnp.where(use2, i2, i1)
    matched = jnp.where(use2, m2, m1)
    n12 = jnp.where(use2, jnp.sum(m2), n1)

    # --- intermediate pose-GN + outlier discard (Tracking.cc:514-527) ---
    inv_sigma2_of = lambda idx: 1.0 / (
        scale_factor ** (2.0 * cur_octave[idx].astype(jnp.float32)))
    T1, inl1, _ = pose_optimize(
        T_last, pts, cur_xy[best_idx], inv_sigma2_of(best_idx), matched,
        K_mat, iters=(4, 3, 2, 2))
    good = n12 >= 10
    matched = matched & jnp.where(good, inl1, True)
    T_proj = jnp.where(good, T1, T_last)
    rad = jnp.where(good, 15.0, 50.0)

    # --- projection top-up (ORBmatcher.cc:519-594): project the UNMATCHED
    # prev-frame points through T_proj; exclude already-bound cur features
    # (vpMapPointMatches2[i2] guard) and already-found points
    # (sAlreadyFound == the matched prev rows; bindings are unique) ---
    proj, z = project_points(pts, T_proj, K_mat)
    gate_p = window_gate(proj, cur_xy, rad, octave_b=cur_octave,
                         min_level=prev_octave, max_level=prev_octave)
    col_taken = jnp.zeros((M,), bool).at[
        jnp.where(matched, best_idx, M)].set(True, mode="drop")
    ip, _, mp_ = match(
        prev_desc, cur_desc, allowed=gate_p,
        valid_a=pt_ok & ~matched & (z > 0),
        valid_b=cur_valid & ~col_taken,
        max_dist=TH_HIGH, nn_ratio=0.9, unique=True)

    best_all = jnp.where(matched, best_idx, ip)
    matched_all = matched | mp_

    # --- final pose-GN over combined correspondences (Tracking.cc:541) ---
    T_f, _, n_in = pose_optimize(
        T_proj, pts, cur_xy[best_all], inv_sigma2_of(best_all), matched_all,
        K_mat, iters=(4, 3, 2, 2))
    return T_f, n_in, jnp.sum(matched_all)


track_prev_frame = partial(
    fused_jit,
    static_argnames=("width", "height", "scale_factor", "n_levels"),
)(_prev_frame_ladder_body)


class ChunkResult(NamedTuple):
    """Per-frame outputs of a scan-chained tracking chunk (leading axis B)."""

    pose: jnp.ndarray        # [B,4,4]
    obs: jnp.ndarray         # [B,N] i32
    n_inliers: jnp.ndarray   # [B] i32
    n_matches: jnp.ndarray   # [B] i32
    visible: jnp.ndarray     # [B,P] bool (frustum-visible per frame)


def _track_chunk_body(
    state: MapState,
    feats_xy,         # [B,N,2]
    feats_desc,       # [B,N,8] u32
    feats_octave,     # [B,N] i32
    feats_valid,      # [B,N] bool
    pose0,            # [4,4] pose of the frame BEFORE the chunk
    vel0,             # [4,4] motion-model velocity entering the chunk
    K_mat,
    pt_mask=None,     # [P] bool local-map membership (None = whole map)
    *,
    p_local: int = 4096,
    width: int = 640,
    height: int = 480,
    radius: float = 15.0,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_dist: int = TH_HIGH,
    min_inliers: int = 30,
    use_motion_model: bool = True,
    bounds=None,
) -> ChunkResult:
    """Track B frames against ONE map snapshot in a single device program.

    Between keyframes the reference's tracking loop is a pure recurrence
    pose_t -> pose_t+1 against a fixed local map (src/Tracking.cc:168-315):
    nothing the tracker writes (pose, velocity, visibility counters) feeds
    back into the map until a keyframe is created. That makes B frames of
    tracking ONE lax.scan — a single dispatch instead of B host round
    trips. The host inspects per-frame inlier counts afterwards and
    re-enters mid-chunk only at keyframe/lost events (the only points where
    the reference's loop touches shared state).

    Each scan step replicates SLAMSystem._track exactly: motion-model
    prediction, the wide-window no-motion-model retry on low inliers
    (Tracking.cc:486-552), and the velocity update T_new @ inv(T_last)
    (Tracking.cc:282-295). On a lost frame the carried pose/velocity are
    held (the host truncates the chunk there anyway)."""

    def step(carry, fr):
        xy, desc, octv, val = fr
        return chunk_track_step(
            state, xy, desc, octv, val, carry, K_mat, pt_mask,
            p_local=p_local, width=width, height=height, radius=radius,
            scale_factor=scale_factor, n_levels=n_levels,
            max_dist=max_dist, min_inliers=min_inliers,
            use_motion_model=use_motion_model, bounds=bounds)

    frames = (feats_xy, feats_desc, feats_octave, feats_valid)
    _, (poses, obs, n_in, n_m, vis) = jax.lax.scan(
        step, (pose0, vel0), frames)
    return ChunkResult(poses, obs, n_in, n_m, vis)


def chunk_track_step(state, xy, desc, octv, val, carry, K_mat,
                     pt_mask=None, *,
                     p_local, width, height, radius, max_dist,
                     min_inliers, use_motion_model, retry=True,
                     scale_factor=1.2, n_levels=8, bounds=None):
    """One frame of the chunk recurrence (shared by _track_chunk_body and
    the fused extract+track scan): motion-model prediction, optionally the
    wide-window no-motion-model retry on low inliers (Tracking.cc:486-552)
    and the velocity update (Tracking.cc:282-295).

    retry=False: the cond's untaken retry branch still costs ~1.2 ms/frame
    inside the scan (measured); the production batch path disables it and
    the HOST replay re-enters through the sequential _track (which does
    retry) at the first low-inlier frame — identical results, the retry
    cost paid only on actually-weak frames."""
    pose, vel = carry
    T_pred = (vel @ pose) if use_motion_model else pose
    res = _track_body(
        state, xy, desc, octv, val, T_pred, K_mat, pt_mask,
        p_local=p_local, width=width, height=height,
        radius=radius, scale_factor=scale_factor, n_levels=n_levels,
        max_dist=max_dist, bounds=bounds,
    )

    if retry:
        def _retry(_):
            return _track_body(
                state, xy, desc, octv, val, pose, K_mat, pt_mask,
                p_local=p_local, width=width, height=height,
                radius=radius * 2.0, scale_factor=scale_factor,
                n_levels=n_levels, max_dist=max_dist, bounds=bounds,
            )

        res = jax.lax.cond(
            res.n_inliers < min_inliers, _retry, lambda _: res, None)
    ok = res.n_inliers >= min_inliers
    new_pose = jnp.where(ok, res.pose, pose)
    new_vel = jnp.where(ok, res.pose @ se3_inverse(pose), jnp.eye(4))
    out = (res.pose, res.obs, res.n_inliers, res.n_matches,
           res.visible_inc.astype(bool))
    return (new_pose, new_vel), out


track_chunk = partial(
    fused_jit,
    static_argnames=("p_local", "width", "height", "radius", "scale_factor",
                     "n_levels", "max_dist", "min_inliers",
                     "use_motion_model", "bounds"),
)(_track_chunk_body)
