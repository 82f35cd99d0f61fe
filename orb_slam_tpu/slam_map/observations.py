"""Observation bookkeeping: sorted-segment observation lists + point stats.

The reference keeps per-point observation maps (MapPoint::mObservations) and
updates distinctive descriptors / normals / depth bands incrementally
(MapPoint.cc:185-250, 273-312). TPU-first: kf_obs is the single source of
truth; the per-point observation lists are DERIVED in one pass — flatten all
(point, kf, feat) triples, sort by point id, scatter into a capped [P, O]
table — then all point statistics refresh as batched masked reductions.
No incremental bookkeeping to keep consistent."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam_tpu.slam_map.map_state import MapState
from orb_slam_tpu.ops.matching import INVALID_DIST
from orb_slam_tpu.utils.dispatch import fused_jit

# max observations per point used for statistics / BA edges. The reference
# is unbounded (MapPoint.cc:65-103); the cap bounds the dense [P, O] edge
# table. Default 32 from the measured cap study (scripts/obs_cap_study.py,
# PERF.md): on an 80-keyframe dwell sequence — the worst case for the cap —
# 32 retains 99.4% of observations (ATE 0.037 vs 0.047 at 16, 0.74 at 8);
# the BA Schur accumulation is O(cap^2), so the cap should not be raised
# casually. Overridable per call (observation_table cap=) and globally via
# SLAM_OBS_CAP for experiments.
import os as _os

OBS_CAP = int(_os.environ.get("SLAM_OBS_CAP", "32"))


def flatten_observations(state: MapState):
    """All observations as sorted flat arrays.

    Returns (pid [M], kf [M], feat [M], valid [M]) sorted by pid with
    invalid entries (pid = P, i.e. past the end) last. M = K * N."""
    K, N = state.kf_obs.shape
    P = state.pt_valid.shape[0]
    pid = state.kf_obs.reshape(-1)
    kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    feat = jnp.tile(jnp.arange(N, dtype=jnp.int32), K)
    valid = (
        (pid >= 0)
        & state.kf_valid[kf]
        & state.pt_valid[jnp.clip(pid, 0, P - 1)]
    )
    key = jnp.where(valid, pid, P)
    order = jnp.argsort(key)
    return key[order], kf[order], feat[order], valid[order]


def observation_table(state: MapState, cap: int = 0):
    """Capped per-point observation table.

    Returns (obs_kf [P, O], obs_feat [P, O], obs_valid [P, O]) — the first
    O = cap (default OBS_CAP) observations of each point (others ignored
    for statistics, which matches the reference's behavior closely: stats
    are dominated by the early/reference observations)."""
    cap = cap or OBS_CAP
    P = state.pt_valid.shape[0]
    s_pid, s_kf, s_feat, s_valid = flatten_observations(state)
    # position within each point's contiguous segment
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_pid[1:] != s_pid[:-1]]
    )
    seg_start_idx = jnp.where(first, jnp.arange(s_pid.shape[0]), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start_idx)
    pos = jnp.arange(s_pid.shape[0]) - seg_start

    ok = s_valid & (pos < cap)
    rows = jnp.where(ok, s_pid, P - 1)
    cols = jnp.clip(pos, 0, cap - 1)
    obs_kf = jnp.full((P, cap), -1, jnp.int32)
    obs_feat = jnp.full((P, cap), -1, jnp.int32)
    obs_kf = obs_kf.at[rows, cols].set(jnp.where(ok, s_kf, obs_kf[rows, cols]))
    obs_feat = obs_feat.at[rows, cols].set(
        jnp.where(ok, s_feat, obs_feat[rows, cols])
    )
    obs_valid = obs_kf >= 0
    return obs_kf, obs_feat, obs_valid


@partial(fused_jit, static_argnames=("scale_factor", "n_levels"))
def refresh_point_stats(state: MapState, scale_factor: float = 1.2,
                        n_levels: int = 8) -> MapState:
    """Recompute distinctive descriptors, normals, scale bands and reference
    keyframes for ALL valid points in one batched pass.

    Replaces MapPoint::ComputeDistinctiveDescriptors (min-median-Hamming,
    MapPoint.cc:185-250) and MapPoint::UpdateNormalAndDepth
    (MapPoint.cc:273-312). scale_factor / n_levels size the scale-invariance
    band exactly as the reference derives it from the extractor settings
    (MapPoint.cc:300-302)."""
    P = state.pt_valid.shape[0]
    K = state.kf_valid.shape[0]
    O = OBS_CAP
    obs_kf, obs_feat, obs_valid = observation_table(state)
    kf_safe = jnp.clip(obs_kf, 0, K - 1)
    feat_safe = jnp.clip(obs_feat, 0, state.kf_obs.shape[1] - 1)

    # --- distinctive descriptor: min median pairwise Hamming ---
    descs = state.kf_desc[kf_safe, feat_safe]  # [P, O, 8]
    x = descs[:, :, None, :] ^ descs[:, None, :, :]
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    pair_ok = obs_valid[:, :, None] & obs_valid[:, None, :]
    ham = jnp.where(pair_ok, ham, INVALID_DIST)
    # median over valid columns = sorted[ceil(n/2)-ish]; invalid sort last
    ham_sorted = jnp.sort(ham, axis=-1)  # [P, O, O]
    n_obs_cap = jnp.sum(obs_valid, axis=-1)  # [P]
    med_idx = jnp.clip((n_obs_cap - 1) // 2, 0, O - 1)
    med = jnp.take_along_axis(
        ham_sorted, med_idx[:, None, None].repeat(O, 1), axis=-1
    )[..., 0]  # [P, O]
    med = jnp.where(obs_valid, med, INVALID_DIST)
    best_o = jnp.argmin(med, axis=-1)  # [P]
    new_desc = jnp.take_along_axis(descs, best_o[:, None, None].repeat(8, -1), 1)[
        :, 0
    ]

    # --- reference KF: keep current if still observing, else first obs ---
    ref_ok = jnp.any(
        (obs_kf == state.pt_ref_kf[:, None]) & obs_valid, axis=-1
    )
    first_kf = obs_kf[:, 0]
    new_ref = jnp.where(ref_ok, state.pt_ref_kf, first_kf)

    # --- normal: mean unit vector from observing camera centers ---
    R = state.kf_pose[:, :3, :3]
    t = state.kf_pose[:, :3, 3]
    centers = -jnp.einsum("kij,ki->kj", R, t)  # [K,3] (-R^T t)
    obs_centers = centers[kf_safe]  # [P, O, 3]
    rays = state.pt_pos[:, None, :] - obs_centers
    norms = jnp.linalg.norm(rays, axis=-1, keepdims=True)
    unit = rays / jnp.maximum(norms, 1e-9)
    w = obs_valid[..., None].astype(jnp.float32)
    mean_dir = jnp.sum(unit * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    new_normal = mean_dir / jnp.maximum(
        jnp.linalg.norm(mean_dir, axis=-1, keepdims=True), 1e-9
    )

    # --- scale-invariance band from the reference KF's observation ---
    ref_safe = jnp.clip(new_ref, 0, K - 1)
    ref_center = centers[ref_safe]
    dist = jnp.linalg.norm(state.pt_pos - ref_center, axis=-1)
    # octave of the feature in the reference KF
    is_ref = (obs_kf == new_ref[:, None]) & obs_valid
    ref_slot = jnp.argmax(is_ref, axis=-1)
    ref_feat = jnp.take_along_axis(feat_safe, ref_slot[:, None], 1)[:, 0]
    octv = state.kf_octave[ref_safe, ref_feat]
    sf = jnp.float32(scale_factor)
    level_factor = sf ** octv.astype(jnp.float32)
    new_max = dist * level_factor
    new_min = new_max / (sf ** (n_levels - 1))

    has_obs = n_obs_cap > 0
    upd = lambda new, old: jnp.where(
        (state.pt_valid & has_obs)[:, None] if new.ndim > 1 else (state.pt_valid & has_obs),
        new, old,
    )
    return state._replace(
        pt_desc=upd(new_desc, state.pt_desc),
        pt_normal=upd(new_normal, state.pt_normal),
        pt_ref_kf=upd(new_ref, state.pt_ref_kf),
        pt_min_dist=upd(new_min, state.pt_min_dist),
        pt_max_dist=upd(new_max, state.pt_max_dist),
    )
