"""MapState: the whole SLAM map as one fixed-shape pytree.

Design (SURVEY.md §7 "design stance"): slot pools + validity masks instead
of new/delete; growing structures (keyframes, points) allocate slots from a
host-side free list; erasure clears a mask bit. Every field mirrors state
the reference keeps in KeyFrame/MapPoint/Map (cited per field)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MapConfig:
    """Static capacities (compile-time shapes)."""

    max_keyframes: int = 256   # Kmax
    max_points: int = 16384    # Pmax
    n_features: int = 1000     # N per keyframe (= ORBConfig.n_features)
    n_levels: int = 8
    scale_factor: float = 1.2

    @property
    def sigma2(self) -> np.ndarray:
        return (self.scale_factor ** (2.0 * np.arange(self.n_levels))).astype(
            np.float32
        )


class MapState(NamedTuple):
    """All device-resident map data. K = max_keyframes, P = max_points,
    N = n_features.

    Keyframe fields (reference: include/KeyFrame.h state):
      kf_pose     [K,4,4] f32  — T_cw (world->camera), KeyFrame::Tcw
      kf_valid    [K]     bool — slot in use & not culled (SetBadFlag)
      kf_frame_id [K]     i32  — source frame id (mnFrameId)
      kf_xy       [K,N,2] f32  — undistorted keypoint pixels (mvKeysUn)
      kf_octave   [K,N]   i32
      kf_angle    [K,N]   f32
      kf_desc     [K,N,8] u32  — packed rBRIEF (mDescriptors)
      kf_feat_valid [K,N] bool — padded-slot mask from extraction
      kf_obs      [K,N]   i32  — map-point id per feature, -1 if none
                                 (mvpMapPoints)

    Point fields (reference: include/MapPoint.h state):
      pt_pos      [P,3]   f32  — world position (mWorldPos)
      pt_valid    [P]     bool — not bad (mbBad)
      pt_desc     [P,8]   u32  — distinctive descriptor (mDescriptor)
      pt_normal   [P,3]   f32  — mean viewing direction (mNormalVector)
      pt_min_dist [P]     f32  — scale-invariance band (mfMinDistance)
      pt_max_dist [P]     f32  — (mfMaxDistance)
      pt_ref_kf   [P]     i32  — reference keyframe (mpRefKF)
      pt_first_kf [P]     i32  — first observing KF id (mnFirstKFid)
      pt_visible  [P]     i32  — visibility counter (mnVisible)
      pt_found    [P]     i32  — found counter (mnFound)

    Graph fields:
      spanning_parent [K] i32  — spanning-tree parent slot, -1 for root
                                 (mpParent, KeyFrame.cc:497-588)
      loop_edges  [K, 8]  i32  — loop-edge partner slots, -1 empty
                                 (mspLoopEdges, KeyFrame.cc:461-472)
    """

    kf_pose: jnp.ndarray
    kf_valid: jnp.ndarray
    kf_frame_id: jnp.ndarray
    kf_xy: jnp.ndarray
    kf_octave: jnp.ndarray
    kf_angle: jnp.ndarray
    kf_desc: jnp.ndarray
    kf_feat_valid: jnp.ndarray
    kf_obs: jnp.ndarray
    pt_pos: jnp.ndarray
    pt_valid: jnp.ndarray
    pt_desc: jnp.ndarray
    pt_normal: jnp.ndarray
    pt_min_dist: jnp.ndarray
    pt_max_dist: jnp.ndarray
    pt_ref_kf: jnp.ndarray
    pt_first_kf: jnp.ndarray
    pt_visible: jnp.ndarray
    pt_found: jnp.ndarray
    spanning_parent: jnp.ndarray
    loop_edges: jnp.ndarray


def empty_map(cfg: MapConfig) -> MapState:
    K, P, N = cfg.max_keyframes, cfg.max_points, cfg.n_features
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_xy=jnp.zeros((K, N, 2), jnp.float32),
        kf_octave=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), jnp.float32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, jnp.int32),
        pt_pos=jnp.zeros((P, 3), jnp.float32),
        pt_valid=jnp.zeros((P,), bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3), jnp.float32),
        pt_min_dist=jnp.zeros((P,), jnp.float32),
        pt_max_dist=jnp.full((P,), jnp.inf, jnp.float32),
        pt_ref_kf=jnp.full((P,), -1, jnp.int32),
        pt_first_kf=jnp.full((P,), -1, jnp.int32),
        pt_visible=jnp.zeros((P,), jnp.int32),
        pt_found=jnp.zeros((P,), jnp.int32),
        spanning_parent=jnp.full((K,), -1, jnp.int32),
        loop_edges=jnp.full((K, 8), -1, jnp.int32),
    )


def insert_keyframe(state: MapState, slot, pose, frame_id, xy, octave, angle,
                    desc, feat_valid, obs, parent) -> MapState:
    """Write a keyframe into `slot` (device scatter; slot chosen by the host
    allocator). obs: [N] i32 point bindings (-1 = none). Replaces
    KeyFrame's ctor + Map::AddKeyFrame (KeyFrame.cc:30-54, Map.cc:38-44)."""
    return state._replace(
        kf_pose=state.kf_pose.at[slot].set(pose),
        kf_valid=state.kf_valid.at[slot].set(True),
        kf_frame_id=state.kf_frame_id.at[slot].set(frame_id),
        kf_xy=state.kf_xy.at[slot].set(xy),
        kf_octave=state.kf_octave.at[slot].set(octave),
        kf_angle=state.kf_angle.at[slot].set(angle),
        kf_desc=state.kf_desc.at[slot].set(desc),
        kf_feat_valid=state.kf_feat_valid.at[slot].set(feat_valid),
        kf_obs=state.kf_obs.at[slot].set(obs),
        spanning_parent=state.spanning_parent.at[slot].set(parent),
    )


def add_points(state: MapState, slots, positions, desc, ref_kf, first_kf,
               active) -> MapState:
    """Write new map points into `slots` ([M] i32). active: [M] bool —
    inactive rows write nothing (masked by writing to a dump slot is avoided
    by clamping: inactive rows write their existing values back).
    Replaces MapPoint ctor + Map::AddMapPoint."""
    # For inactive rows, redirect the write to the row's current content.
    safe = jnp.where(active, slots, slots)  # slots must be unique per call
    sel = lambda new, cur: jnp.where(active[:, None] if new.ndim > 1 else active, new, cur)
    cur_pos = state.pt_pos[safe]
    cur_desc = state.pt_desc[safe]
    cur_valid = state.pt_valid[safe]
    cur_ref = state.pt_ref_kf[safe]
    cur_first = state.pt_first_kf[safe]
    return state._replace(
        pt_pos=state.pt_pos.at[safe].set(sel(positions, cur_pos)),
        pt_desc=state.pt_desc.at[safe].set(sel(desc, cur_desc)),
        pt_valid=state.pt_valid.at[safe].set(jnp.where(active, True, cur_valid)),
        pt_ref_kf=state.pt_ref_kf.at[safe].set(jnp.where(active, ref_kf, cur_ref)),
        pt_first_kf=state.pt_first_kf.at[safe].set(
            jnp.where(active, first_kf, cur_first)
        ),
        pt_visible=state.pt_visible.at[safe].set(
            jnp.where(active, 1, state.pt_visible[safe])
        ),
        pt_found=state.pt_found.at[safe].set(
            jnp.where(active, 1, state.pt_found[safe])
        ),
    )


def remove_points(state: MapState, kill_mask) -> MapState:
    """Cull points: clear validity and unbind every observation.
    Replaces MapPoint::SetBadFlag (MapPoint.cc:105-122)."""
    obs_pid = state.kf_obs
    bound_dead = (obs_pid >= 0) & kill_mask[jnp.clip(obs_pid, 0, None)]
    return state._replace(
        pt_valid=state.pt_valid & ~kill_mask,
        kf_obs=jnp.where(bound_dead, -1, obs_pid),
    )


def remove_keyframe(state: MapState, slot) -> MapState:
    """Cull a keyframe: clear validity and its observations. Spanning-tree
    reassignment of children is handled by the host (sequential by nature,
    see SURVEY.md §7 hard-part 1). Replaces KeyFrame::SetBadFlag."""
    return state._replace(
        kf_valid=state.kf_valid.at[slot].set(False),
        kf_obs=state.kf_obs.at[slot].set(
            jnp.full_like(state.kf_obs[slot], -1)
        ),
    )
