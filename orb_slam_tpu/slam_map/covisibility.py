"""Covisibility graph as dense matrix ops.

The reference maintains per-KeyFrame sorted neighbor lists updated by
counting shared MapPoint observations in UpdateConnections
(KeyFrame.cc:332-421). TPU-first: the incidence matrix A[k, p] (KF k
observes point p) is built by one scatter per map update, and the WHOLE
covisibility weight matrix is a single bool-matmul on the MXU:
W = A A^T. Neighbor queries become masked top-k / threshold ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_tpu.slam_map.map_state import MapState
from orb_slam_tpu.utils.dispatch import fused_jit

COVIS_THRESHOLD = 15  # reference: KeyFrame.cc:372
ESSENTIAL_THRESHOLD = 100  # reference: Optimizer.cc:701, MapPublisher.cc:240


def incidence_matrix(state: MapState):
    """[K, P] bool: KF k observes point p. One scatter over kf_obs."""
    K, N = state.kf_obs.shape
    P = state.pt_valid.shape[0]
    pid = state.kf_obs  # [K, N], -1 for unbound
    bound = (pid >= 0) & state.kf_valid[:, None]
    safe = jnp.clip(pid, 0, P - 1)
    A = jnp.zeros((K, P), bool)
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    A = A.at[rows, safe].max(bound)
    return A & state.pt_valid[None, :]


@fused_jit
def covisibility_weights(state: MapState, A=None):
    """[K, K] i32 shared-observation counts (diagonal zeroed).
    W = A A^T on the MXU — replaces KeyFrame::UpdateConnections counting."""
    if A is None:
        A = incidence_matrix(state)
    Af = A.astype(jnp.float32)
    W = (Af @ Af.T).astype(jnp.int32)
    K = W.shape[0]
    W = W * (1 - jnp.eye(K, dtype=jnp.int32))
    valid2 = state.kf_valid[:, None] & state.kf_valid[None, :]
    return jnp.where(valid2, W, 0)


def observation_counts(state: MapState, A=None):
    """[P] i32 number of observing keyframes per point (MapPoint::nObs)."""
    if A is None:
        A = incidence_matrix(state)
    return jnp.sum(A, axis=0).astype(jnp.int32)


@fused_jit
def local_point_mask(state: MapState, ref_kf):
    """[P] bool: the LOCAL MAP's point set, seen from reference keyframe
    `ref_kf` — the reference's UpdateReferenceKeyFrames/Points
    (src/Tracking.cc:728-839): K1 = keyframes covisible with the reference
    (+ itself), K2 = K1's covisible neighbors; local points = all points
    observed by K1 u K2.

    Restricting the tracker's candidate pool to this set is a REFERENCE
    SEMANTIC, not just a cost bound: matching against the whole map lets
    the tracker silently bind points from a previous pass of the same
    place whenever drift is small, which makes the revisited keyframes
    covisible and therefore permanently EXCLUDED from loop-candidate
    retrieval (KeyFrameDatabase.cc:92-101 excludes connected KFs) — the
    explicit Sim3 loop closure can then never fire (round-3 finding: the
    organic-loop seam bound implicitly and DetectLoop starved). The
    reference's ~80-KF cap is a CPU cost bound and is not needed here
    (fixed shapes; the p_local pool caps the candidate count)."""
    W = covisibility_weights(state)
    K = W.shape[0]
    k1 = ((W[ref_kf] > 0) & state.kf_valid) | (
        jnp.arange(K) == ref_kf)
    k2 = ((W @ k1.astype(jnp.int32)) > 0) & state.kf_valid
    kf_mask = k1 | k2
    obs = state.kf_obs
    P = state.pt_valid.shape[0]
    ids = jnp.where(kf_mask[:, None] & (obs >= 0), obs, P)
    mask = jnp.zeros(P + 1, bool).at[ids.reshape(-1)].set(True)[:P]
    return mask & state.pt_valid


def best_covisible(W, slot, k: int):
    """Top-k covisible KF slots of `slot` by weight (threshold 0 excluded).
    Replaces GetBestCovisibilityKeyFrames (KeyFrame.cc:177-190).
    Returns (slots [k], weights [k]); empty entries have weight 0."""
    w = W[slot]
    weights, slots = jax.lax.top_k(w, k)
    return slots, weights


def essential_edges(W, spanning_parent, loop_edges, threshold: int = ESSENTIAL_THRESHOLD):
    """[K, K] bool symmetric adjacency of the essential graph: spanning tree
    + covisibility edges with weight >= threshold + loop edges
    (reference: Optimizer::OptimizeEssentialGraph edge sets,
    src/Optimizer.cc:566-737)."""
    K = W.shape[0]
    adj = W >= threshold
    rows = jnp.arange(K)
    has_parent = spanning_parent >= 0
    psafe = jnp.clip(spanning_parent, 0, K - 1)
    adj = adj.at[rows, psafe].max(has_parent)
    adj = adj.at[psafe, rows].max(has_parent)
    le = loop_edges  # [K, L]
    lvalid = le >= 0
    lsafe = jnp.clip(le, 0, K - 1)
    rows_l = jnp.broadcast_to(rows[:, None], le.shape)
    adj = adj.at[rows_l, lsafe].max(lvalid)
    adj = adj.at[lsafe, rows_l].max(lvalid)
    return adj & ~jnp.eye(K, dtype=bool)
