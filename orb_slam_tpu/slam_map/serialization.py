"""Map checkpoint / resume.

The reference has NO map persistence — a crash loses everything
(SURVEY.md §5: only the vocabulary load and the final trajectory dump
exist). Because our whole map is one pytree of arrays, (de)serialization is
a single npz round-trip; the host-side session state (free lists, counters,
trajectory) rides along. This is an improvement over the reference, not a
parity requirement."""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.slam_map.map_state import MapState, MapConfig


def save_map(path: str, state: MapState, extra: dict | None = None):
    """Write the MapState (+ optional JSON-serializable session extras)."""
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    meta = json.dumps(extra or {})
    np.savez_compressed(path, __meta__=np.frombuffer(meta.encode(), np.uint8),
                        **arrays)


def load_map(path: str):
    """Returns (MapState, extras dict)."""
    data = np.load(path)
    extras = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    fields = {f: jnp.asarray(data[f]) for f in MapState._fields}
    return MapState(**fields), extras


def save_session(path: str, system):
    """Checkpoint a running SLAMSystem (map + host bookkeeping + place
    recognition: vocabulary arrays and the keyframe BoW database)."""
    extra = {
        "kf_order": [int(x) for x in system.kf_order],
        "kf_counter": int(system.kf_counter),
        "frame_id": int(system.frame_id),
        "last_pose": np.asarray(system.last_pose).tolist(),
        "velocity": np.asarray(system.velocity).tolist(),
        "state": int(system.state),
        "last_kf_slot": int(system.last_kf_slot),
        "last_kf_frame": int(system.last_kf_frame),
        "ref_kf_tracked": int(system.ref_kf_tracked),
        "trajectory": [
            [int(fid), float(ts), np.asarray(T).tolist()]
            for fid, ts, T in system.trajectory
        ],
        "n_loops_closed": int(getattr(system, "n_loops_closed", 0)),
        # RANSAC determinism + loop-closing cooldown/consistency state must
        # survive resume (advisor finding, round 1)
        "rng_key": np.asarray(system._rng).tolist(),
    }
    if getattr(system, "loop_closer", None) is not None:
        lc = system.loop_closer
        extra["loop_state"] = {
            "last_loop_kf_counter": int(lc.last_loop_kf_counter),
            "consistent_groups": [
                [sorted(int(k) for k in group), int(count)]
                for group, count in lc.consistent_groups
            ],
        }
    arrays = {f: np.asarray(getattr(system.map, f)) for f in system.map._fields}
    if system.vocab is not None:
        v = system.vocab
        arrays.update({
            "__voc_children__": v.children,
            "__voc_desc__": v.node_desc,
            "__voc_leaf__": v.is_leaf.astype(np.uint8),
            "__voc_weight__": v.word_weight,
            "__voc_level__": v.level_of_node,
        })
        extra["voc_kL"] = [int(v.k), int(v.L)]
    if system.db is not None:
        arrays["__db_ids__"] = np.asarray(system.db.bow_ids)
        arrays["__db_w__"] = np.asarray(system.db.bow_w)
        arrays["__db_active__"] = system.db.active.astype(np.uint8)
    meta = json.dumps(extra)
    np.savez_compressed(path, __meta__=np.frombuffer(meta.encode(), np.uint8),
                        **arrays)


def load_session(path: str, system):
    """Restore a checkpoint into an existing (configured) SLAMSystem."""
    data = np.load(path)
    extra = json.loads(bytes(data["__meta__"]).decode())
    state = MapState(**{f: jnp.asarray(data[f]) for f in MapState._fields})
    system.map = state
    if "__voc_children__" in data:
        from orb_slam_tpu.place.vocabulary import Vocabulary
        from orb_slam_tpu.place.database import KeyFrameDatabase
        children = data["__voc_children__"]
        is_leaf = data["__voc_leaf__"].astype(bool)
        word_of_node = np.full(len(children), -1, np.int32)
        leaves = np.where(is_leaf)[0]
        word_of_node[leaves] = np.arange(len(leaves))
        k, L = extra["voc_kL"]
        system.vocab = Vocabulary(
            children=children, node_desc=data["__voc_desc__"],
            is_leaf=is_leaf, word_of_node=word_of_node,
            node_of_word=leaves.astype(np.int32),
            word_weight=data["__voc_weight__"],
            level_of_node=data["__voc_level__"], k=k, L=L)
        if "__db_ids__" in data:
            db = KeyFrameDatabase(
                system.vocab, data["__db_ids__"].shape[0],
                data["__db_ids__"].shape[1])
            db.bow_ids = jnp.asarray(data["__db_ids__"])
            db.bow_w = jnp.asarray(data["__db_w__"])
            db.active = data["__db_active__"].astype(bool)
            system.db = db
            if system.cfg.enable_loop_closing:
                from orb_slam_tpu.pipeline.loop_closing import LoopCloser
                system.loop_closer = LoopCloser(db, system.cfg)
    system.n_loops_closed = extra.get("n_loops_closed", 0)
    if "rng_key" in extra:
        system._rng = jnp.asarray(np.asarray(extra["rng_key"], np.uint32))
    if extra.get("loop_state") and getattr(system, "loop_closer", None) is not None:
        ls = extra["loop_state"]
        system.loop_closer.last_loop_kf_counter = ls["last_loop_kf_counter"]
        system.loop_closer.consistent_groups = [
            (set(group), count) for group, count in ls["consistent_groups"]
        ]
    system.kf_order = np.asarray(extra["kf_order"], np.int64)
    system.kf_counter = extra["kf_counter"]
    system.frame_id = extra["frame_id"]
    system.last_pose = np.asarray(extra["last_pose"], np.float32)
    system.velocity = np.asarray(extra["velocity"], np.float32)
    system.state = extra["state"]
    system.last_kf_slot = extra["last_kf_slot"]
    system.last_kf_frame = extra["last_kf_frame"]
    system.ref_kf_tracked = extra["ref_kf_tracked"]
    system.trajectory = [
        (fid, ts, np.asarray(T, np.float32)) for fid, ts, T in extra["trajectory"]
    ]
    valid = np.asarray(state.pt_valid)
    system.free_pt = [int(i) for i in np.where(~valid)[0]]
    kf_valid = np.asarray(state.kf_valid)
    system.free_kf = [int(i) for i in np.where(~kf_valid)[0]]
    return system
