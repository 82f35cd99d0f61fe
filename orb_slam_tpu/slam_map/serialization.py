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
    """Checkpoint a running SLAMSystem (map + host bookkeeping)."""
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
    }
    save_map(path, system.map, extra)


def load_session(path: str, system):
    """Restore a checkpoint into an existing (configured) SLAMSystem."""
    state, extra = load_map(path)
    system.map = state
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
