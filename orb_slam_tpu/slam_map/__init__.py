"""Functional map backend: padded-array world model with validity masks.

Replaces the reference's pointer graph (Map / KeyFrame / MapPoint,
src/Map.cc, src/KeyFrame.cc, src/MapPoint.cc) and all of its mutex
choreography with ONE immutable pytree of fixed-shape arrays (`MapState`)
plus pure update functions. The host orchestrator threads the state through
jitted kernels; there is nothing to lock because nothing is mutated in
place — the TPU-native answer to §2.3 of SURVEY.md."""

from orb_slam_tpu.slam_map.map_state import MapState, MapConfig, empty_map
from orb_slam_tpu.slam_map.covisibility import (
    incidence_matrix, covisibility_weights, observation_counts,
)
from orb_slam_tpu.slam_map.observations import (
    flatten_observations, refresh_point_stats,
)
