"""Multi-chip scaling via jax.sharding + shard_map.

The reference is a single-process shared-memory system (SURVEY.md §2.3); its
honest parallelism map is: RANSAC hypothesis fan-out and BA edge blocks =
data parallelism, the dense matching matrix = model/tensor parallelism, the
tracking/mapping/loop-closing stages = pipeline parallelism. This package
shards the first two over a device Mesh with XLA collectives riding ICI:
  * ba_sharded: bundle-adjustment GN step with the point/edge dimension
    sharded over 'data' — partial normal equations psum-reduced, dense
    reduced solve replicated, point back-substitution local to each shard;
  * matching_sharded: the [P, N] Hamming matrix sharded over both mesh axes
    with all-gather argmin combination;
  * ransac_sharded: hypothesis fan-out sharded over 'data' with global
    best-model selection."""

from orb_slam_tpu.parallel.sharding import (
    make_mesh, sharded_ba_step, sharded_hamming_argmin, sharded_ransac_best,
)
