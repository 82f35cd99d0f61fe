"""Device ops: dense, fixed-shape batched kernels for the SLAM hot path.

These replace the per-pixel / per-feature CPU loops of the reference
(ORBextractor, ORBmatcher) with whole-image vector ops and dense masked
matrices. TPU-first design notes:

  * FAST, NMS and selection operate on full [H, W] maps (VPU-shaped work),
    not per-cell scalar loops.
  * Matching is a dense masked [N, M] Hamming matrix — the reference's
    64x48 feature grid (src/Frame.cc:109-123) exists because CPUs cannot
    afford brute force; a TPU computes the full 1000x1000 popcount matrix
    in microseconds, so geometric windows become masks, not indices.
"""
