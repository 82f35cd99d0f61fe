"""orb_slam_tpu — a TPU-native monocular visual SLAM framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
raulmur/ORB_SLAM (reference study in /root/repo/SURVEY.md): per-frame 6-DoF
camera tracking, sparse landmark mapping with covisibility graph + spanning
tree, bag-of-binary-words place recognition, relocalisation and Sim(3)
loop closing.

Architecture (TPU-first, not a translation):
  * device kernels: dense fixed-shape batched math (ops/, solvers/)
  * functional map state: padded arrays + masks instead of pointer graphs
    (slam_map/)
  * host orchestrator: tracking state machine + pipeline stages (pipeline/)
"""

__version__ = "0.1.0"

# Matmul precision policy (round 4): TPU's DEFAULT f32 dot is a single
# bf16 pass (~4e-3 relative error), which measurably degrades the
# GEOMETRY SOLVERS (BA normal equations drifted converged poses by
# ~4e-2 vs the CPU reference, round 3). Rather than a package-wide
# jax_default_matmul_precision=highest (which also taxed the hot
# extraction/tracking chunk — ~10 fps at the 500 fps gate, PERF.md),
# every solver whose OUTPUT is a pose/point/Sim3 estimate scopes the
# flag itself: utils.dispatch.precise_jit (pose_opt, two_view, epnp,
# sim3, essential_graph, triangulation) and the explicit scopes inside
# solvers/local_ba.py. The throughput kernels use explicit bf16/int8
# operands by design (pyramid resize, patch gathers, Hamming,
# descriptor LUT) and the Pallas kernels never consult the flag.
