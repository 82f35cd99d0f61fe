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

# f32 matmuls at FULL f32 accuracy: TPU's DEFAULT f32 dot is a single
# bf16 pass (~4e-3 relative error), which measurably degrades the
# geometry solvers (BA normal equations drifted poses by ~4e-2 vs the
# CPU reference before this, round 3). The throughput-critical kernels
# are unaffected — they use EXPLICIT bf16/int8 operands by design
# (pyramid resize, patch gathers, Hamming, descriptor LUT), and the
# Pallas kernels don't consult this flag. No-op on CPU backends.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
