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
