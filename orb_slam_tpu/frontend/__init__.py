"""Frontend: ORB feature extraction and data association (matching)."""

from orb_slam_tpu.frontend.orb_extractor import ORBExtractor, ORBFeatures
