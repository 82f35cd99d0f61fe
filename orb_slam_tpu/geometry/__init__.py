"""Geometry core: SO3/SE3/Sim3 Lie groups, camera model, triangulation, Horn.

Replaces the reference's g2o se3quat.h / sim3.h types and the OpenCV
geometry calls (cv::undistortPoints, SVD triangulation, Rodrigues) with
pure-JAX batched equivalents. Everything is shape-polymorphic over leading
batch dims via vmap-friendly design and works in float32 (TPU) or float64
(CPU test oracle).
"""

from orb_slam_tpu.geometry.so3 import (
    so3_exp, so3_log, quat_to_rot, rot_to_quat, quat_mul, quat_normalize,
)
from orb_slam_tpu.geometry.se3 import (
    se3_exp, se3_log, se3_compose, se3_inverse, se3_apply,
    se3_from_rt, se3_rotation, se3_translation, se3_identity,
)
from orb_slam_tpu.geometry.sim3 import (
    sim3_exp, sim3_log, sim3_compose, sim3_inverse, sim3_apply,
    sim3_from_srt, sim3_identity, sim3_to_se3,
)
from orb_slam_tpu.geometry.camera import (
    CameraModel, project, unproject, distort, undistort_points,
)
from orb_slam_tpu.geometry.triangulation import triangulate_dlt, depth_in_frame, parallax_cos
from orb_slam_tpu.geometry.horn import horn_sim3
