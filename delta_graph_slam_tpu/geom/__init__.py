"""SE2/SE3 geometry kernel library (pure JAX, no deps).

Semantics mirror the reference geometry layer
(/root/reference/src/hdl_graph_slam/ros_utils.cpp) but the implementation is
array-native: poses are batched arrays, every function is jit/vmap friendly.
"""

from .se2 import (
    se2_matrix,
    se2_params,
    se2_compose,
    se2_inverse,
    se2_apply,
    se2_exp,
    se2_log,
    normalize_angle,
    rot2,
)
from .se3 import (
    se3_matrix,
    quat_to_rot,
    rot_to_quat,
    euler_xyz_from_rot,
    normalize_euler_angs,
    yaw_from_rot,
    transform_2d_to_3d,
    transform_3d_to_2d,
    se3_inverse,
    se3_apply,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
)
from .projection import (
    EARTH_RADIUS_M,
    mercator_from_gps,
    gps_from_mercator,
)
from .interpolate import interpolate_segment

__all__ = [
    "se2_matrix", "se2_params", "se2_compose", "se2_inverse", "se2_apply",
    "se2_exp", "se2_log", "normalize_angle", "rot2",
    "se3_matrix", "quat_to_rot", "rot_to_quat", "euler_xyz_from_rot",
    "normalize_euler_angs", "yaw_from_rot", "transform_2d_to_3d",
    "transform_3d_to_2d", "se3_inverse", "se3_apply",
    "so3_exp", "so3_log", "se3_exp", "se3_log",
    "EARTH_RADIUS_M", "mercator_from_gps", "gps_from_mercator",
    "interpolate_segment",
]
