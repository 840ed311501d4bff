"""Batched Gauss-Newton registration engine (the scan-matching core).

TPU-native replacement for the reference's registration stack
(/root/reference/src/hdl_graph_slam/registrations.cpp: PCL ICP/GICP/NDT,
pclomp NDT_OMP/GICP_OMP, fast_gicp FAST_GICP/FAST_VGICP[/CUDA]): one
fixed-iteration Gauss-Newton loop over SE(3) with pluggable cost heads
(point-to-point ICP, per-point-covariance GICP, voxel-distribution VGICP,
voxel NDT) and brute-force-tiled or voxel-hash correspondence search in
place of kd-trees.
"""

from .config import RegistrationConfig, REGISTRATION_PRESETS
from .covariance import eigh3x3, regularize_covariances, knn_covariances
from .engine import (
    Registration,
    TargetModel,
    RegistrationResult,
    make_registration,
)

__all__ = [
    "RegistrationConfig", "REGISTRATION_PRESETS",
    "eigh3x3", "regularize_covariances", "knn_covariances",
    "Registration", "TargetModel", "RegistrationResult", "make_registration",
]
