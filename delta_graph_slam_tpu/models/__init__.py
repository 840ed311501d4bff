"""Assembled pipeline stages mirroring the reference nodelets.

- PrefilteringStage        <- PrefilteringNodelet (apps/prefiltering_nodelet.cpp)
- ScanMatchingOdometry     <- ScanMatchingOdometryNodelet
                              (apps/scan_matching_odometry_nodelet.cpp)
- FloorDetectionStage      <- FloorDetectionNodelet (apps/floor_detection_nodelet.cpp)
- DeltaBackend             <- DeltaGraphSlamNodelet (apps/delta_graph_slam_nodelet.cpp)
- HdlBackend               <- HdlGraphSlamNodelet capability (SE3 + floor/IMU edges)
"""

from .prefiltering import PrefilteringConfig, PrefilteringStage
from .scan_matching_odometry import OdometryConfig, ScanMatchingOdometry, OdometryFrame
from .floor_detection import FloorDetectionConfig, FloorDetectionStage
from .delta_backend import DeltaBackendConfig, DeltaBackend
from .hdl_backend import HdlBackendConfig, HdlBackend

__all__ = [
    "PrefilteringConfig", "PrefilteringStage",
    "OdometryConfig", "ScanMatchingOdometry", "OdometryFrame",
    "FloorDetectionConfig", "FloorDetectionStage",
    "DeltaBackendConfig", "DeltaBackend",
    "HdlBackendConfig", "HdlBackend",
]
