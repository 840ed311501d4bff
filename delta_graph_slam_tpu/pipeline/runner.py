"""End-to-end pipeline runner (the nodelet-manager equivalent).

Wires PrefilteringStage -> ScanMatchingOdometry -> [FloorDetection] ->
backend (Delta SE2 or Hdl SE3) exactly as the launch files wire the
nodelets (/root/reference/launch/delta_graph_slam.launch:23-73), with the
backend's optimization step fired on the graph_update_interval timer
cadence (simulated time based on message stamps for offline replay).
"""

from typing import Optional

import numpy as np

from ..config.presets import PipelineConfig
from ..models.prefiltering import PrefilteringStage
from ..models.scan_matching_odometry import ScanMatchingOdometry
from ..models.floor_detection import FloorDetectionStage
from ..models.delta_backend import DeltaBackend
from ..models.hdl_backend import HdlBackend
from ..utils.profiling import StageTimer


class Pipeline:
    def __init__(self, cfg: PipelineConfig, building_provider=None,
                 base_T: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.prefiltering = PrefilteringStage(cfg.prefiltering)
        self.odometry = ScanMatchingOdometry(cfg.odometry)
        self.floor = (
            FloorDetectionStage(cfg.floor) if cfg.floor is not None else None
        )
        if cfg.delta is not None:
            self.backend = DeltaBackend(cfg.delta, building_provider)
            self._interval = cfg.delta.graph_update_interval
        else:
            self.backend = HdlBackend(cfg.hdl)
            self._interval = 3.0
        self.base_T = np.eye(4) if base_T is None else np.asarray(base_T)
        self.timer = StageTimer()
        self._last_opt_stamp = None
        self.frames_processed = 0
        # read_until flow control (scan_matching_odometry:133-139,
        # delta:220-230): consumers advertise how far they have processed
        from .flow import Watermark

        self.watermark = Watermark()

    # ---- message entry points -----------------------------------------
    def on_gps(self, stamp, lat, lon, alt=0.0):
        self.backend.gps_callback(stamp, lat, lon, alt)

    def on_nmea(self, stamp, sentence):
        if hasattr(self.backend, "nmea_callback"):
            self.backend.nmea_callback(stamp, sentence)

    def on_imu(self, stamp, quat_wxyz, angular_velocity=None,
               linear_acceleration=None):
        if isinstance(self.backend, DeltaBackend):
            self.backend.imu_callback(quat_wxyz)
        else:
            self.backend.imu_callback(
                stamp, quat_wxyz,
                np.zeros(3) if linear_acceleration is None
                else linear_acceleration,
            )

    def on_msf_pose(self, stamp, pose_4x4, after_update=False):
        """IMU-frontend (msf) pose input for the odometry initial guess
        (scan_matching_odometry:142-149, :190-198): the delta between the
        last after-update pose and the latest pose seeds align()."""
        if after_update:
            self._msf_pose_after_update = (stamp, np.asarray(pose_4x4))
        else:
            self._msf_pose = (stamp, np.asarray(pose_4x4))

    def _msf_delta(self):
        p0 = getattr(self, "_msf_pose_after_update", None)
        p1 = getattr(self, "_msf_pose", None)
        if p0 is None or p1 is None:
            return None, ""
        if (
            p0[0] <= self.odometry.keyframe_stamp
            or p1[0] <= self.odometry.keyframe_stamp
        ):
            return None, ""  # msf data is too old (:160-162)
        return np.linalg.inv(p0[1]) @ p1[1], "imu"

    def on_points(self, stamp, points, gt_pose=None, angular_velocity=None):
        """Full per-scan path: prefilter -> odometry -> backend enqueue."""
        with self.timer.stage("prefiltering"):
            out = self.prefiltering.process(
                points, base_T=self.base_T, angular_velocity=angular_velocity
            )
        msf_delta, msf_source = self._msf_delta()
        with self.timer.stage("odometry"):
            frame = self.odometry.matching(
                stamp, out.filtered3d, msf_delta=msf_delta,
                msf_source=msf_source,
            )
        if self.floor is not None and isinstance(self.backend, HdlBackend):
            with self.timer.stage("floor_detection"):
                coeffs = self.floor.detect(out.filtered3d)
            self.backend.floor_coeffs_callback(stamp, coeffs)
        with self.timer.stage("backend_enqueue"):
            if isinstance(self.backend, DeltaBackend):
                self.backend.cloud_callback(
                    stamp, frame.pose, out.filtered3d, out.filtered2d,
                    gt_pose=gt_pose,
                )
            else:
                self.backend.cloud_callback(
                    stamp, frame.pose, out.filtered3d, gt_pose=gt_pose
                )
        self.frames_processed += 1
        # odometry advertises +1 s past the processed stamp (reference
        # scan_matching_odometry:133-139); the backend its own horizon
        self.watermark.advertise("odometry", stamp + 1.0)
        self.watermark.advertise(
            "backend",
            max(getattr(self.backend, "read_until_stamp", 0.0), stamp + 3.0),
        )

        # optimization timer on simulated time
        if self._last_opt_stamp is None:
            self._last_opt_stamp = stamp
        if stamp - self._last_opt_stamp >= self._interval:
            self.optimize()
            self._last_opt_stamp = stamp
        return frame

    def optimize(self):
        with self.timer.stage("optimization_step"):
            return self.backend.optimization_step()

    # ---- finishing -----------------------------------------------------
    def finish(self):
        """Flush all queues and run a final optimization."""
        stats = {}
        for _ in range(10):
            s = self.backend.optimization_step()
            if not s:
                if not getattr(self.backend, "keyframe_queue", None):
                    break
            stats = s or stats
        return stats

    def save_map(self, destination, resolution=0.05):
        return self.backend.save_map(destination, resolution)

    def save_state(self, path):
        """Checkpoint the whole pipeline (backend + odometry stage)."""
        self.backend.save_state(path)
        self.odometry.save_state(str(path) + ".odom.npz")

    def load_state(self, path, **kw):
        self.backend.load_state(path, **kw)
        import os

        odom_path = str(path) + ".odom.npz"
        if os.path.exists(odom_path):
            self.odometry.load_state(
                odom_path, capacity=self.cfg.prefiltering.out_capacity
            )

    def evaluate(self):
        if hasattr(self.backend, "compute_ate_rpe"):
            return self.backend.compute_ate_rpe()
        return None

    def timing_summary(self):
        out = dict(self.timer.summary())
        out.update({f"backend.{k}": v
                    for k, v in self.backend.timer.summary().items()})
        return out
