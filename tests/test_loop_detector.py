"""LoopDetector unit tests: candidate gating + scan-match validation.

Gates mirror LoopDetector::find_candidates
(/root/reference/include/hdl_graph_slam/loop_detector.hpp:83-111);
validation mirrors ::matching (:119-173).
"""

import numpy as np
import pytest

from delta_graph_slam_tpu import ops
from delta_graph_slam_tpu.pipeline.keyframe import KeyFrame
from delta_graph_slam_tpu.pipeline.loop_detector import LoopDetector
from delta_graph_slam_tpu.register import RegistrationConfig, make_registration


def _scene(seed=0, n=1500):
    """L-shaped wall pair + ground: enough structure to register."""
    rng = np.random.default_rng(seed)
    n3 = n // 3
    ground = np.stack([
        rng.uniform(-10, 10, n3), rng.uniform(-10, 10, n3), np.zeros(n3),
    ], 1)
    wall1 = np.stack([
        rng.uniform(-10, 10, n3), np.full(n3, 6.0), rng.uniform(0, 3, n3),
    ], 1)
    wall2 = np.stack([
        np.full(n - 2 * n3, 7.0), rng.uniform(-10, 10, n - 2 * n3),
        rng.uniform(0, 3, n - 2 * n3),
    ], 1)
    pts = np.concatenate([ground, wall1, wall2])
    return (pts + rng.normal(0, 0.005, pts.shape)).astype(np.float32)


def _kf(node_id, accum, pts=None, stamp=0.0):
    cloud = None if pts is None else ops.make_cloud(pts, capacity=2048)
    return KeyFrame(
        stamp=stamp, odom=np.eye(4), odom2d=np.zeros(3),
        accum_distance=accum, cloud=cloud, flat_cloud=None, node_id=node_id,
    )


def _poses(*xy_th):
    return np.asarray(xy_th, np.float64)


class TestFindCandidates:
    def _detector(self, **kw):
        kw.setdefault("distance_thresh", 5.0)
        kw.setdefault("accum_distance_thresh", 8.0)
        kw.setdefault("min_edge_interval", 5.0)
        return LoopDetector(registration=None, **kw)

    def test_accepts_near_old_keyframe(self):
        det = self._detector()
        old = _kf(0, accum=0.0)
        new = _kf(1, accum=20.0)
        poses = _poses([0.0, 0.0, 0.0], [1.0, 0.5, 0.1])
        cands = det.find_candidates([old], new, poses)
        assert cands == [old]

    def test_min_edge_interval_gate(self):
        """No candidates until the new keyframe is min_edge_interval of
        travel past the last accepted loop edge (loop_detector.hpp:86-88)."""
        det = self._detector()
        det.last_edge_accum_distance = 18.0
        old = _kf(0, accum=0.0)
        new = _kf(1, accum=20.0)  # only 2.0 since last edge < 5.0
        poses = _poses([0.0, 0.0, 0.0], [1.0, 0.0, 0.0])
        assert det.find_candidates([old], new, poses) == []

    def test_accum_distance_gate(self):
        """Recently visited keyframes (< accum_distance_thresh of travel
        apart) are not loop candidates (loop_detector.hpp:95-97)."""
        det = self._detector()
        recent = _kf(0, accum=15.0)
        new = _kf(1, accum=20.0)  # 5.0 apart < 8.0
        poses = _poses([0.0, 0.0, 0.0], [1.0, 0.0, 0.0])
        assert det.find_candidates([recent], new, poses) == []

    def test_distance_gate(self):
        """Candidates beyond distance_thresh in estimated position are
        dropped (loop_detector.hpp:99-105)."""
        det = self._detector()
        far = _kf(0, accum=0.0)
        new = _kf(1, accum=20.0)
        poses = _poses([0.0, 0.0, 0.0], [20.0, 0.0, 0.0])
        assert det.find_candidates([far], new, poses) == []

    def test_gates_use_estimated_not_odom_positions(self):
        """Gating runs on current graph estimates: a candidate whose odom
        drifted far but whose optimized pose is near still qualifies."""
        det = self._detector()
        old = _kf(0, accum=0.0)
        old.odom2d = np.array([50.0, 50.0, 0.0])  # stale odometry
        new = _kf(1, accum=20.0)
        poses = _poses([0.0, 0.0, 0.0], [2.0, 0.0, 0.0])
        assert det.find_candidates([old], new, poses) == [old]


class TestMatching:
    @pytest.fixture(scope="class")
    def registration(self):
        return make_registration(RegistrationConfig(
            method="FAST_GICP", transformation_epsilon=0.01,
            maximum_iterations=40, max_correspondence_distance=2.0,
            correspondence_randomness=10, chunk=512,
        ))

    def test_accepts_true_loop(self, registration):
        det = LoopDetector(
            registration, distance_thresh=5.0, accum_distance_thresh=8.0,
            min_edge_interval=5.0, fitness_score_thresh=0.5,
        )
        pts = _scene()
        # candidate observed the scene from 0.4m ahead, 0.1m left
        true_rel = np.array([0.4, 0.1, 0.0])
        c, s = np.cos(true_rel[2]), np.sin(true_rel[2])
        R = np.array([[c, -s], [s, c]])
        cand_pts = pts.copy()
        cand_pts[:, :2] = (pts[:, :2] - true_rel[:2]) @ R
        cand = _kf(0, accum=0.0, pts=cand_pts)
        new = _kf(1, accum=20.0, pts=pts)
        poses = _poses([true_rel[0], true_rel[1], true_rel[2]],
                       [0.0, 0.0, 0.0])
        loop = det.matching([cand], new, poses)
        assert loop is not None
        assert loop.key1 is new and loop.key2 is cand
        # relative pose ~ candidate pose in the new keyframe's frame
        est = loop.relpose_2d
        assert np.linalg.norm(est[:2] - true_rel[:2]) < 0.1, est
        assert abs(est[2] - true_rel[2]) < 0.05
        # accepting a loop advances the travel-distance latch (:168)
        assert det.last_edge_accum_distance == new.accum_distance

    def test_rejects_bad_fitness(self, registration):
        det = LoopDetector(
            registration, distance_thresh=5.0, accum_distance_thresh=8.0,
            min_edge_interval=5.0, fitness_score_thresh=1e-6,
        )
        pts = _scene(seed=0)
        other = _scene(seed=9) + np.float32([3.0, -2.0, 0.0])
        cand = _kf(0, accum=0.0, pts=other)
        new = _kf(1, accum=20.0, pts=pts)
        poses = _poses([0.0, 0.0, 0.0], [0.5, 0.0, 0.0])
        assert det.matching([cand], new, poses) is None
        assert det.last_edge_accum_distance == 0.0

    def test_empty_candidates(self, registration):
        det = LoopDetector(registration)
        new = _kf(0, accum=20.0, pts=_scene())
        assert det.matching([], new, _poses([0.0, 0.0, 0.0])) is None
