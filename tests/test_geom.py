"""Golden/property tests for the geometry kernel library.

Oracles: scipy.spatial.transform for rotations, closed-form checks for the
reference semantics (ros_utils.cpp:95-194).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from delta_graph_slam_tpu import geom

RNG = np.random.default_rng(0)


def random_rotations(n):
    return Rotation.random(n, random_state=np.random.RandomState(42))


class TestSE2:
    def test_matrix_params_roundtrip(self):
        p = RNG.uniform(-5, 5, (32, 3))
        p[:, 2] = RNG.uniform(-np.pi, np.pi, 32)
        m = geom.se2_matrix(p)
        back = geom.se2_params(m)
        np.testing.assert_allclose(back, p, atol=1e-12)

    def test_compose_matches_matmul(self):
        a = RNG.uniform(-3, 3, (16, 3))
        b = RNG.uniform(-3, 3, (16, 3))
        got = geom.se2_matrix(geom.se2_compose(a, b))
        want = np.einsum("nij,njk->nik", geom.se2_matrix(a), geom.se2_matrix(b))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_inverse(self):
        p = RNG.uniform(-3, 3, (16, 3))
        ident = geom.se2_compose(p, geom.se2_inverse(p))
        np.testing.assert_allclose(ident, np.zeros((16, 3)), atol=1e-12)

    def test_apply(self):
        p = np.array([1.0, 2.0, np.pi / 2])
        pts = np.array([[1.0, 0.0], [0.0, 1.0]])
        out = geom.se2_apply(p, pts)
        np.testing.assert_allclose(out, [[1.0, 3.0], [0.0, 2.0]], atol=1e-12)

    def test_exp_log_roundtrip(self):
        xi = RNG.uniform(-2, 2, (64, 3))
        back = geom.se2_log(geom.se2_exp(xi))
        np.testing.assert_allclose(back, xi, atol=1e-9)

    def test_exp_small_angle(self):
        xi = np.array([[0.5, -0.25, 1e-9], [0.5, -0.25, 0.0]])
        p = geom.se2_exp(xi)
        np.testing.assert_allclose(p[:, :2], xi[:, :2], atol=1e-8)


class TestSE3:
    def test_quat_rot_roundtrip_vs_scipy(self):
        rots = random_rotations(64)
        # scipy uses [x,y,z,w]; ours is [w,x,y,z]
        q_scipy = rots.as_quat()
        q = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
        R = geom.quat_to_rot(q)
        np.testing.assert_allclose(R, rots.as_matrix(), atol=1e-12)
        q_back = geom.rot_to_quat(R)
        # sign-canonicalize both
        q_ref = np.where(q[:, :1] < 0, -q, q)
        np.testing.assert_allclose(q_back, q_ref, atol=1e-9)

    def test_euler_xyz_reconstruction(self):
        """R must equal Rx(a) Ry(b) Rz(c) for the extracted (a,b,c)."""
        R = random_rotations(256).as_matrix()
        eul = np.asarray(geom.euler_xyz_from_rot(R))
        recon = Rotation.from_euler("XYZ", eul).as_matrix()
        np.testing.assert_allclose(recon, R, atol=1e-9)
        # Eigen's range convention: first angle in [0, pi]
        assert np.all(eul[:, 0] >= -1e-12)
        assert np.all(eul[:, 0] <= np.pi + 1e-12)

    def test_yaw_pure_rotation(self):
        yaws = np.linspace(-3.0, 3.0, 25)
        R = Rotation.from_euler("z", yaws[:, None]).as_matrix()
        got = np.asarray(geom.yaw_from_rot(R))
        np.testing.assert_allclose(got, yaws, atol=1e-9)

    def test_yaw_near_planar(self):
        """Yaw recovery with small roll/pitch perturbations (the actual
        odometry use case, ros_utils.cpp:125-131)."""
        yaws = RNG.uniform(-np.pi + 0.05, np.pi - 0.05, 128)
        rp = RNG.uniform(-0.05, 0.05, (128, 2))
        R = Rotation.from_euler(
            "ZYX", np.stack([yaws, rp[:, 0], rp[:, 1]], 1)
        ).as_matrix()
        got = np.asarray(geom.yaw_from_rot(R))
        np.testing.assert_allclose(got, yaws, atol=0.06)

    def test_transform_roundtrip_2d_3d(self):
        p = RNG.uniform(-3, 3, (32, 3))
        p[:, 2] = RNG.uniform(-np.pi + 0.01, np.pi - 0.01, 32)
        back = geom.transform_3d_to_2d(geom.transform_2d_to_3d(p))
        np.testing.assert_allclose(back, p, atol=1e-9)

    def test_se3_inverse_apply(self):
        rots = random_rotations(8)
        T = geom.se3_matrix(rots.as_matrix(), RNG.uniform(-2, 2, (8, 3)))
        ident = np.einsum("nij,njk->nik", T, geom.se3_inverse(T))
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-12)

        pts = RNG.uniform(-5, 5, (8, 100, 3))
        out = geom.se3_apply(T, pts)
        want = np.einsum("nij,nkj->nki", T[:, :3, :3], pts) + T[:, None, :3, 3]
        np.testing.assert_allclose(out, want, atol=1e-12)


class TestProjection:
    def test_mercator_roundtrip(self):
        from delta_graph_slam_tpu.geom.projection import mercator_scale

        lat0 = 49.011  # KITTI-ish
        scale = mercator_scale(lat0)
        lat = RNG.uniform(48.9, 49.1, 64)
        lon = RNG.uniform(8.3, 8.5, 64)
        alt = RNG.uniform(100, 120, 64)
        xyz = geom.mercator_from_gps(lat, lon, alt, scale=scale)
        back = np.asarray(geom.gps_from_mercator(xyz, scale=scale))
        np.testing.assert_allclose(back[:, 0], lat, atol=1e-9)
        np.testing.assert_allclose(back[:, 1], lon, atol=1e-9)
        np.testing.assert_allclose(back[:, 2], alt, atol=1e-9)

    def test_local_metric_scale(self):
        """Near lat0, Mercator distances match great-circle meters to ~0.1%."""
        from delta_graph_slam_tpu.geom.projection import mercator_scale

        lat0 = 49.0
        scale = mercator_scale(lat0)
        p1 = geom.mercator_from_gps(49.0, 8.4, 0.0, scale=scale)
        p2 = geom.mercator_from_gps(49.0, 8.401, 0.0, scale=scale)
        dist = float(jnp.linalg.norm(p2 - p1))
        # 0.001 deg of longitude at lat 49 ~ 73.0 m
        expected = 0.001 * np.pi / 180 * 6378137.0 * np.cos(np.deg2rad(49.0))
        assert abs(dist - expected) / expected < 1e-3


class TestInterpolate:
    def test_matches_reference_semantics(self):
        a = np.array([0.0, 0.0, 5.0])
        b = np.array([1.0, 0.0, -3.0])  # z ignored/flattened
        pts, mask = geom.interpolate_segment(a, b, capacity=512)
        pts = np.asarray(pts)
        mask = np.asarray(mask)
        norm = np.linalg.norm(b - a)
        n_expected = int(np.floor(norm / 0.02)) + 1
        assert mask.sum() == n_expected
        assert np.all(pts[mask][:, 2] == 0.0)
        np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-12)

    def test_batched(self):
        a = RNG.uniform(-1, 1, (5, 2))
        b = RNG.uniform(-1, 1, (5, 2))
        pts, mask = geom.interpolate_segment(a, b, capacity=256)
        assert pts.shape == (5, 256, 2)
        for i in range(5):
            n = int(np.asarray(mask[i]).sum())
            seg = np.linalg.norm(b[i] - a[i])
            assert n == int(np.floor(seg / 0.02)) + 1


class TestTrajectoryMetrics:
    """ate_rpe_se2 — the shared save_map quality summary
    (delta_graph_slam_nodelet.cpp:1204-1280) used by both backends."""

    def test_perfect_trajectory_is_zero(self):
        from delta_graph_slam_tpu.utils.metrics import ate_rpe_se2

        gts = [np.array([t, 0.5 * t, 0.01 * t]) for t in range(6)]
        m = ate_rpe_se2(gts, gts)
        assert m["ATE_mean"] < 1e-12 and m["t_RPE_mean"] < 1e-12
        assert m["r_RPE_mean"] < 1e-12

    def test_rigid_offset_hits_ate_not_rpe(self):
        from delta_graph_slam_tpu.utils.metrics import ate_rpe_se2
        from delta_graph_slam_tpu.geom.host import se2_compose_np

        off = np.array([1.0, -2.0, 0.0])
        gts = [np.array([t, 0.0, 0.0]) for t in range(6)]
        ests = [se2_compose_np(off, g) for g in gts]
        m = ate_rpe_se2(ests, gts)
        np.testing.assert_allclose(m["ATE_mean"], np.hypot(1.0, 2.0),
                                   atol=1e-9)
        # a rigid world-frame offset leaves relative poses untouched
        assert m["t_RPE_mean"] < 1e-9 and m["r_RPE_mean"] < 1e-9

    def test_too_short_returns_none(self):
        from delta_graph_slam_tpu.utils.metrics import ate_rpe_se2

        assert ate_rpe_se2([np.zeros(3)], [np.zeros(3)]) is None
