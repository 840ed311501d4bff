"""Registration engine tests: synthetic transform recovery per cost head."""

import numpy as np
import pytest
import jax.numpy as jnp

from delta_graph_slam_tpu import geom, ops
from delta_graph_slam_tpu.register import (
    RegistrationConfig, make_registration, eigh3x3, regularize_covariances,
)

RNG = np.random.default_rng(3)


def make_structured_scene(n=1200):
    """Walls + ground: surfaces with well-defined normals (GICP needs them)."""
    RNG = np.random.default_rng(3)  # fresh: order-independent scenes
    n1 = n // 3
    ground = np.stack(
        [RNG.uniform(-15, 15, n1), RNG.uniform(-15, 15, n1), np.zeros(n1)], 1
    )
    wall1 = np.stack(
        [RNG.uniform(-15, 15, n1), np.full(n1, 8.0), RNG.uniform(0, 5, n1)], 1
    )
    wall2 = np.stack(
        [np.full(n - 2 * n1, -10.0), RNG.uniform(-15, 15, n - 2 * n1),
         RNG.uniform(0, 5, n - 2 * n1)], 1
    )
    pts = np.concatenate([ground, wall1, wall2])
    return pts + RNG.normal(0, 0.01, pts.shape)


def transform_pts(pts, xi):
    T = np.asarray(geom.se3_exp(jnp.asarray(xi)))
    return pts @ T[:3, :3].T + T[:3, 3], T


TRUE_XI = np.array([0.3, -0.2, 0.05, 0.01, -0.02, 0.06])


class TestEigh3x3:
    def test_matches_numpy(self):
        A = RNG.normal(0, 1, (128, 3, 3))
        A = A @ np.swapaxes(A, 1, 2)
        vals, vecs = eigh3x3(jnp.asarray(A))
        w, V = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(vals), w, atol=1e-7 * np.abs(w).max())
        recon = np.einsum("nij,nj,nkj->nik", np.asarray(vecs), np.asarray(vals), np.asarray(vecs))
        np.testing.assert_allclose(recon, A, atol=1e-6 * np.abs(A).max())

    def test_regularize_plane(self):
        A = RNG.normal(0, 1, (16, 3, 3))
        A = A @ np.swapaxes(A, 1, 2)
        C = np.asarray(regularize_covariances(jnp.asarray(A), mode="plane"))
        w = np.linalg.eigvalsh(C)
        np.testing.assert_allclose(w[:, 0], 1e-3, atol=1e-6)
        np.testing.assert_allclose(w[:, 1:], 1.0, atol=1e-5)


@pytest.mark.parametrize("method", ["ICP", "FAST_GICP", "FAST_VGICP", "NDT_OMP"])
class TestAlign:
    def test_recover_transform(self, method):
        target_pts = make_structured_scene()
        source_pts, T_true = transform_pts(target_pts, -TRUE_XI)
        # T_true maps target->source with -xi; we need source->target = exp(xi)
        T_want = np.asarray(geom.se3_exp(jnp.asarray(TRUE_XI)))

        cfg = RegistrationConfig(
            method=method, resolution=2.0, maximum_iterations=50,
            max_correspondence_distance=2.5, correspondence_randomness=15,
            chunk=512, transformation_epsilon=1e-4,
        )
        reg = make_registration(cfg)
        reg.capacity_voxels = 2048
        src = ops.make_cloud(source_pts.astype(np.float32), capacity=1280)
        tgt = ops.make_cloud(target_pts.astype(np.float32), capacity=1280)
        res = reg.align_pair(src, tgt)
        T = np.asarray(res.transformation)
        err_t = np.linalg.norm(T[:3, 3] - T_want[:3, 3])
        err_r = np.linalg.norm(T[:3, :3] - T_want[:3, :3])
        # voxel-distribution heads carry an O(resolution/20) quantization
        # bias (fast_vgicp/NDT have the same property); point heads are tight
        tol_t = {"ICP": 0.05, "FAST_GICP": 0.05,
                 "FAST_VGICP": 0.15, "NDT_OMP": 0.15}[method]
        assert err_t < tol_t, f"{method}: translation error {err_t}"
        assert err_r < 0.05, f"{method}: rotation error {err_r}"
        assert int(res.num_correspondences) > 500

    def test_identity_stays(self, method):
        pts = make_structured_scene(600)
        cfg = RegistrationConfig(
            method=method, resolution=2.0, maximum_iterations=20,
            correspondence_randomness=15, chunk=512,
        )
        reg = make_registration(cfg)
        reg.capacity_voxels = 2048
        c = ops.make_cloud(pts.astype(np.float32), capacity=640)
        res = reg.align_pair(c, c)
        T = np.asarray(res.transformation)
        # voxel-distribution heads: quantization bias ~ resolution/15
        tol = 0.02 if method in ("ICP", "FAST_GICP") else 0.15
        assert np.linalg.norm(T[:3, 3]) < tol
        assert np.linalg.norm(T[:3, :3] - np.eye(3)) < 0.03


def test_dense_covariance_parity():
    """GICP with dense radius covariances (the TPU default, DIVERGENCES
    #12) recovers the same transform as the kNN covariance model."""
    target_pts = make_structured_scene()
    source_pts, _ = transform_pts(target_pts, -TRUE_XI)
    T_want = np.asarray(geom.se3_exp(jnp.asarray(TRUE_XI)))
    results = {}
    for cov_method in ("knn", "dense"):
        cfg = RegistrationConfig(
            method="FAST_GICP", maximum_iterations=50,
            max_correspondence_distance=2.5, correspondence_randomness=15,
            chunk=512, transformation_epsilon=1e-4,
            cov_method=cov_method, cov_dense_radius=1.0,
        )
        reg = make_registration(cfg)
        reg.capacity_voxels = 2048
        src = ops.make_cloud(source_pts.astype(np.float32), capacity=1280)
        tgt = ops.make_cloud(target_pts.astype(np.float32), capacity=1280)
        res = reg.align_pair(src, tgt)
        results[cov_method] = np.asarray(res.transformation)
        err_t = np.linalg.norm(results[cov_method][:3, 3] - T_want[:3, 3])
        assert err_t < 0.05, f"cov_method={cov_method}: err {err_t}"
    np.testing.assert_allclose(
        results["dense"][:3, 3], results["knn"][:3, 3], atol=0.03
    )
