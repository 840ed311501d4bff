"""bench.py SE3 CPU-baseline math: the baseline must be a *strong*
stand-in for g2o (analytic EdgeSE3 jacobians, converging robust LM) —
a weak baseline would inflate the reported TPU speedup."""

import numpy as np
import pytest

import bench as B


class TestSE3CpuBaseline:
    def _rand_pose(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        return np.concatenate([rng.normal(0, 5, 3), q])

    def test_analytic_se3_jacobians_match_fd(self):
        rng = np.random.default_rng(3)
        x = np.stack([self._rand_pose(rng) for _ in range(6)])
        ei = np.array([0, 1, 2, 3, 4, 0])
        ej = np.array([1, 2, 3, 4, 5, 3])
        meas = np.stack([self._rand_pose(rng) for _ in range(len(ei))])
        r, Ji, Jj = B._se3_cpu_linearize(x, ei, ej, meas)
        h = 1e-6
        for J, idx in ((Ji, ei), (Jj, ej)):
            Jfd = np.zeros_like(J)
            for d in range(6):
                dv = np.zeros(6)
                dv[d] = h
                xp = B._np_pose7_oplus(x, np.tile(dv, (len(x), 1)))
                xm = B._np_pose7_oplus(x, np.tile(-dv, (len(x), 1)))
                for e in range(len(ei)):
                    xa, xb = x.copy(), x.copy()
                    xa[idx[e]] = xp[idx[e]]
                    xb[idx[e]] = xm[idx[e]]
                    ra, _, _ = B._se3_cpu_linearize(
                        xa, ei[e:e + 1], ej[e:e + 1], meas[e:e + 1])
                    rb, _, _ = B._se3_cpu_linearize(
                        xb, ei[e:e + 1], ej[e:e + 1], meas[e:e + 1])
                    Jfd[e, :, d] = (ra[0] - rb[0]) / (2 * h)
            assert np.abs(J - Jfd).max() < 1e-5

    def test_np_plane_math_matches_jax(self):
        """numpy plane ominus/oplus twins must match graph/se3_graph.py."""
        import jax.numpy as jnp
        from delta_graph_slam_tpu.graph.se3_graph import (
            error_se3_plane, plane_oplus)

        rng = np.random.default_rng(5)
        poses = np.stack([self._rand_pose(rng) for _ in range(4)])
        plane = np.array([0.1, -0.05, 0.99, 0.3])
        plane /= np.linalg.norm(plane[:3])
        meas = np.stack([p / np.linalg.norm(p[:3]) for p in
                         rng.normal(size=(4, 4))])
        got = B._np_error_se3_plane(poses, np.broadcast_to(plane, (4, 4)),
                                    meas)
        want = np.stack([
            np.asarray(error_se3_plane(jnp.asarray(poses[k]),
                                       jnp.asarray(plane),
                                       jnp.asarray(meas[k])))
            for k in range(4)
        ])
        np.testing.assert_allclose(got, want, atol=1e-5)

        d = rng.normal(0, 0.1, (3, 3))
        got = B._np_plane_oplus(np.broadcast_to(plane, (3, 4)), d)
        want = np.stack([
            np.asarray(plane_oplus(jnp.asarray(plane), jnp.asarray(d[k])))
            for k in range(3)
        ])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_cpu_lm_converges(self):
        ms, it, chi2, ate = B.bench_pose_graph_se3_cpu(n_nodes=128,
                                                       max_iters=20)
        b, gt = B._build_bench_graph_se3(128)
        init = np.stack(b.poses)
        init_ate = float(np.mean(np.linalg.norm(
            init[:, :3] - gt[:, :3], axis=1)))
        assert ate < 0.3 * init_ate, (ate, init_ate)
        assert chi2 < 1.0
