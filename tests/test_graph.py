"""Pose-graph solver tests: SE2/SE3 LM against closed-form / scipy oracles."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from delta_graph_slam_tpu.graph import (
    SE2GraphBuilder, SE3GraphBuilder, SolverConfig,
    optimize_se2, optimize_se3, robust_rho, robust_weight, kernel_id,
)
from delta_graph_slam_tpu.geom import se2_compose, se2_inverse

RNG = np.random.default_rng(11)
CFG_DENSE = SolverConfig(backend="dense", max_iterations=50)
CFG_CG = SolverConfig(backend="cg", max_iterations=50, cg_max_iters=200)


def relpose(a, b):
    return np.asarray(se2_compose(se2_inverse(jnp.asarray(a)), jnp.asarray(b)))


class TestRobust:
    def test_huber(self):
        e2 = jnp.asarray([0.5, 4.0])
        ks = jnp.asarray([kernel_id("Huber")] * 2)
        d = jnp.asarray([1.0, 1.0])
        rho = np.asarray(robust_rho(e2, ks, d))
        np.testing.assert_allclose(rho[0], 0.5)
        np.testing.assert_allclose(rho[1], 2 * 1 * 2 - 1)  # 2*delta*sqrt(e2)-d2
        w = np.asarray(robust_weight(e2, ks, d))
        np.testing.assert_allclose(w, [1.0, 0.5])

    def test_none_passthrough(self):
        e2 = jnp.asarray([3.0])
        ks = jnp.asarray([0])
        rho = robust_rho(e2, ks, jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(rho), [3.0])

    def test_weight_is_rho_derivative(self):
        """Finite-difference check for every kernel."""
        from delta_graph_slam_tpu.graph.robust import ROBUST_KERNELS

        e2 = np.linspace(0.1, 6.0, 13)
        h = 1e-6
        for k, name in enumerate(ROBUST_KERNELS):
            if name == "DCS":
                # g2o's DCS weight is the covariance-scaling s^2, not
                # d rho/d e2 (DCS is not an M-estimator); skip the check
                continue
            ids = jnp.full(e2.shape, k, jnp.int32)
            ds = jnp.full(e2.shape, 1.3)
            r1 = np.asarray(robust_rho(jnp.asarray(e2 + h), ids, ds))
            r0 = np.asarray(robust_rho(jnp.asarray(e2 - h), ids, ds))
            w = np.asarray(robust_weight(jnp.asarray(e2), ids, ds))
            np.testing.assert_allclose(
                (r1 - r0) / (2 * h), w, atol=1e-4,
                err_msg=f"kernel {name}",
            )


@pytest.mark.parametrize("cfg", [CFG_DENSE, CFG_CG], ids=["dense", "cg"])
class TestSE2Optimize:
    def _ring_graph(self, n=20, noise=0.05, seed=5):
        """Noisy odometry around a circle + loop closure; gt recoverable."""
        rng = np.random.default_rng(seed)
        gt = []
        for k in range(n):
            ang = 2 * np.pi * k / n
            gt.append([np.cos(ang) * 5, np.sin(ang) * 5, ang + np.pi / 2])
        gt = np.asarray(gt)
        b = SE2GraphBuilder()
        # noisy initial estimates
        for k in range(n):
            p = gt[k] + rng.normal(0, noise, 3) * (k > 0)
            b.add_vertex(p, fixed=(k == 0))
        info = np.diag([100.0, 100.0, 400.0])
        for k in range(n - 1):
            meas = relpose(gt[k], gt[k + 1])
            b.add_se2_edge(k, k + 1, meas, info)
        b.add_se2_edge(n - 1, 0, relpose(gt[-1], gt[0]), info)
        return b, gt

    def test_ring_converges_to_gt(self, cfg):
        b, gt = self._ring_graph()
        g = b.to_arrays()
        poses, stats = optimize_se2(g, level=0, config=cfg)
        poses = np.asarray(poses)[: len(gt)]
        assert float(stats.chi2_final) < 1e-9
        err = np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1)
        np.testing.assert_array_less(err, 1e-4)

    def test_priors(self, cfg):
        b = SE2GraphBuilder()
        b.add_vertex([0.0, 0.0, 0.0])
        b.add_vertex([1.0, 0.0, 0.0])
        info = np.eye(3)
        # chain of redundant edges so the graph passes the min_edges gate
        for _ in range(5):
            b.add_se2_edge(0, 1, [1.0, 0.0, 0.0], info)
        b.add_prior_xy(0, [2.0, 3.0], np.eye(2) * 1000)
        for _ in range(4):
            b.add_prior_yaw(1, 0.5, 1000.0)
        g = b.to_arrays()
        poses, stats = optimize_se2(g, level=0, config=cfg)
        poses = np.asarray(poses)
        np.testing.assert_allclose(poses[0][:2], [2.0, 3.0], atol=1e-2)
        np.testing.assert_allclose(poses[1][2], 0.5, atol=1e-2)

    def test_level_masking(self, cfg):
        b = SE2GraphBuilder()
        v0 = b.add_vertex([0.0, 0.0, 0.0], fixed=True)
        v1 = b.add_vertex([1.0, 0.0, 0.0])
        v2 = b.add_vertex([5.0, 5.0, 0.0])  # only touched by level-1 edge
        info = np.eye(3) * 100
        for _ in range(10):
            b.add_se2_edge(v0, v1, [2.0, 0.0, 0.0], info, level=0)
        b.add_se2_edge(v0, v2, [0.0, 1.0, 0.0], info, level=1)
        g = b.to_arrays()
        poses0, _ = optimize_se2(g, level=0, config=cfg)
        poses0 = np.asarray(poses0)
        # v1 moved to the level-0 measurement, v2 untouched
        np.testing.assert_allclose(poses0[v1], [2.0, 0.0, 0.0], atol=1e-4)
        np.testing.assert_allclose(poses0[v2], [5.0, 5.0, 0.0], atol=1e-12)

    def test_fixed_vertices(self, cfg):
        b = SE2GraphBuilder()
        v0 = b.add_vertex([1.0, 1.0, 0.3], fixed=True)
        v1 = b.add_vertex([0.0, 0.0, 0.0])
        for _ in range(10):
            b.add_se2_edge(v0, v1, [1.0, 0.0, 0.0], np.eye(3))
        g = b.to_arrays()
        poses, _ = optimize_se2(g, level=0, config=cfg)
        poses = np.asarray(poses)
        np.testing.assert_allclose(poses[v0], [1.0, 1.0, 0.3], atol=1e-12)
        want = np.asarray(se2_compose(jnp.asarray(poses[v0]), jnp.asarray([1.0, 0, 0])))
        np.testing.assert_allclose(poses[v1], want, atol=1e-6)

    def test_huber_rejects_outlier_loop(self, cfg):
        def run(kernel):
            b, gt = self._ring_graph(noise=0.02)
            b.add_se2_edge(3, 12, [20.0, 20.0, 1.0], np.eye(3) * 100,
                           kernel=kernel, delta=1.0)
            poses, _ = optimize_se2(b.to_arrays(), level=0, config=cfg)
            poses = np.asarray(poses)[: len(gt)]
            return np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1).max()

        err_huber = run("Huber")
        err_none = run("NONE")
        # Huber's linear tail still pulls a little; squared loss explodes
        assert err_huber < 1.0
        assert err_none > 3.0 * err_huber
        # Cauchy suppresses the outlier almost entirely
        assert run("Cauchy") < 0.2

    def test_min_edges_skip(self, cfg):
        b = SE2GraphBuilder()
        b.add_vertex([0.0, 0.0, 0.0])
        b.add_vertex([3.0, 0.0, 0.0])
        b.add_se2_edge(0, 1, [1.0, 0.0, 0.0], np.eye(3))
        g = b.to_arrays()
        poses, stats = optimize_se2(g, level=0, config=cfg)
        np.testing.assert_allclose(np.asarray(poses)[:2, 0], [0.0, 3.0])
        assert int(stats.iterations) == -1


class TestToArraysCache:
    """to_arrays is called 3+ times per backend cycle; unchanged tables
    must be reused (same device buffers), changed ones repacked."""

    def _b(self):
        from delta_graph_slam_tpu.graph import SE2GraphBuilder

        b = SE2GraphBuilder()
        b.add_vertex([0, 0, 0], fixed=True)
        b.add_vertex([1, 0, 0])
        b.add_se2_edge(0, 1, [1, 0, 0], np.eye(3))
        b.add_prior_xy(1, [1, 0], np.eye(2))
        return b

    def test_unchanged_tables_are_reused(self):
        b = self._b()
        g1 = b.to_arrays()
        g2 = b.to_arrays()
        assert g2.edges.meas is g1.edges.meas
        assert g2.poses is g1.poses

    def test_pose_update_only_touches_vertices(self):
        b = self._b()
        g1 = b.to_arrays()
        b.set_pose(1, [2.0, 0.0, 0.0])
        g2 = b.to_arrays()
        assert g2.edges.meas is g1.edges.meas          # edges reused
        assert g2.poses is not g1.poses
        np.testing.assert_allclose(np.asarray(g2.poses)[1], [2, 0, 0])

    def test_edge_add_and_remove_invalidate(self):
        b = self._b()
        g1 = b.to_arrays()
        eid = b.add_se2_edge(1, 0, [-1, 0, 0], np.eye(3))
        g2 = b.to_arrays()
        assert int(np.asarray(g2.edges.mask).sum()) == 2
        assert g2.priors_xy.meas is g1.priors_xy.meas  # untouched type
        b.remove_edge(eid)
        g3 = b.to_arrays()
        assert int(np.asarray(g3.edges.mask).sum()) == 1

    def test_capacity_growth_rebuilds(self):
        b = self._b()
        g1 = b.to_arrays()
        cap = g1.edges.i.shape[0]
        for k in range(cap + 1):
            b.add_se2_edge(0, 1, [1, 0, 0], np.eye(3))
        g2 = b.to_arrays()
        assert g2.edges.i.shape[0] > cap
        assert int(np.asarray(g2.edges.mask).sum()) == cap + 2

    def test_set_fixed_invalidates_vertices(self):
        b = self._b()
        g1 = b.to_arrays()
        b.set_fixed(1, True)
        g2 = b.to_arrays()
        assert bool(np.asarray(g2.fixed)[1])
        assert g2.edges.meas is g1.edges.meas


@pytest.mark.slow
class TestSE3Optimize:
    def _chain(self, n=8, seed=2):
        rng = np.random.default_rng(seed)
        gt_R = Rotation.random(n, random_state=np.random.RandomState(4))
        gt_t = rng.uniform(-3, 3, (n, 3))
        gts = []
        for k in range(n):
            T = np.eye(4)
            T[:3, :3] = gt_R[k].as_matrix()
            T[:3, 3] = gt_t[k]
            gts.append(T)
        return gts

    def test_chain_converges(self):
        gts = self._chain()
        n = len(gts)
        b = SE3GraphBuilder()
        rng = np.random.default_rng(0)
        for k, T in enumerate(gts):
            Tn = T.copy()
            if k > 0:
                Tn[:3, 3] += rng.normal(0, 0.1, 3)
            b.add_se3_node(Tn, fixed=(k == 0))
        info = np.eye(6) * 100
        for k in range(n - 1):
            rel = np.linalg.inv(gts[k]) @ gts[k + 1]
            b.add_se3_edge(k, k + 1, rel, info)
        for k in range(n - 2):
            rel = np.linalg.inv(gts[k]) @ gts[k + 2]
            b.add_se3_edge(k, k + 2, rel, info)
        g = b.to_arrays()
        (poses, planes, points), stats = optimize_se3(g, level=0, config=CFG_CG)
        poses = np.asarray(poses)[:n]
        assert float(stats.chi2_final) < 1e-6
        for k, T in enumerate(gts):
            np.testing.assert_allclose(poses[k][:3], T[:3, 3], atol=1e-3)

    def test_priors_and_plane(self):
        b = SE3GraphBuilder()
        T0 = np.eye(4)
        v0 = b.add_se3_node(T0, fixed=True)
        T1 = np.eye(4)
        T1[:3, 3] = [1.0, 0.2, -0.1]
        v1 = b.add_se3_node(T1)
        # floor plane z=0: coeffs (0,0,1,0); plane vertex + se3-plane edges
        p0 = b.add_plane_node([0.0, 0.0, 1.0, 0.0])
        info6 = np.eye(6) * 10
        rel = np.eye(4)
        rel[:3, 3] = [1.0, 0.0, 0.0]
        for _ in range(6):
            b.add_se3_edge(v0, v1, rel, info6)
        for v in (v0, v1):
            b.add_se3_plane_edge(v, p0, [0.0, 0.0, 1.0, 0.0], np.eye(3) * 100)
        b.add_se3_prior_xyz_edge(v1, [1.0, 0.0, 0.0], np.eye(3) * 100)
        b.add_se3_prior_xy_edge(v1, [1.0, 0.0], np.eye(2) * 100)
        b.add_se3_prior_quat_edge(v1, [1.0, 0.0, 0.0, 0.0], np.eye(3) * 100)
        b.add_se3_prior_vec_edge(v1, [0.0, 0.0, 1.0], [0.0, 0.0, 1.0], np.eye(3) * 10)
        g = b.to_arrays()
        (poses, planes, points), stats = optimize_se3(g, level=0, config=CFG_CG)
        poses = np.asarray(poses)
        np.testing.assert_allclose(poses[v1][:3], [1.0, 0.0, 0.0], atol=1e-3)
        q = poses[v1][3:7]
        np.testing.assert_allclose(np.abs(q[0]), 1.0, atol=1e-3)

    def test_plane_plane_edges(self):
        b = SE3GraphBuilder()
        v = b.add_se3_node(np.eye(4), fixed=True)
        pa = b.add_plane_node([0.0, 0.02, 1.0, -2.0])
        pb = b.add_plane_node([0.0, 0.0, 1.0, -2.5], fixed=True)
        for _ in range(10):
            b.add_plane_identity_edge(pa, pb, np.zeros(4), np.eye(4) * 100)
        g = b.to_arrays()
        (poses, planes, _), stats = optimize_se3(g, level=0, config=CFG_CG)
        planes = np.asarray(planes)
        np.testing.assert_allclose(planes[pa], planes[pb], atol=1e-3)


class TestChainBackend:
    """Direct BCR + Woodbury solver (graph/chain_solve.py)."""

    def test_bcr_matches_dense_tridiag(self):
        from delta_graph_slam_tpu.graph.chain_solve import (
            bcr_apply, bcr_factor,
        )

        rng = np.random.default_rng(3)
        M, D, R = 64, 3, 2
        A = np.zeros((M, D, D))
        B = np.zeros((M, D, D))
        for k in range(M):
            Q = rng.normal(size=(D, D))
            A[k] = Q @ Q.T + 5 * np.eye(D)
        B[1:] = 0.5 * rng.normal(size=(M - 1, D, D))
        g = rng.normal(size=(M, D, R))
        T = np.zeros((M * D, M * D))
        for k in range(M):
            T[k*D:(k+1)*D, k*D:(k+1)*D] = A[k]
        for k in range(1, M):
            T[k*D:(k+1)*D, (k-1)*D:k*D] = B[k]
            T[(k-1)*D:k*D, k*D:(k+1)*D] = B[k].T
        want = np.linalg.solve(T, g.reshape(M * D, R))
        factors = bcr_factor(
            jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
            base_blocks=8,
        )
        got = np.asarray(
            bcr_apply(factors, jnp.asarray(g, jnp.float32))
        ).reshape(M * D, R)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())

    def _lap_graph(self, n=96):
        # n=96 keeps the fast CI gate under budget: the df chain program
        # pads to 128 blocks and XLA-CPU compile time scales with the
        # unrolled BCR level count (measured 80s at n=220 vs ~25s here);
        # the 512-node quality check lives in the slow-marked
        # test_chain_reaches_trusted_f64_optimum.
        rng = np.random.default_rng(11)
        b = SE2GraphBuilder()
        lap = n // 2
        gt = np.zeros((n, 3))
        dyaw = 2 * np.pi / lap
        for k in range(1, n):
            c, s = np.cos(gt[k-1, 2]), np.sin(gt[k-1, 2])
            gt[k] = [gt[k-1, 0] + c, gt[k-1, 1] + s, gt[k-1, 2] + dyaw]
        info = np.diag([100.0, 100.0, 400.0])
        est = np.zeros((n, 3))
        for k in range(n):
            b.add_vertex(gt[k] + (rng.normal(0, 0.05, 3) if k else 0),
                         fixed=(k == 0))
        for k in range(n - 1):
            b.add_se2_edge(k, k + 1, relpose(gt[k], gt[k + 1]), info)
        for k in range(0, lap - 1, 20):
            b.add_se2_edge(k, k + lap, relpose(gt[k], gt[k + lap]),
                           info, kernel="Huber", delta=1.0)
        b.add_prior_xy(3, gt[3][:2], np.eye(2) * 10.0)
        return b, gt

    @pytest.mark.slow
    def test_chain_reaches_trusted_f64_optimum(self):
        """The df chain backend must land on the same optimum as a
        trusted f64 robust-LM (Huber IRLS + g2o lambda schedule, sparse
        SuperLU) on a metric-scale two-lap graph — the r2 failure mode
        was an f32 stall 77% above the true optimum (VERDICT r2 #1)."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spl

        n = 512
        b, gt = self._bench_like_graph(n)
        g = b.to_arrays()
        cfg = SolverConfig(backend="chain", max_iterations=60)
        poses, stats = optimize_se2(g, level=0, config=cfg)
        chain_chi2 = float(stats.chi2_final)

        # trusted f64 robust LM on the identical graph
        import sys as _sys, os as _os
        _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
        from bench import (
            _cpu_graph_arrays, _cpu_linearize, _cpu_robust,
        )

        x = np.asarray(b.poses, np.float64).copy()
        ei, ej, meas, infos, huber, dk = _cpu_graph_arrays(b)
        a3 = np.arange(3)
        lam, nu = 1e-5 * 400, 2.0
        r, Ji, Jj = _cpu_linearize(x, ei, ej, meas)
        chi2, w = _cpu_robust(r, infos, huber, dk)
        for _ in range(60):
            Wf = infos * w[:, None, None]
            JiT_W = np.einsum("eba,ebc->eac", Ji, Wf)
            JjT_W = np.einsum("eba,ebc->eac", Jj, Wf)
            rows, cols, vals = [], [], []

            def blocks(bi, bj, M):
                rr = 3 * bi[:, None, None] + a3[None, :, None]
                cc = 3 * bj[:, None, None] + a3[None, None, :]
                rows.append(np.broadcast_to(rr, M.shape).ravel())
                cols.append(np.broadcast_to(cc, M.shape).ravel())
                vals.append(M.ravel())

            blocks(ei, ei, JiT_W @ Ji)
            blocks(ei, ej, JiT_W @ Jj)
            blocks(ej, ei, (JiT_W @ Jj).transpose(0, 2, 1))
            blocks(ej, ej, JjT_W @ Jj)
            Hb = np.zeros(3 * n)
            np.add.at(Hb, (3 * ei[:, None] + a3).ravel(),
                      np.einsum("eab,eb->ea", JiT_W, r).ravel())
            np.add.at(Hb, (3 * ej[:, None] + a3).ravel(),
                      np.einsum("eab,eb->ea", JjT_W, r).ravel())
            vals.append(np.full(3, 1e12))
            rows.append(a3.astype(np.int64))
            cols.append(a3.astype(np.int64))
            H = sp.coo_matrix(
                (np.concatenate(vals),
                 (np.concatenate(rows), np.concatenate(cols))),
                shape=(3 * n, 3 * n),
            ).tocsc() + sp.identity(3 * n, format="csc") * lam
            dx = spl.splu(H).solve(-Hb)
            xt = x + dx.reshape(n, 3)
            xt[:, 2] = (xt[:, 2] + np.pi) % (2 * np.pi) - np.pi
            rt, Jit, Jjt = _cpu_linearize(xt, ei, ej, meas)
            chi2_t, w_t = _cpu_robust(rt, infos, huber, dk)
            if chi2_t < chi2:
                x, chi2, r, Ji, Jj, w = xt, chi2_t, rt, Jit, Jjt, w_t
                lam = max(lam / 3.0, 1e-12)
                nu = 2.0
            else:
                lam *= nu
                nu *= 2.0

        assert chain_chi2 <= chi2 * 1.02 + 1e-9, (
            f"chain {chain_chi2} vs trusted {chi2}"
        )

    def _bench_like_graph(self, n=512):
        """Metric-scale two-lap circle with odometry-integrated init
        (all initial error in the loop residuals) — the bench.py shape."""
        rng = np.random.default_rng(7)

        def wrap(a):
            return (a + np.pi) % (2 * np.pi) - np.pi

        def compose(a, m):
            c, s = np.cos(a[2]), np.sin(a[2])
            return np.array([a[0] + c * m[0] - s * m[1],
                             a[1] + s * m[0] + c * m[1], wrap(a[2] + m[2])])

        lap = n // 2
        dyaw = 2.0 * np.pi / lap
        gt = np.zeros((n, 3))
        for k in range(1, n):
            gt[k] = compose(gt[k - 1], [1.0, 0.0, dyaw])
        meas = [np.asarray(relpose(gt[k], gt[k + 1]))
                + rng.normal(0, [0.01, 0.01, 0.002])
                for k in range(n - 1)]
        init = np.zeros((n, 3))
        for k in range(1, n):
            init[k] = compose(init[k - 1], meas[k - 1])
        b = SE2GraphBuilder()
        info = np.diag([100.0, 100.0, 400.0])
        for k in range(n):
            b.add_vertex(init[k], fixed=(k == 0))
        for k in range(n - 1):
            b.add_se2_edge(k, k + 1, meas[k], info)
        for k in range(0, lap - 1, 40):
            m = np.asarray(relpose(gt[k], gt[k + lap])) + rng.normal(0, 0.005, 3)
            b.add_se2_edge(k, k + lap, m, info, kernel="Huber", delta=1.0)
        return b, gt

    def test_chain_lm_matches_dense_backend(self):
        b, gt = self._lap_graph()
        g = b.to_arrays()
        cfg_d = SolverConfig(backend="dense", max_iterations=40)
        cfg_c = SolverConfig(backend="chain", max_iterations=40,
                             chain_offrank_capacity=16, chain_base_blocks=8)
        pd, sd = optimize_se2(g, level=0, config=cfg_d)
        pc, sc = optimize_se2(g, level=0, config=cfg_c)
        # same optimum quality (chi2), ~same solution
        assert float(sc.chi2_final) <= 1.05 * float(sd.chi2_final) + 1e-3
        n = len(b.poses)
        np.testing.assert_allclose(
            np.asarray(pc)[:n, :2], np.asarray(pd)[:n, :2], atol=0.05
        )

    def test_chain_offrank_overflow_flag(self):
        from delta_graph_slam_tpu.graph.chain_solve import chain_solve
        from delta_graph_slam_tpu.graph.solver import _linearize, _free_mask
        from delta_graph_slam_tpu.graph.lm_core import gradient

        b, gt = self._lap_graph()
        g = b.to_arrays()
        from delta_graph_slam_tpu.geom.dfloat import DF
        sysm, _ = _linearize(g, DF(g.poses, jnp.zeros_like(g.poses)), 0)
        free = _free_mask(g, 0)
        N = g.poses.shape[0]
        bvec = gradient(sysm, N)
        _, nd = chain_solve(sysm, -bvec, free, jnp.asarray(1e-4, np.float32),
                            N, K_cap=1, base_blocks=8)
        # the n=96 lap graph has 2 free-free lap loops ((20,68),(40,88);
        # (0,48) is anchored on the fixed vertex) — they don't fit 1 slot
        assert int(nd) == 1

    def test_chain_first_layout_matches_generic(self):
        """to_arrays(chain_first=True) + n_chain (the shift-based fast
        assembly) must produce the same solve as the generic scatter
        path — including REVERSED odometry-edge storage (the delta
        backend adds them new->prev, delta_graph_slam_nodelet.cpp:570)
        and interleaved non-chain vertices."""
        rng = np.random.default_rng(5)
        n = 48
        b = SE2GraphBuilder()
        info = np.diag([100.0, 100.0, 400.0])
        gt = np.zeros((n, 3))
        for k in range(1, n):
            c, s = np.cos(gt[k-1, 2]), np.sin(gt[k-1, 2])
            gt[k] = [gt[k-1, 0] + c, gt[k-1, 1] + s,
                     gt[k-1, 2] + 2 * np.pi / (n // 2)]
        for k in range(n):
            b.add_vertex(gt[k] + (rng.normal(0, 0.05, 3) if k else 0),
                         fixed=(k == 0))
        for k in range(n - 1):
            if k % 2:        # forward storage
                b.add_se2_edge(k, k + 1, relpose(gt[k], gt[k + 1]), info)
            else:            # reversed storage (delta convention)
                b.add_se2_edge(k + 1, k, relpose(gt[k + 1], gt[k]), info)
        for k in range(0, n // 2 - 1, 12):
            b.add_se2_edge(k, k + n // 2, relpose(gt[k], gt[k + n // 2]),
                           info, kernel="Huber", delta=1.0)
        b.add_prior_xy(3, gt[3][:2], np.eye(2) * 10.0)
        b.add_prior_yaw(5, gt[5][2], 25.0)

        cfg = SolverConfig(backend="chain", max_iterations=30,
                           chain_offrank_capacity=8, chain_base_blocks=8)
        g0 = b.to_arrays()
        p0, s0 = optimize_se2(g0, level=0, config=cfg)
        g1 = b.to_arrays(chain_first=True)
        p1, s1 = optimize_se2(g1, level=0, config=cfg,
                              n_chain=g1.poses.shape[0] - 1)
        assert abs(float(s1.chi2_final) - float(s0.chi2_final)) <= (
            1e-4 * float(s0.chi2_final) + 1e-8
        )
        np.testing.assert_allclose(np.asarray(p1)[:n], np.asarray(p0)[:n],
                                   atol=1e-4)

    def test_chain_level_masking_and_fixed(self):
        # level-2-style solve: big level-0 graph, tiny stiff level-2 edge
        b = SE2GraphBuilder()
        prev = b.add_vertex([0, 0, 0], fixed=True)
        for k in range(1, 14):
            v = b.add_vertex([float(k), 0, 0])
            b.add_se2_edge(prev, v, [1.0, 0, 0], np.eye(3) * 100, level=0)
            prev = v
        va = b.add_vertex([0.0, 50.0, 0.0])
        vb = b.add_vertex([12.2, 50.0, 0.0])
        b.add_prior_xy(va, [0.0, 50.0], np.eye(2) * 0.001, level=1)
        b.add_prior_xy(vb, [12.2, 50.0], np.eye(2) * 0.001, level=1)
        b.add_se2_edge(va, vb, [15.01, 0.0, 0.0], np.eye(3) * 1e4, level=2)
        g = b.to_arrays()
        cfg = SolverConfig(backend="chain", max_iterations=30,
                           chain_offrank_capacity=4, chain_base_blocks=8)
        poses, stats = optimize_se2(g, level=2, config=cfg)
        p = np.asarray(poses)
        np.testing.assert_allclose(p[vb] - p[va], [15.01, 0, 0], atol=1e-2)
        # level-0 vertices untouched by the level-2 solve
        np.testing.assert_allclose(p[1], [1.0, 0, 0], atol=1e-5)


@pytest.mark.slow
class TestHubSolve:
    """Hub-elimination direct solve (graph/hub_solve.py): chain poses +
    dense-eliminated hub vertices (SE3 floor planes / landmarks).

    Slow: the D=6 df BCR programs take minutes to compile on the 1-core
    CI host (the math itself is milliseconds)."""

    def _system(self, Vc=12, nh=2, D=6, seed=0):
        rng = np.random.default_rng(seed)
        N = Vc + nh
        rows = []                                 # (i, j, Ji, Jj, W)

        def spd():
            M = rng.normal(size=(D, D))
            return (M @ M.T + D * np.eye(D)) * 0.1

        def J():
            return rng.normal(size=(D, D))

        z = np.zeros((D, D))
        for k in range(Vc - 1):                   # odometry chain
            rows.append((k, k + 1, J(), J(), spd()))
        rows.append((2, 9, J(), J(), spd()))      # loop closure
        # pose<->hub couplings, both stored orientations
        for p, h, revd in ((1, 0, False), (3, 0, True), (5, 0, False),
                           (7, 1, True), (8, 1, False)):
            if revd:
                rows.append((Vc + h, p, J(), J(), spd()))
            else:
                rows.append((p, Vc + h, J(), J(), spd()))
        rows.append((4, 4, J(), z, spd()))        # unary pose prior
        rows.append((Vc + 1, Vc + 1, J(), z, spd()))  # unary hub prior
        rows.append((Vc, Vc + 1, J(), J(), spd()))    # hub-hub edge
        rows.append((0, 5, J(), J(), np.zeros((D, D))))  # dead padded row

        free = np.ones((N, D), np.float32)
        free[0] = 0.0                             # fixed anchor
        free[Vc + 1, 3:] = 0.0                    # plane-like hub: 3 dims
        b = rng.normal(size=(N, D)).astype(np.float32)
        return rows, free, b, N

    def _as_linsys(self, rows, N, D=6):
        from delta_graph_slam_tpu.graph.lm_core import LinSys
        E = len(rows)
        i = np.array([r[0] for r in rows], np.int32)
        j = np.array([r[1] for r in rows], np.int32)
        Ji = np.stack([r[2] for r in rows]).astype(np.float32)
        Jj = np.stack([r[3] for r in rows]).astype(np.float32)
        W = np.stack([r[4] for r in rows]).astype(np.float32)
        r = np.zeros((E, D), np.float32)
        return LinSys(jnp.asarray(i), jnp.asarray(j), jnp.asarray(r),
                      jnp.asarray(Ji), jnp.asarray(Jj), jnp.asarray(W))

    def _ref_solve(self, rows, b, free, lam, N, D=6):
        """f64 dense oracle with dense_solve's masking semantics."""
        H = np.zeros((N * D, N * D))
        for (i, j, Ji, Jj, W) in rows:
            Ji = Ji.astype(np.float32).astype(np.float64)
            Jj = Jj.astype(np.float32).astype(np.float64)
            W = W.astype(np.float32).astype(np.float64)
            si, sj = slice(i * D, (i + 1) * D), slice(j * D, (j + 1) * D)
            H[si, si] += Ji.T @ W @ Ji
            H[sj, sj] += Jj.T @ W @ Jj
            H[si, sj] += Ji.T @ W @ Jj
            H[sj, si] += Jj.T @ W @ Ji
        fm = free.reshape(-1).astype(np.float64)
        H = H * fm[:, None] * fm[None, :] + np.diag(
            np.where(fm > 0, lam, 1.0))
        x = np.linalg.solve(H, b.reshape(-1) * fm)
        return x.reshape(N, D) * free

    @pytest.mark.parametrize("lam", [1e-2, 1e-6])
    def test_matches_f64_dense(self, lam):
        from delta_graph_slam_tpu.graph.hub_solve import chain_hub_solve
        rows, free, b, N = self._system()
        sysm = self._as_linsys(rows, N)
        x, nd = chain_hub_solve(sysm, jnp.asarray(b), jnp.asarray(free),
                                jnp.asarray(lam, np.float32), N, n_hub=2,
                                K_cap=4, coup_cap=8)
        assert int(nd) == 0
        ref = self._ref_solve(rows, b, free, lam, N)
        err = np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref)
        assert err < 1e-5, f"relative step error {err} at lam={lam}"

    def test_overflow_flag(self):
        from delta_graph_slam_tpu.graph.hub_solve import (
            chain_hub_solve, hub_overflow)
        rows, free, b, N = self._system()
        sysm = self._as_linsys(rows, N)
        # 5 couplings, cap 3 -> 2 dropped; 1 loop, cap 4 -> 0 dropped
        _, nd = chain_hub_solve(sysm, jnp.asarray(b), jnp.asarray(free),
                                jnp.asarray(1e-3, np.float32), N, n_hub=2,
                                K_cap=4, coup_cap=3)
        assert int(nd) == 2
        assert int(hub_overflow(sysm, jnp.asarray(free), N, 2, 4, 3)) == 2

    def test_se3_chain_backend_matches_dense(self):
        """optimize_se3 backend='chain' (hub solve) lands on the same
        optimum as the dense backend on a poses+plane+priors graph."""
        b = SE3GraphBuilder()
        rng = np.random.default_rng(7)
        n = 10
        info6 = np.eye(6) * 100
        prev = b.add_se3_node(np.eye(4), fixed=True)
        gts = [np.eye(4)]
        for k in range(1, n):
            T = np.eye(4)
            T[:3, 3] = [float(k), 0.1 * k, 0.0]
            gts.append(T)
            Tn = T.copy()
            Tn[:3, 3] += rng.normal(0, 0.05, 3)
            v = b.add_se3_node(Tn)
            rel = np.linalg.inv(gts[k - 1]) @ gts[k]
            b.add_se3_edge(prev, v, rel, info6)
            prev = v
        # loop closure + floor plane hub touched by every pose
        b.add_se3_edge(0, n - 1, np.linalg.inv(gts[0]) @ gts[n - 1], info6,
                       kernel="Huber", delta=1.0)
        p0 = b.add_plane_node([0.0, 0.0, 1.0, 0.0])
        for v in range(n):
            b.add_se3_plane_edge(v, p0, [0.0, 0.0, 1.0, 0.0],
                                 np.eye(3) * 50)
        b.add_se3_prior_xyz_edge(3, gts[3][:3, 3], np.eye(3) * 10)
        g = b.to_arrays()
        cfg_d = SolverConfig(backend="dense", max_iterations=40)
        cfg_c = SolverConfig(backend="chain", max_iterations=40,
                             chain_offrank_capacity=8,
                             chain_coupling_capacity=32)
        (pd, _, _), sd = optimize_se3(g, level=0, config=cfg_d)
        (pc, _, _), sc = optimize_se3(g, level=0, config=cfg_c)
        assert float(sc.chi2_final) <= float(sd.chi2_final) * 1.001 + 1e-9
        np.testing.assert_allclose(np.asarray(pc)[:n, :3],
                                   np.asarray(pd)[:n, :3], atol=1e-4)
