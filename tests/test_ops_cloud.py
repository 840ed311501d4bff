"""Golden tests for cloud filters, voxel ops, kNN, outliers, normals.

Oracles: NumPy/SciPy brute-force implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree

from delta_graph_slam_tpu import ops

RNG = np.random.default_rng(7)


def random_cloud(n=500, cap=640, scale=10.0):
    pts = RNG.uniform(-scale, scale, (n, 3))
    return ops.make_cloud(pts, capacity=cap), pts


class TestBasicFilters:
    def test_distance_filter(self):
        cloud, pts = random_cloud()
        out = ops.distance_filter(cloud, 3.0, 12.0)
        d = np.linalg.norm(pts, axis=1)
        want = (d > 3.0) & (d < 12.0)
        np.testing.assert_array_equal(np.asarray(out.mask)[:500], want)

    def test_height_filter_flatten(self):
        cloud, pts = random_cloud()
        out = ops.flatten_z(ops.height_filter(cloud, 1.5))
        keep = pts[:, 2] > 1.5
        np.testing.assert_array_equal(np.asarray(out.mask)[:500], keep)
        assert np.all(np.asarray(out.points)[:, 2] == 0.0)

    def test_plane_clip(self):
        cloud, pts = random_cloud()
        plane = np.array([0.0, 0.0, 1.0, -2.0])  # z > 2
        out = ops.plane_clip(cloud, plane, negative=False)
        np.testing.assert_array_equal(
            np.asarray(out.mask)[:500], pts[:, 2] - 2.0 > 0
        )
        out_n = ops.plane_clip(cloud, plane, negative=True)
        np.testing.assert_array_equal(
            np.asarray(out_n.mask)[:500], pts[:, 2] - 2.0 < 0
        )

    def test_compact(self):
        cloud, pts = random_cloud()
        filt = ops.distance_filter(cloud, 3.0, 12.0)
        comp = ops.compact(filt)
        k = int(np.asarray(filt.mask).sum())
        assert np.all(np.asarray(comp.mask)[:k])
        assert not np.any(np.asarray(comp.mask)[k:])
        d = np.linalg.norm(pts, axis=1)
        want = pts[(d > 3.0) & (d < 12.0)]
        np.testing.assert_allclose(np.asarray(comp.points)[:k], want, atol=1e-6)

    def test_transform(self):
        cloud, pts = random_cloud()
        T = np.eye(4)
        T[:3, 3] = [1, 2, 3]
        out = ops.transform_cloud(cloud, T)
        np.testing.assert_allclose(
            np.asarray(out.points)[:500], pts + [1, 2, 3], atol=1e-5
        )

    def test_deskew_small_rotation(self):
        """Last point rotated by ~ -w*scan_period, first unchanged."""
        pts = np.array([[1.0, 0, 0]] * 100)
        cloud = ops.make_cloud(pts)
        w = np.array([0.0, 0.0, 0.5])
        out = np.asarray(ops.deskew(cloud, w, scan_period=0.1).points)
        np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
        # point i rotated about z by +w*t_i (inverse of negated w)
        t_last = 0.1 * 99 / 100
        ang = 0.5 * t_last
        np.testing.assert_allclose(
            out[-1], [np.cos(ang), np.sin(ang), 0.0], atol=1e-3
        )


class TestVoxel:
    def test_voxel_downsample_matches_numpy(self):
        cloud, pts = random_cloud(n=1000, cap=1024, scale=5.0)
        res = 0.7
        out = ops.voxel_downsample(cloud, res)
        got = np.asarray(out.points)[np.asarray(out.mask)]
        # numpy oracle: mean per voxel
        keys = np.floor(pts / res).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        want = np.zeros((len(uniq), 3))
        np.add.at(want, inv, pts)
        want /= np.bincount(inv)[:, None]
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        assert got.shape == want.shape
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)

    def test_occupied_voxel_centers(self):
        cloud, pts = random_cloud(n=400, cap=512, scale=3.0)
        res = 0.5
        out = ops.occupied_voxel_centers(cloud, res)
        got = np.asarray(out.points)[np.asarray(out.mask)]
        keys = np.unique(np.floor(pts / res).astype(np.int64), axis=0)
        want = (keys + 0.5) * res
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)

    def test_voxel_hash_lookup(self):
        cloud, pts = random_cloud(n=800, cap=1024, scale=20.0)
        vh = ops.build_voxel_hash(cloud, resolution=2.0, capacity_voxels=1024)
        # every source point must find its own voxel
        slot, hit = ops.voxel_lookup(vh, cloud.points, cloud.mask)
        assert bool(jnp.all(hit[:800, 0]))
        # voxel means contain the point's own voxel mean
        keys = np.floor(pts / 2.0).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        means = np.zeros((len(uniq), 3))
        np.add.at(means, inv, pts)
        means /= np.bincount(inv)[:, None]
        got_means = np.asarray(vh.means)[np.asarray(slot[:800, 0])]
        np.testing.assert_allclose(got_means, means[inv], atol=1e-5)

    def test_voxel_hash_neighbors(self):
        cloud, _ = random_cloud(n=100, cap=128, scale=3.0)
        vh = ops.build_voxel_hash(cloud, resolution=1.0, capacity_voxels=256)
        offs = np.array([[0, 0, 0], [1, 0, 0], [-1, 0, 0]])
        slot, hit = ops.voxel_lookup(vh, cloud.points, cloud.mask, offsets=offs)
        assert slot.shape == (128, 3)
        assert bool(jnp.all(hit[:100, 0]))


class TestKNN:
    def test_nn1_vs_kdtree(self):
        a = RNG.uniform(-5, 5, (300, 3))
        b = RNG.uniform(-5, 5, (400, 3))
        ca = ops.make_cloud(a, capacity=320)
        cb = ops.make_cloud(b, capacity=448)
        d2, idx = ops.nn_1(ca.points, ca.mask, cb.points, cb.mask, chunk=128)
        tree = cKDTree(b)
        want_d, want_i = tree.query(a)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)[:300]), want_d, atol=1e-4)
        # indices must match except where two targets are nearly tied
        got_i = np.asarray(idx)[:300]
        ambiguous = np.abs(np.linalg.norm(b[got_i] - a, axis=1) - want_d) < 1e-4
        assert (got_i == want_i)[~ambiguous].all() if (~ambiguous).any() else True
        assert ambiguous.mean() > 0.99

    def test_knn_vs_kdtree(self):
        a = RNG.uniform(-5, 5, (200, 3))
        ca = ops.make_cloud(a, capacity=256)
        d2, idx = ops.knn(ca.points, ca.mask, ca.points, ca.mask, k=5, chunk=64)
        tree = cKDTree(a)
        want_d, want_i = tree.query(a, k=5)
        # self-distance computed via |q|^2-2qt+|t|^2 carries ~1e-3 sqrt noise
        np.testing.assert_allclose(
            np.sqrt(np.asarray(d2)[:200]), want_d, atol=2e-3
        )

    def test_radius_count(self):
        a = RNG.uniform(-2, 2, (150, 3))
        ca = ops.make_cloud(a, capacity=192)
        cnt = ops.radius_count(ca.points, ca.mask, 0.8, chunk=64)
        tree = cKDTree(a)
        want = np.array([len(tree.query_ball_point(p, 0.8)) - 1 for p in a])
        np.testing.assert_array_equal(np.asarray(cnt)[:150], want)


class TestOutliers:
    def test_radius_outlier_removal(self):
        base = RNG.uniform(-1, 1, (200, 3))
        outliers = RNG.uniform(40, 50, (10, 3))
        pts = np.concatenate([base, outliers])
        cloud = ops.make_cloud(pts, capacity=256)
        out = ops.radius_outlier_removal(cloud, radius=2.0, min_neighbors=2)
        m = np.asarray(out.mask)
        assert m[:200].all()
        assert not m[200:210].any()

    def test_statistical_outlier_removal(self):
        base = RNG.normal(0, 1, (300, 3))
        outliers = np.array([[30.0, 0, 0], [0, 40.0, 0]])
        pts = np.concatenate([base, outliers])
        cloud = ops.make_cloud(pts, capacity=384)
        out = ops.statistical_outlier_removal(cloud, mean_k=10, stddev_mul=1.0)
        m = np.asarray(out.mask)
        assert not m[300:302].any()
        assert m[:300].mean() > 0.7


class TestNormals:
    def test_plane_normals(self):
        # points on z=0 plane
        xy = RNG.uniform(-5, 5, (300, 2))
        pts = np.concatenate([xy, np.zeros((300, 1))], axis=1)
        cloud = ops.make_cloud(pts, capacity=320)
        n, valid = ops.estimate_normals(cloud, k=10, viewpoint=(0, 0, 10.0))
        n = np.asarray(n)[:300]
        assert np.asarray(valid)[:300].all()
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)
        assert np.all(n[:, 2] > 0)  # oriented to viewpoint above

    def test_wall_normals_filter(self):
        # vertical wall x=0 plane -> normals horizontal -> kept by wall filter
        yz = RNG.uniform(0, 5, (300, 2))
        pts = np.stack([np.zeros(300), yz[:, 0], yz[:, 1]], axis=1)
        cloud = ops.make_cloud(pts, capacity=320)
        out = ops.normal_filter(cloud, thresh=0.2, k=10, keep_vertical_surfaces=True)
        assert np.asarray(out.mask)[:300].mean() > 0.9

    def test_smallest_eigvec_matches_numpy(self):
        A = RNG.normal(0, 1, (64, 3, 3))
        A = A @ np.swapaxes(A, 1, 2)  # SPD
        v = np.asarray(ops.normals.smallest_eigvec_3x3(jnp.asarray(A)))
        w, V = np.linalg.eigh(A)
        want = V[:, :, 0]
        dots = np.abs(np.sum(v * want, axis=1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)


class TestRansac:
    def test_plane(self):
        key = jax.random.PRNGKey(0)
        xy = RNG.uniform(-10, 10, (400, 2))
        z = 0.05 * RNG.normal(size=400) + 3.0
        plane_pts = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
        noise = RNG.uniform(-10, 10, (100, 3))
        pts = np.concatenate([plane_pts, noise])
        cloud = ops.compact(ops.make_cloud(pts, capacity=512))
        res = ops.ransac_plane(cloud, key, n_hypotheses=256, dist_thresh=0.2,
                               min_inliers=200)
        assert bool(res.ok)
        c = np.asarray(res.coeffs)
        c = c * np.sign(c[2])
        np.testing.assert_allclose(np.abs(c[2]), 1.0, atol=0.01)
        np.testing.assert_allclose(c[3], -3.0, atol=0.15)

    def test_cluster(self):
        c1 = RNG.normal(0, 0.3, (100, 2))
        c2 = RNG.normal(10, 0.3, (40, 2))
        pts = np.concatenate([c1, c2])
        pts3 = np.concatenate([pts, np.zeros((140, 1))], axis=1)
        mask = np.ones(140, bool)
        big, labels = ops.euclidean_cluster_mask(
            jnp.asarray(pts3[:, :2]), jnp.asarray(mask), 1.0, chunk=64
        )
        big = np.asarray(big)
        assert big[:100].all() and not big[100:].any()

    def test_line_extraction(self):
        key = jax.random.PRNGKey(1)
        # two clean segments + noise
        t1 = np.linspace(0, 8, 200)
        seg1 = np.stack([t1, np.zeros_like(t1)], 1)
        t2 = np.linspace(0, 6, 150)
        seg2 = np.stack([np.full_like(t2, 10.0), t2], 1)
        noise = RNG.uniform(-20, 20, (30, 2))
        pts = np.concatenate([seg1, seg2, noise])
        pts3 = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
        cloud = ops.make_cloud(pts3, capacity=512)
        lines = ops.ransac_line(
            cloud, key, max_lines=8, n_hypotheses=256, dist_thresh=0.15,
            min_cluster_size=25, cluster_tolerance=1.0,
            merror_threshold=0.5, length_threshold=1.0, chunk=128,
        )
        got = int(np.asarray(lines.mask).sum())
        assert got >= 2
        lens = np.sort(np.asarray(lines.lengths())[np.asarray(lines.mask)])[::-1]
        assert abs(lens[0] - 8.0) < 0.5
        assert abs(lens[1] - 6.0) < 0.5


class TestPallasNN:
    def test_interpret_matches_brute(self):
        """Pallas kernel (interpret mode) vs the XLA scan NN."""
        import jax
        import jax.numpy as jnp
        from delta_graph_slam_tpu.ops.pallas_nn import nn_1_pallas
        from delta_graph_slam_tpu.ops.knn import nn_1

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-5, 5, (512, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-5, 5, (1024, 3)).astype(np.float32))
        qm = jnp.ones(512, bool).at[500:].set(False)
        tm = jnp.ones(1024, bool).at[1000:].set(False)
        d2p, idxp = nn_1_pallas(q, qm, t, tm, tile_q=128, tile_t=256,
                                interpret=True)
        d2b, idxb = nn_1(q, qm, t, tm, chunk=256)
        valid = np.asarray(qm)
        np.testing.assert_allclose(
            np.asarray(d2p)[valid], np.asarray(d2b)[valid], atol=1e-3
        )
        assert not np.isfinite(np.asarray(d2p)[~valid]).any()
        # indices agree where the distances are unambiguous
        same = np.asarray(idxp)[valid] == np.asarray(idxb)[valid]
        assert same.mean() > 0.99


class TestVoxelNeighborPaths:
    def test_voxel_normals_match_brute(self):
        xy = RNG.uniform(-5, 5, (400, 2))
        pts = np.concatenate([xy, np.zeros((400, 1))], axis=1)
        cloud = ops.make_cloud(pts, capacity=512)
        nb, vb = ops.estimate_normals(cloud, k=10, viewpoint=(0, 0, 10.0),
                                      method="brute")
        nv, vv = ops.estimate_normals(cloud, k=10, viewpoint=(0, 0, 10.0),
                                      method="voxel")
        nb, nv = np.asarray(nb)[:400], np.asarray(nv)[:400]
        # plane normals: both near +-z; compare |dot|
        dots = np.abs(np.sum(nb * nv, axis=1))
        assert np.mean(dots > 0.99) > 0.95

    def test_voxel_radius_removal_matches_brute(self):
        base = RNG.uniform(-1, 1, (200, 3))
        outliers = RNG.uniform(40, 50, (10, 3))
        pts = np.concatenate([base, outliers])
        cloud = ops.make_cloud(pts, capacity=256)
        out_b = ops.radius_outlier_removal(cloud, 2.0, 2, method="brute")
        out_v = ops.radius_outlier_removal(cloud, 2.0, 2, method="voxel",
                                           voxel_window=32)
        np.testing.assert_array_equal(
            np.asarray(out_b.mask), np.asarray(out_v.mask)
        )


class TestDenseMomentsPath:
    """ops/moments.py: exact radius statistics via the masked-moments matmul."""

    def test_radius_moments_vs_kdtree(self):
        cloud, pts = random_cloud(n=300, cap=384)
        r = 2.5
        mom = ops.radius_moments(cloud, cloud, r, chunk=128)
        tree = cKDTree(pts)
        for i in range(0, 300, 17):
            nbrs = tree.query_ball_point(pts[i], r)
            assert int(mom.count[i]) == len(nbrs)
            sel = pts[nbrs]
            np.testing.assert_allclose(
                np.asarray(mom.mean[i]), sel.mean(axis=0), rtol=0, atol=1e-4
            )
            cov = np.cov(sel.T, bias=True) if len(nbrs) > 1 else np.zeros((3, 3))
            np.testing.assert_allclose(
                np.asarray(mom.cov[i]), cov, rtol=0, atol=1e-3
            )

    def test_dense_radius_removal_matches_brute(self):
        base = RNG.uniform(-1, 1, (200, 3))
        outliers = RNG.uniform(40, 50, (10, 3))
        pts = np.concatenate([base, outliers])
        cloud = ops.make_cloud(pts, capacity=256)
        out_b = ops.radius_outlier_removal(cloud, 2.0, 2, method="brute")
        out_d = ops.radius_outlier_removal(cloud, 2.0, 2, method="dense")
        np.testing.assert_array_equal(
            np.asarray(out_b.mask), np.asarray(out_d.mask)
        )

    def test_dense_normals_on_plane(self):
        xy = RNG.uniform(-5, 5, (400, 2))
        pts = np.concatenate([xy, np.zeros((400, 1))], axis=1)
        cloud = ops.make_cloud(pts, capacity=512)
        n, valid = ops.estimate_normals(cloud, viewpoint=(0, 0, 10.0),
                                        method="dense", radius=1.5)
        n = np.asarray(n)[:400][np.asarray(valid)[:400]]
        assert n.shape[0] > 350
        np.testing.assert_allclose(n[:, 2], 1.0, atol=1e-3)

    def test_far_origin_precision(self):
        # fp32 cancellation guard: same local geometry, cloud offset 2 km.
        xy = RNG.uniform(-5, 5, (300, 2))
        pts = np.concatenate([xy, np.zeros((300, 1))], axis=1)
        far = pts + np.array([2000.0, -1500.0, 300.0])
        cloud = ops.make_cloud(far.astype(np.float32), capacity=512)
        n, valid = ops.estimate_normals(cloud, viewpoint=(2000, -1500, 310.0),
                                        method="dense", radius=1.5)
        n = np.asarray(n)[:300][np.asarray(valid)[:300]]
        assert n.shape[0] > 250
        assert np.mean(np.abs(n[:, 2]) > 0.99) > 0.97

    def test_per_query_radius(self):
        cloud, pts = random_cloud(n=200, cap=256)
        r = np.full(256, 1.0, np.float32)
        r[:100] = 3.0
        mom = ops.radius_moments(cloud, cloud, jnp.asarray(r), chunk=128)
        tree = cKDTree(pts)
        for i in (0, 50, 120, 199):
            want = len(tree.query_ball_point(pts[i], float(r[i])))
            assert int(mom.count[i]) == want
