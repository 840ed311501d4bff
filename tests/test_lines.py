"""Line scanmatcher tests: geometry oracles + synthetic alignment recovery."""

import numpy as np
import jax.numpy as jnp

from delta_graph_slam_tpu import lines as L

RNG = np.random.default_rng(21)


def square_lines(cx=0.0, cy=0.0, half=5.0, cap=16):
    """Axis-aligned square outline as 4 segments."""
    c = np.array([cx, cy])
    p = np.array([
        [-half, -half], [half, -half], [half, half], [-half, half]
    ]) + c
    a = p
    b = np.roll(p, -1, axis=0)
    return L.make_lines(a, b, capacity=cap)


class TestFeatures:
    def test_transform_lines(self):
        sq = square_lines()
        T = np.eye(4)
        T[:2, 3] = [1.0, 2.0]
        out = L.transform_lines(sq, T)
        np.testing.assert_allclose(
            np.asarray(out.a)[:4], np.asarray(sq.a)[:4] + [1, 2], atol=1e-6
        )

    def test_edge_extraction_square(self):
        sq = square_lines()
        edges = L.edge_extraction(sq, capacity=32)
        n = int(np.asarray(edges.mask).sum())
        assert n == 4  # four corners
        corners = np.asarray(edges.corner)[np.asarray(edges.mask)]
        want = {(-5, -5), (5, -5), (5, 5), (-5, 5)}
        got = {tuple(np.round(c).astype(int)) for c in corners}
        assert got == want

    def test_align_edges_recovers_rotation(self):
        # edge at origin with arms +x, +y ; same rotated by 30 deg
        th = np.deg2rad(30)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        c1 = np.zeros(2)
        a1 = np.array([4.0, 0.0])
        b1 = np.array([0.0, 3.0])
        shift = np.array([1.0, -2.0])
        c2 = shift
        a2 = R @ a1 + shift
        b2 = R @ b1 + shift
        Rg, tg = L.align_edges(
            jnp.asarray(c1), jnp.asarray(a1), jnp.asarray(b1),
            jnp.asarray(c2), jnp.asarray(a2), jnp.asarray(b2),
        )
        np.testing.assert_allclose(np.asarray(Rg), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tg), shift, atol=1e-5)

    def test_align_lines_projects(self):
        # parallel lines offset in y: transform moves src onto trg line
        Rg, tg = L.align_lines_pair(
            jnp.asarray([0.0, 1.0]), jnp.asarray([5.0, 1.0]),
            jnp.asarray([0.0, 0.0]), jnp.asarray([9.0, 0.0]),
        )
        np.testing.assert_allclose(np.asarray(Rg), np.eye(2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tg), [0.0, -1.0], atol=1e-6)


class TestScoring:
    def test_line_to_line_full_coverage(self):
        # src directly above trg, fully covered
        fs = L.line_to_line_distance(
            jnp.asarray([0.0, 1.0]), jnp.asarray([4.0, 1.0]),
            jnp.asarray([-1.0, 0.0]), jnp.asarray([6.0, 0.0]),
        )
        np.testing.assert_allclose(float(fs.avg_distance), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(fs.coverage), 4.0, atol=1e-5)
        np.testing.assert_allclose(float(fs.coverage_percentage), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(fs.real_avg_distance), 1.0, atol=1e-5)

    def test_line_to_line_no_overlap(self):
        fs = L.line_to_line_distance(
            jnp.asarray([10.0, 1.0]), jnp.asarray([14.0, 1.0]),
            jnp.asarray([0.0, 0.0]), jnp.asarray([5.0, 0.0]),
        )
        assert not np.isfinite(float(fs.avg_distance))
        np.testing.assert_allclose(float(fs.coverage), 0.0)

    def test_partial_coverage(self):
        # src half-overlaps trg in x
        fs = L.line_to_line_distance(
            jnp.asarray([2.0, 1.0]), jnp.asarray([8.0, 1.0]),
            jnp.asarray([0.0, 0.0]), jnp.asarray([5.0, 0.0]),
        )
        np.testing.assert_allclose(float(fs.coverage), 3.0, atol=1e-5)
        np.testing.assert_allclose(
            float(fs.coverage_percentage), 0.5, atol=1e-5
        )

    def test_fitness_score_aggregates(self):
        src = square_lines()
        trg = square_lines()
        fs = L.calc_fitness_score(src, trg, is_local=False)
        np.testing.assert_allclose(float(fs.real_avg_distance), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(fs.coverage_percentage), 100.0, atol=1e-3)


class TestMerge:
    def test_merges_collinear(self):
        a = np.array([[0.0, 0.0], [5.1, 0.0]])
        b = np.array([[5.0, 0.0], [9.0, 0.0]])
        ma, mb = L.merge_lines(a, b)
        assert len(ma) == 1
        got = {tuple(np.round(ma[0], 3)), tuple(np.round(mb[0], 3))}
        assert got == {(0.0, 0.0), (9.0, 0.0)}

    def test_keeps_perpendicular(self):
        a = np.array([[0.0, 0.0], [0.0, 0.0]])
        b = np.array([[5.0, 0.0], [0.0, 5.0]])
        ma, mb = L.merge_lines(a, b)
        assert len(ma) == 2


class TestOverlap:
    def test_overlapping_squares(self):
        A = square_lines(0, 0, 5.0)
        B = square_lines(4.0, 0, 5.0)
        ov = L.are_buildings_overlapped(
            A.a, A.b, A.mask, jnp.zeros(2),
            B.a, B.b, B.mask, jnp.asarray([4.0, 0.0]),
        )
        assert bool(ov)

    def test_separated_squares(self):
        A = square_lines(0, 0, 5.0)
        B = square_lines(20.0, 0, 5.0)
        ov = L.are_buildings_overlapped(
            A.a, A.b, A.mask, jnp.zeros(2),
            B.a, B.b, B.mask, jnp.asarray([20.0, 0.0]),
        )
        assert not bool(ov)


class TestAlign:
    def _cfg(self):
        return L.LineScanmatcherConfig(
            max_lines=8, max_target_lines=16, edge_capacity=32,
            target_edge_capacity=32, score_chunk=64, n_hypotheses=128,
            cloud_chunk=128,
        )

    def test_align_global_recovers_offset(self):
        sm = L.LineBasedScanmatcher(self._cfg())
        trg = square_lines(cap=16)
        # source = square shifted by (0.8, -0.5) and rotated 10 deg
        th = np.deg2rad(10)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        t = np.array([0.8, -0.5])
        src_a = np.asarray(trg.a)[:4] @ R.T + t
        src_b = np.asarray(trg.b)[:4] @ R.T + t
        src = L.make_lines(src_a, src_b, capacity=8)
        res = sm.align_global(src, trg, constrain_angle=True, merge_targets=False)
        T = np.asarray(res.transformation)
        # should invert the perturbation: T ~ [R^T, -R^T t]
        np.testing.assert_allclose(T[:2, :2], R.T, atol=0.02)
        np.testing.assert_allclose(T[:2, 3], -R.T @ t, atol=0.1)
        assert float(res.fitness.coverage_percentage) > 95.0

    def test_align_local_small_offset(self):
        sm = L.LineBasedScanmatcher(self._cfg())
        trg = square_lines(cap=16)
        t = np.array([0.4, 0.3])
        src_a = np.asarray(trg.a)[:4] + t
        src_b = np.asarray(trg.b)[:4] + t
        src = L.make_lines(src_a, src_b, capacity=8)
        res = sm.align_local(src, trg)
        T = np.asarray(res.transformation)
        np.testing.assert_allclose(T[:2, 3], -t, atol=0.1)
        assert bool(res.is_edge_aligned)

    def test_align_overlapped_buildings(self):
        sm = L.LineBasedScanmatcher(self._cfg())
        A = square_lines(0, 0, 5.0, cap=8)
        B = square_lines(8.0, 0, 5.0, cap=8)   # overlap by 2 in x
        T, found = sm.align_overlapped_buildings(
            A, np.zeros(3), B, np.asarray([8.0, 0.0, 0.0])
        )
        assert found
        # A moved so the squares no longer overlap; translation should be
        # about 2 in -x (minimum translation separation)
        assert abs(np.linalg.norm(T[:2, 3]) - 2.0) < 0.5

    def test_align_overlapped_batch_matches_single(self):
        """One dispatch for all pairs (VERDICT r3 #6) == per-pair calls;
        padded slots return found=False."""
        import jax

        sm = L.LineBasedScanmatcher(self._cfg())
        A = square_lines(0, 0, 5.0, cap=8)
        B = square_lines(8.0, 0, 5.0, cap=8)
        C = square_lines(1.0, 7.0, 5.0, cap=8)   # overlaps A in y
        pa = np.zeros(3)
        pb = np.asarray([8.0, 0.0, 0.0])
        pc = np.asarray([1.0, 7.0, 0.0])
        T1, f1 = sm.align_overlapped_buildings(A, pa, B, pb)
        T2, f2 = sm.align_overlapped_buildings(C, pc, A, pa)
        stack = lambda lst: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *lst
        )
        empty = A._replace(mask=jnp.zeros_like(A.mask))
        Tb, fb = sm.align_overlapped_batch(
            stack([A, C, empty, empty]), stack([B, A, empty, empty]),
            np.stack([pa, pc, np.zeros(3), np.zeros(3)]),
            np.stack([pb, pa, np.zeros(3), np.zeros(3)]),
        )
        Tb = np.asarray(Tb)
        fb = np.asarray(fb)
        assert bool(fb[0]) == bool(f1) and bool(fb[1]) == bool(f2)
        assert not fb[2] and not fb[3]
        np.testing.assert_allclose(Tb[0], T1, atol=1e-4)
        np.testing.assert_allclose(Tb[1], T2, atol=1e-4)
