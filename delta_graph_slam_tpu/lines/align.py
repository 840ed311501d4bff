"""align_global / align_local / align_overlapped_buildings.

The reference's greedy best-so-far candidate loops
(line_based_scanmatcher.cpp:109-297, :29-107) adopt a candidate only on
strict score improvement, so evaluating every candidate in parallel and
taking the first argmax reproduces the result exactly (up to fp order).
Candidate scoring is chunked with lax.map so the (candidates x Ls x Lt)
tensors never exceed a few MB.

Phase 2 ("use best transform found so far") composes exactly one
line-to-NN refinement on top of the phase-1 winner; the reference's
`i<3 || i<n` loop bound in align_local (:260) reads out of bounds when a
line has <3 neighbors — we implement the intent (top-3) and document the
divergence.
"""

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.se3 import transform_2d_to_3d
from ..ops.cloud import MaskedCloud
from ..ops.ransac import LineSegments, ransac_line
from .features import (
    EdgeFeatures,
    align_edges,
    align_lines_pair,
    edge_extraction,
    transform_lines,
    make_lines,
    _unit,
)
from .merge import merge_lines
from .overlap import are_buildings_overlapped
from .scoring import fitness_core, weight_score, FitnessScore

_INF = jnp.inf


@dataclasses.dataclass(frozen=True)
class LineScanmatcherConfig:
    # line fitting (hpp:80-92 defaults; delta launch overrides)
    min_cluster_size: int = 25
    max_cluster_size: int = 25000
    cluster_tolerance: float = 1.0
    sac_distance_threshold: float = 0.1
    max_iterations: int = 500
    merror_threshold: float = 150.0
    line_length_threshold: float = 1.0
    # global fitness weights (hpp:93-99)
    g_avg_distance_weight: float = 0.6
    g_coverage_weight: float = 1.0
    g_transform_weight: float = 0.2
    g_max_score_distance: float = 5.0
    g_max_score_translation: float = 5.0
    # local fitness weights
    l_avg_distance_weight: float = 0.6
    l_coverage_weight: float = 1.0
    l_transform_weight: float = 0.2
    l_max_score_distance: float = 5.0
    l_max_score_translation: float = 5.0
    # capacities
    max_lines: int = 24
    max_target_lines: int = 64
    edge_capacity: int = 128
    target_edge_capacity: int = 192
    # building polygons carry <= ~16 outline lines, so their true-corner
    # edge count is tiny; the building side of align_local /
    # align_overlapped uses this much smaller capacity instead of
    # edge_capacity (the Es x Et candidate cross scales with both)
    building_edge_capacity: int = 32
    # phase-1 candidates are compacted (stable, valid-first) to this many
    # slots before scoring: the raw Es x Et cross is >90% padding, and
    # lax.map serializes one kernel per score_chunk — 96 sequential tiny
    # kernels per align at the raw 24576 (measured align_local_batch
    # 2.95 s/cycle in the r5 e2e). Overflow beyond the capacity drops
    # lowest-priority (later-index) candidates only.
    g_candidate_capacity: int = 4096
    l_candidate_capacity: int = 1024
    score_chunk: int = 256
    n_hypotheses: int = 256
    cloud_chunk: int = 1024


class BestFitAlignment(NamedTuple):
    transformation: jnp.ndarray       # (4,4)
    not_aligned_lines: LineSegments
    aligned_lines: LineSegments
    fitness: FitnessScore             # scalar fields
    is_edge_aligned: jnp.ndarray      # () bool
    score: jnp.ndarray                # () float (weight score of the result)


def _se3_from_rt(R2, t2, dtype):
    T = jnp.zeros(R2.shape[:-2] + (4, 4), dtype)
    T = T.at[..., :2, :2].set(R2)
    T = T.at[..., :2, 3].set(t2)
    T = T.at[..., 2, 2].set(1.0)
    T = T.at[..., 3, 3].set(1.0)
    return T


def _compact_candidates(R, t, valid, K):
    """Stable valid-first compaction of a candidate transform set to K
    slots. Stability preserves the original candidate order among the
    valid ones, so the downstream first-argmax tie-breaking matches the
    uncompacted (and the reference's sequential greedy) order. When more
    than K candidates are valid the overflow (later-index) ones drop —
    K is sized to several times the realistic valid count."""
    C = valid.shape[0]
    if K <= 0 or K >= C:
        return R, t, valid
    order = jnp.argsort(jnp.where(valid, 0, 1).astype(jnp.int8),
                        stable=True)[:K]
    return R[order], t[order], valid[order]


def _chunked_scores(Rs, ts, valid, src: LineSegments, trg: LineSegments,
                    is_local, max_range, weight_fn, chunk):
    """Score candidate transforms: (C,) weight scores (-inf when invalid)."""
    C = Rs.shape[0]
    pad = (-C) % chunk
    Rs = jnp.pad(Rs, ((0, pad), (0, 0), (0, 0)))
    ts = jnp.pad(ts, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    Rsc = Rs.reshape(-1, chunk, 2, 2)
    tsc = ts.reshape(-1, chunk, 2)
    vc = valid.reshape(-1, chunk)

    def score_chunk(args):
        R, t, v = args
        # (chunk, Ls, 2): src.a (Ls,2) rotated by each R (chunk,2,2)
        sa = jnp.einsum("cab,lb->cla", R, src.a) + t[:, None, :]
        sb = jnp.einsum("cab,lb->cla", R, src.b) + t[:, None, :]
        fs = fitness_core(sa, sb, src.mask, trg, is_local, max_range)
        tnorm = jnp.linalg.norm(t, axis=-1)
        metric = fs.avg_distance if is_local else fs.real_avg_distance
        s = weight_fn(metric, fs.coverage_percentage, tnorm)
        return jnp.where(v, s, -_INF)

    scores = jax.lax.map(score_chunk, (Rsc, tsc, vc))
    return scores.reshape(-1)[:C]


def _fitness_of(src_T, trg, is_local, max_range):
    return fitness_core(src_T.a, src_T.b, src_T.mask, trg, is_local, max_range)


def _make_align_fn(cfg: LineScanmatcherConfig, is_local: bool):
    """Jitted core: (src lines, trg lines, trg edges precomputed?, gates...)"""
    if is_local:
        max_distance = 2.5
        weight_fn = lambda d, c, t: weight_score(
            d, c, t, cfg.l_avg_distance_weight, cfg.l_coverage_weight,
            cfg.l_transform_weight, cfg.l_max_score_distance,
            cfg.l_max_score_translation,
        )
    else:
        max_distance = 2.0
        weight_fn = lambda d, c, t: weight_score(
            d, c, t, cfg.g_avg_distance_weight, cfg.g_coverage_weight,
            cfg.g_transform_weight, cfg.g_max_score_distance,
            cfg.g_max_score_translation,
        )
    max_angle = jnp.pi / 9.0
    cos_max = jnp.cos(max_angle)
    # the global path runs un-vmapped (one align per keyframe), so a 4x
    # wider score chunk quarters the sequential lax.map kernel count at
    # modest memory; the local path is vmapped over up-to-64 pairs and
    # keeps the narrow chunk to bound the per-step tensor
    chunk = cfg.score_chunk if is_local else cfg.score_chunk * 4

    def run(src: LineSegments, trg: LineSegments,
            src_edges: EdgeFeatures, trg_edges: EdgeFeatures,
            constrain_angle, max_range):
        dtype = src.a.dtype
        fs0 = _fitness_of(src, trg, is_local, max_range)
        metric0 = fs0.avg_distance if is_local else fs0.real_avg_distance
        score0 = weight_fn(metric0, fs0.coverage_percentage, 0.0)

        # ---- phase 1: edge x edge candidates
        Es, Et = src_edges.mask.shape[0], trg_edges.mask.shape[0]
        si = jnp.repeat(jnp.arange(Es), Et)
        ti = jnp.tile(jnp.arange(Et), Es)
        R, t = align_edges(
            src_edges.corner[si], src_edges.a[si], src_edges.b[si],
            trg_edges.corner[ti], trg_edges.a[ti], trg_edges.b[ti],
        )
        valid = src_edges.mask[si] & trg_edges.mask[ti]
        valid = valid & (jnp.linalg.norm(t, axis=-1) <= max_distance)
        ang_ok = R[:, 0, 0] >= cos_max
        if is_local:
            valid = valid & ang_ok
        else:
            valid = valid & jnp.where(constrain_angle, ang_ok, True)
        K = cfg.l_candidate_capacity if is_local else cfg.g_candidate_capacity
        R, t, valid = _compact_candidates(R, t, valid, K)
        scores1 = _chunked_scores(
            R, t, valid, src, trg, is_local, max_range, weight_fn, chunk,
        )
        best1 = jnp.argmax(scores1)
        s1 = scores1[best1]
        adopt1 = s1 > score0
        R1 = jnp.where(adopt1, R[best1], jnp.eye(2, dtype=dtype))
        t1 = jnp.where(adopt1, t[best1], jnp.zeros(2, dtype))
        score_best = jnp.maximum(score0, s1)
        edge_aligned = adopt1

        # transformed source after phase 1
        src1 = src._replace(a=src.a @ R1.T + t1, b=src.b @ R1.T + t1)

        # ---- phase 2: per-line NN refinement on top of the phase-1 winner
        # targets sorted by real distance per source line
        fs_pairs = fitness_core  # noqa: F841 (kept for clarity)
        from .scoring import pairwise_scores

        pfs = pairwise_scores(src1, trg)
        pvalid = src1.mask[:, None] & trg.mask[None, :]
        key = jnp.where(pvalid, pfs.real_avg_distance, _INF)
        order = jnp.argsort(key, axis=1).astype(jnp.int32)
        topk = 3 if is_local else 1
        nn_idx = order[:, :topk]                       # (Ls, k)
        nn_valid = jnp.take_along_axis(pvalid, nn_idx, axis=1)

        Ls = src1.a.shape[0]
        sline_i = jnp.repeat(jnp.arange(Ls), topk)
        tline_i = nn_idx.reshape(-1)
        cvalid = nn_valid.reshape(-1)

        sdir = _unit(src1.a - src1.b)[sline_i]
        tdir = _unit(trg.a - trg.b)[tline_i]
        cosine = jnp.abs(jnp.sum(sdir * tdir, -1))
        cvalid = cvalid & (cosine >= cos_max)

        R2, t2 = align_lines_pair(
            src1.a[sline_i], src1.b[sline_i], trg.a[tline_i], trg.b[tline_i]
        )
        cvalid = cvalid & (jnp.linalg.norm(t2, axis=-1) <= max_distance)
        scores2 = _chunked_scores(
            R2, t2, cvalid, src1, trg, is_local, max_range, weight_fn, chunk,
        )
        best2 = jnp.argmax(scores2)
        s2 = scores2[best2]
        adopt2 = s2 > score_best
        R2b = jnp.where(adopt2, R2[best2], jnp.eye(2, dtype=dtype))
        t2b = jnp.where(adopt2, t2[best2], jnp.zeros(2, dtype))
        score_final = jnp.maximum(score_best, s2)

        R_final = R2b @ R1
        t_final = (R2b @ t1[:, None])[:, 0] + t2b
        aligned = src._replace(
            a=src.a @ R_final.T + t_final, b=src.b @ R_final.T + t_final
        )
        fs_final = _fitness_of(aligned, trg, is_local, max_range)
        T = _se3_from_rt(R_final, t_final, dtype)
        return BestFitAlignment(
            transformation=T,
            not_aligned_lines=src,
            aligned_lines=aligned,
            fitness=fs_final,
            is_edge_aligned=edge_aligned,
            score=score_final,
        )

    return run


def _make_overlap_align_fn(cfg: LineScanmatcherConfig):
    """align_overlapped_buildings core (cpp:29-107): min-translation
    non-overlapping transform among edge-edge and line-line candidates,
    both already expressed in building A's frame."""
    max_angle = jnp.pi / 3.0
    cos_max = jnp.cos(max_angle)

    def run(src: LineSegments, trg: LineSegments,
            src_edges: EdgeFeatures, trg_edges: EdgeFeatures,
            center_b):
        dtype = src.a.dtype
        center_a = jnp.zeros(2, dtype)

        Es, Et = src_edges.mask.shape[0], trg_edges.mask.shape[0]
        si = jnp.repeat(jnp.arange(Es), Et)
        ti = jnp.tile(jnp.arange(Et), Es)
        Re, te = align_edges(
            src_edges.corner[si], src_edges.a[si], src_edges.b[si],
            trg_edges.corner[ti], trg_edges.a[ti], trg_edges.b[ti],
        )
        ve = src_edges.mask[si] & trg_edges.mask[ti]

        Ls, Lt = src.a.shape[0], trg.a.shape[0]
        li = jnp.repeat(jnp.arange(Ls), Lt)
        lj = jnp.tile(jnp.arange(Lt), Ls)
        Rl, tl = align_lines_pair(src.a[li], src.b[li], trg.a[lj], trg.b[lj])
        vl = src.mask[li] & trg.mask[lj]

        R = jnp.concatenate([Re, Rl])
        t = jnp.concatenate([te, tl])
        valid = jnp.concatenate([ve, vl])
        valid = valid & (R[:, 0, 0] > cos_max)

        # candidate must leave the buildings non-overlapped
        def check_chunk(args):
            Rc, tc, vc = args
            sa = jnp.einsum("cab,lb->cla", Rc, src.a) + tc[:, None, :]
            sb = jnp.einsum("cab,lb->cla", Rc, src.b) + tc[:, None, :]
            ov = are_buildings_overlapped(
                sa, sb, src.mask, jnp.broadcast_to(center_a, tc.shape),
                trg.a, trg.b, trg.mask, jnp.broadcast_to(center_b, tc.shape),
            )
            return vc & ~ov

        C = R.shape[0]
        chunk = cfg.score_chunk
        pad = (-C) % chunk
        Rp = jnp.pad(R, ((0, pad), (0, 0), (0, 0)))
        tp = jnp.pad(t, ((0, pad), (0, 0)))
        vp = jnp.pad(valid, (0, pad))
        ok = jax.lax.map(
            check_chunk,
            (Rp.reshape(-1, chunk, 2, 2), tp.reshape(-1, chunk, 2),
             vp.reshape(-1, chunk)),
        ).reshape(-1)[:C]

        tnorm = jnp.where(ok, jnp.linalg.norm(t, axis=-1), _INF)
        best = jnp.argmin(tnorm)
        found = jnp.isfinite(tnorm[best])
        Rb = jnp.where(found, R[best], jnp.eye(2, dtype=dtype))
        tb = jnp.where(found, t[best], jnp.zeros(2, dtype))
        aligned = src._replace(a=src.a @ Rb.T + tb, b=src.b @ Rb.T + tb)
        return _se3_from_rt(Rb, tb, dtype), aligned, found

    return run


import functools


@functools.lru_cache(maxsize=None)
def _jitted_align(cfg: LineScanmatcherConfig, is_local: bool):
    return jax.jit(_make_align_fn(cfg, is_local))


@functools.lru_cache(maxsize=None)
def _jitted_overlap(cfg: LineScanmatcherConfig):
    return jax.jit(_make_overlap_align_fn(cfg))


@functools.lru_cache(maxsize=None)
def _jitted_local_batch(cfg: LineScanmatcherConfig):
    core = _make_align_fn(cfg, is_local=True)

    def one(src, tgt, ts, tt, rng):
        src = transform_lines(src, ts)
        tgt = transform_lines(tgt, tt)
        se = edge_extraction(
            src, only_angular_edges=True, max_dist_angular_edge=0.01,
            capacity=cfg.building_edge_capacity,
        )
        te = edge_extraction(
            tgt, only_angular_edges=True, max_dist_angular_edge=7.0,
            capacity=cfg.target_edge_capacity,
        )
        return core(src, tgt, se, te, False, rng)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, None)))


@functools.lru_cache(maxsize=None)
def _jitted_overlap_batch(cfg: LineScanmatcherConfig):
    core = _make_overlap_align_fn(cfg)

    def one(la, lb, pa, pb):
        from ..geom.se2 import se2_compose, se2_inverse
        from ..geom.se3 import transform_2d_to_3d

        P = transform_2d_to_3d(pa)
        R = P[:2, :2]
        t = P[:2, 3]
        # into A's frame (the reference aligns in building A's
        # local frame, line_based_scanmatcher.cpp:29-107)
        def to_local(lines):
            return lines._replace(
                a=(lines.a - t) @ R, b=(lines.b - t) @ R
            )

        la_l = to_local(la)
        lb_l = to_local(lb)
        rel = se2_compose(se2_inverse(pa), pb)
        # both sides are building outlines: small edge caps
        ea = edge_extraction(la_l, capacity=cfg.building_edge_capacity)
        eb = edge_extraction(lb_l, capacity=cfg.building_edge_capacity)
        T_local, _aligned, found = core(la_l, lb_l, ea, eb, rel[:2])
        # back to map frame: T_map = P T_local P^-1
        Pinv = jnp.zeros((4, 4), P.dtype)
        Pinv = Pinv.at[:2, :2].set(R.T)
        Pinv = Pinv.at[:2, 3].set(-(R.T @ t))
        Pinv = Pinv.at[2, 2].set(1.0).at[3, 3].set(1.0)
        return P @ T_local @ Pinv, found

    return jax.jit(jax.vmap(one))


class LineBasedScanmatcher:
    """Facade with the reference's public API (hpp:126-130).

    All jitted programs are process-wide caches keyed on the (frozen)
    config — constructing a new scanmatcher re-uses the already-traced
    and compiled programs instead of re-tracing per instance."""

    def __init__(self, cfg: LineScanmatcherConfig = LineScanmatcherConfig()):
        self.cfg = cfg
        self._global_fn = _jitted_align(cfg, False)
        self._local_fn = _jitted_align(cfg, True)
        self._overlap_fn = _jitted_overlap(cfg)
        self._key = jax.random.PRNGKey(7)

    # ---- feature extraction -------------------------------------------
    def line_extraction(self, cloud: MaskedCloud) -> LineSegments:
        self._key, sub = jax.random.split(self._key)
        return ransac_line(
            cloud, sub,
            max_lines=self.cfg.max_lines,
            n_hypotheses=self.cfg.n_hypotheses,
            dist_thresh=self.cfg.sac_distance_threshold,
            min_cluster_size=self.cfg.min_cluster_size,
            max_cluster_size=self.cfg.max_cluster_size,
            cluster_tolerance=self.cfg.cluster_tolerance,
            merror_threshold=self.cfg.merror_threshold,
            length_threshold=self.cfg.line_length_threshold,
            chunk=self.cfg.cloud_chunk,
        )

    def merge_target_lines(self, lines: LineSegments) -> LineSegments:
        """Host-side exact merge, re-padded to target capacity."""
        a = np.asarray(lines.a)[np.asarray(lines.mask)]
        b = np.asarray(lines.b)[np.asarray(lines.mask)]
        ma, mb = merge_lines(a, b)
        return make_lines(ma, mb, capacity=self.cfg.max_target_lines,
                          dtype=lines.a.dtype)

    # ---- alignments ----------------------------------------------------
    def align_global(self, cloud_or_lines, target_lines: LineSegments,
                     constrain_angle=False, max_range=np.inf,
                     merge_targets=True) -> BestFitAlignment:
        if isinstance(cloud_or_lines, MaskedCloud):
            src = self.line_extraction(cloud_or_lines)
        else:
            src = cloud_or_lines
        trg = (self.merge_target_lines(target_lines) if merge_targets
               else target_lines)
        se = edge_extraction(src, capacity=self.cfg.edge_capacity)
        te = edge_extraction(trg, capacity=self.cfg.target_edge_capacity)
        return self._global_fn(src, trg, se, te, bool(constrain_angle),
                               float(max_range))

    def align_local(self, src_lines: LineSegments, target_lines: LineSegments,
                    max_range=np.inf) -> BestFitAlignment:
        # src is a building outline in the delta flow (<= ~16 lines whose
        # angular edges are true polygon corners): the small capacity
        # keeps the Es x Et candidate cross proportional to reality
        se = edge_extraction(
            src_lines, only_angular_edges=True, max_dist_angular_edge=0.01,
            capacity=self.cfg.building_edge_capacity,
        )
        te = edge_extraction(
            target_lines, only_angular_edges=True, max_dist_angular_edge=7.0,
            capacity=self.cfg.target_edge_capacity,
        )
        return self._local_fn(src_lines, target_lines, se, te, False,
                              float(max_range))

    def align_local_batch(self, src_stack: LineSegments,
                          tgt_stack: LineSegments, Ts, Tt,
                          max_range=0.5) -> BestFitAlignment:
        """Batched align_local: B (building, scan) pairs in ONE dispatch.

        The reference runs align_local once per (keyframe x near
        building) per cycle (delta_graph_slam_nodelet.cpp:687); issuing
        those as separate device programs costs a host sync each (~5 ms
        RTT on the tunnel), which serializes into seconds per cycle at
        city density. Here the line sets are stacked on a leading batch
        axis, the per-pair frame transforms Ts/Tt (B,4,4) are applied
        in-program, and edge extraction + alignment vmap across pairs.
        Padded pairs (mask all-False lines) return identity transforms.
        """
        return _jitted_local_batch(self.cfg)(
            src_stack, tgt_stack, jnp.asarray(Ts, src_stack.a.dtype),
            jnp.asarray(Tt, src_stack.a.dtype), float(max_range),
        )

    def align_overlapped_batch(self, la_stack: LineSegments,
                               lb_stack: LineSegments, poses_a, poses_b):
        """Batched align_overlapped_buildings: B overlapped pairs in ONE
        dispatch (VERDICT r3 #6 — the reference loops the alignment per
        pair per de-overlap round, delta_graph_slam_nodelet.cpp:873-885;
        the r3 rebuild batched only the overlap TEST, leaving ~300 ms
        per-pair device round-trips in the level-2 loop).

        la_stack/lb_stack: line sets with a leading (B,) axis in MAP
        frame; poses_a/poses_b: (B, 3) SE2 building estimates. Returns
        (T_map (B,4,4), found (B,) bool). Padded pairs (mask all-False)
        return identity / False.
        """
        dtype = la_stack.a.dtype
        return _jitted_overlap_batch(self.cfg)(
            la_stack, lb_stack, jnp.asarray(poses_a, dtype),
            jnp.asarray(poses_b, dtype),
        )

    def align_overlapped_buildings(self, lines_a: LineSegments, pose_a,
                                   lines_b: LineSegments, pose_b):
        """pose_a/pose_b: (3,) SE2 estimates of the buildings.

        Returns (T_map (4,4), found bool): the transform in map frame that
        moves building A off building B with minimum translation.
        """
        from ..geom.se2 import se2_compose, se2_inverse, se2_matrix

        pa = np.asarray(pose_a, float)
        pb = np.asarray(pose_b, float)
        m = np.asarray(se2_matrix(jnp.asarray(pa)))
        Rw = m[:2, :2]
        tw = m[:2, 2]
        # into A's frame
        def to_local(lines):
            a = (np.asarray(lines.a) - tw) @ Rw
            b = (np.asarray(lines.b) - tw) @ Rw
            return lines._replace(
                a=jnp.asarray(a, lines.a.dtype), b=jnp.asarray(b, lines.b.dtype)
            )

        la = to_local(lines_a)
        lb = to_local(lines_b)
        rel = np.asarray(se2_compose(se2_inverse(jnp.asarray(pa)), jnp.asarray(pb)))
        center_b = jnp.asarray(rel[:2], lines_a.a.dtype)
        ea = edge_extraction(la, capacity=self.cfg.building_edge_capacity)
        eb = edge_extraction(lb, capacity=self.cfg.building_edge_capacity)
        T_local, aligned, found = self._overlap_fn(la, lb, ea, eb, center_b)
        # back to map frame: T_map = P * T_local * P^-1
        P = np.asarray(transform_2d_to_3d(jnp.asarray(pa)))
        T_map = P @ np.asarray(T_local, np.float64) @ np.linalg.inv(P)
        return T_map, bool(found)
