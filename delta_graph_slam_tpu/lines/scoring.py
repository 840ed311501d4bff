"""Line-to-line distances, coverage, and fitness scores.

Vectorizes the reference's scoring stack (line_based_scanmatcher.cpp):
- point_to_line_distance (segment-clamped)          :777-798
- line_to_line_distance (distance + coverage)       :811-903
- calc_fitness_score (length-weighted aggregation)  :905-955
- nearest_neighbor (per-line best target)           :957-983
- weight_global / weight_local                      (hpp:155-168)
"""

from typing import NamedTuple

import jax.numpy as jnp

from .features import lines_intersection, _unit, _norm

_INF = jnp.inf


class FitnessScore(NamedTuple):
    real_avg_distance: jnp.ndarray
    avg_distance: jnp.ndarray
    coverage: jnp.ndarray
    coverage_percentage: jnp.ndarray


def point_to_segment_distance(p, a, b):
    """Distance from point(s) to segment(s) [a,b] with endpoint clamping."""
    d = b - a
    len2 = jnp.sum(d * d, -1)
    t = jnp.sum((p - a) * d, -1) / jnp.maximum(len2, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * d
    return _norm(p - proj)


def line_to_line_distance(src_a, src_b, trg_a, trg_b):
    """The reference's distance+coverage metric, batched over any shape.

    Returns FitnessScore per pair. Semantics (cpp:811-903): the first two
    of four ordered candidate events (srcA/srcB projected inside trg;
    trgA/trgB perpendicular feet inside src) define the covered interval;
    avg_distance is the mean of their two distances, coverage the interval
    length; fewer than two events -> avg_distance inf, coverage 0.
    """
    d = _unit(trg_b - trg_a)

    def on_seg(p, a, b):
        dot1 = jnp.sum((p - a) * (b - a), -1)
        dot2 = jnp.sum((p - b) * (a - b), -1)
        return (dot1 >= 0) & (dot2 >= 0)

    # events 1,2: src endpoints projected onto trg line
    pts = []
    for sp in (src_a, src_b):
        proj = trg_a + d * jnp.sum((sp - trg_a) * d, -1, keepdims=True)
        ok = on_seg(proj, trg_a, trg_b)
        dist = _norm(sp - proj)
        pts.append((sp, dist, ok))  # event point = SOURCE endpoint

    # events 3,4: perpendiculars through trg endpoints intersected with src
    dperp = jnp.stack([d[..., 1], -d[..., 0]], -1)
    for tp in (trg_a, trg_b):
        inter, iok = lines_intersection(src_a, src_b, tp, tp + dperp)
        ok = on_seg(inter, src_a, src_b) & iok
        dist = _norm(tp - inter)
        pts.append((inter, dist, ok))  # event point = foot on src line

    # broadcast all four events to the common pair shape before stacking
    shape = jnp.broadcast_shapes(*(p[1].shape for p in pts))
    valid = jnp.stack([jnp.broadcast_to(p[2], shape) for p in pts], -1)
    dists = jnp.stack([jnp.broadcast_to(p[1], shape) for p in pts], -1)
    points = jnp.stack(
        [jnp.broadcast_to(p[0], shape + (2,)) for p in pts], -2
    )  # (...,4,2)
    cum = jnp.cumsum(valid.astype(jnp.int32), -1)
    first = valid & (cum == 1)
    second = valid & (cum == 2)
    has2 = jnp.sum(second, -1) > 0

    def pick(flag, arr):
        return jnp.sum(jnp.where(flag[..., None], arr, 0.0), -2)

    p1 = pick(first, points)
    p2 = pick(second, points)
    d1 = jnp.sum(jnp.where(first, dists, 0.0), -1)
    d2 = jnp.sum(jnp.where(second, dists, 0.0), -1)

    avg = jnp.where(has2, (d1 + d2) / 2.0, _INF)
    cov = jnp.where(has2, _norm(p2 - p1), 0.0)
    src_len = jnp.maximum(_norm(src_b - src_a), 1e-12)
    covp = cov / src_len

    real = 0.5 * (
        point_to_segment_distance(src_a, trg_a, trg_b)
        + point_to_segment_distance(src_b, trg_a, trg_b)
    )
    return FitnessScore(real, avg, cov, covp)


def pairwise_scores(src, trg):
    """All (Ls,Lt) line pair FitnessScores. src/trg: LineSegments."""
    sa = src.a[:, None, :]
    sb = src.b[:, None, :]
    ta = trg.a[None, :, :]
    tb = trg.b[None, :, :]
    return line_to_line_distance(sa, sb, ta, tb)


def nearest_neighbor(src, trg):
    """Per-source-line targets sorted by real_distance ascending.

    Returns (order (Ls,Lt) int32 target indices, scores FitnessScore with
    (Ls,Lt) fields sorted accordingly, valid (Ls,Lt)). Invalid targets
    sort last (cpp:957-983 keeps order by real_distance).
    """
    fs = pairwise_scores(src, trg)
    pvalid = src.mask[:, None] & trg.mask[None, :]
    key = jnp.where(pvalid, fs.real_avg_distance, _INF)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)

    def take(x):
        return jnp.take_along_axis(x, order, axis=1)

    fs_sorted = FitnessScore(*(take(f) for f in fs))
    return order, fs_sorted, take(pvalid)


def fitness_core(sa, sb, smask, trg, is_local, max_range=_INF):
    """calc_fitness_score over arbitrary leading batch dims.

    sa/sb: (...,Ls,2) source endpoints; smask (Ls,); trg LineSegments (Lt).
    Returns FitnessScore with (...) fields. Per source line the nearest
    target is chosen by minimum real distance (cpp:957-983); the gate uses
    avg_distance for local and real distance for global (:924-930).
    """
    fs = line_to_line_distance(
        sa[..., :, None, :], sb[..., :, None, :], trg.a, trg.b
    )  # fields (...,Ls,Lt)
    pvalid = jnp.broadcast_to(
        smask[..., :, None] & trg.mask, fs.real_avg_distance.shape
    )
    key = jnp.where(pvalid, fs.real_avg_distance, _INF)
    nn = jnp.argmin(key, axis=-1)[..., None]

    def take(x):
        return jnp.take_along_axis(x, nn, axis=-1)[..., 0]

    nn_real = take(fs.real_avg_distance)
    nn_dist = take(fs.avg_distance)
    nn_cov = take(fs.coverage)
    has_nn = take(pvalid)

    lens = jnp.where(smask, _norm(sb - sa), 0.0)
    metric = nn_dist if is_local else nn_real
    in_range = has_nn & (metric < max_range) & smask

    real_num = jnp.sum(jnp.where(in_range, nn_real * lens, 0.0), -1)
    real_den = jnp.sum(jnp.where(in_range, lens, 0.0), -1)
    dist_num = jnp.sum(jnp.where(in_range, nn_dist * nn_cov, 0.0), -1)
    cov_len = jnp.sum(jnp.where(in_range, nn_cov, 0.0), -1)
    total_len = jnp.sum(lens, -1)

    real_avg = jnp.where(real_den > 0, real_num / jnp.maximum(real_den, 1e-12), _INF)
    avg = jnp.where(cov_len > 0, dist_num / jnp.maximum(cov_len, 1e-12), _INF)
    covp = jnp.where(
        total_len > 0, cov_len / jnp.maximum(total_len, 1e-12) * 100.0, 0.0
    )
    return FitnessScore(real_avg, avg, cov_len, covp)


def calc_fitness_score(src, trg, is_local, max_range=_INF):
    """Aggregate score over all source lines (cpp:905-955)."""
    return fitness_core(src.a, src.b, src.mask, trg, is_local, max_range)


def weight_score(avg_distance, coverage_percentage, translation,
                 avg_distance_weight=0.6, coverage_weight=1.0,
                 transform_weight=0.2, max_score_distance=5.0,
                 max_score_translation=5.0):
    """weight_global / weight_local (hpp:155-168); higher is better."""
    return (
        -avg_distance_weight
        * (jnp.minimum(max_score_distance, avg_distance) / max_score_distance)
        * 100.0
        + coverage_weight * coverage_percentage
        - transform_weight
        * (jnp.minimum(max_score_translation, translation) / max_score_translation)
        * 100.0
    )
