"""Brute-force neighbor search, tiled for bounded memory.

Replaces the reference's pcl::KdTree 1-NN / kNN queries (fitness scoring
information_matrix_calculator.cpp:77-108, status inliers
scan_matching_odometry_nodelet.cpp:320-331, kNN normals
prefiltering_nodelet.cpp:217-228). Distances are computed tile-by-tile with
an MXU-friendly inner product; a ``lax.scan`` carries the running best so
the full (N, M) distance matrix is never materialized.
"""

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _pad_to(x, size, fill):
    pad = size - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


def _chunked(target, tmask, chunk):
    m = target.shape[0]
    nchunks = -(-m // chunk)
    tgt = _pad_to(target, nchunks * chunk, 0.0).reshape(nchunks, chunk, -1)
    msk = _pad_to(tmask, nchunks * chunk, False).reshape(nchunks, chunk)
    return tgt, msk, nchunks


def _dist2(query, tgt_chunk):
    # |q - t|^2 = |q|^2 - 2 q.t + |t|^2
    qq = jnp.sum(query * query, axis=-1, keepdims=True)
    tt = jnp.sum(tgt_chunk * tgt_chunk, axis=-1)
    qt = jnp.matmul(query, tgt_chunk.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq - 2.0 * qt + tt[None, :], 0.0)


def nn_1(query, qmask, target, tmask, *, exclude_self=False, chunk=2048):
    """1-nearest-neighbor. Returns (dist2 (N,), idx (N,)).

    Invalid queries get dist2=inf, idx=0. ``exclude_self`` skips the target
    with the same global index as the query (same-cloud searches).
    """
    n = query.shape[0]
    tgt, msk, nchunks = _chunked(target, tmask, chunk)
    qidx = jnp.arange(n, dtype=jnp.int32)

    def body(carry, inp):
        best_d, best_i = carry
        ci, tc, mc = inp
        d2 = _dist2(query, tc)  # (N, chunk)
        tglobal = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = mc[None, :]
        if exclude_self:
            valid = valid & (tglobal[None, :] != qidx[:, None])
        d2 = jnp.where(valid, d2, _INF)
        cmin = jnp.min(d2, axis=1)
        carg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        better = cmin < best_d
        best_d = jnp.where(better, cmin, best_d)
        best_i = jnp.where(better, ci * chunk + carg, best_i)
        return (best_d, best_i), None

    init = (jnp.full((n,), _INF, query.dtype), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(nchunks, dtype=jnp.int32), tgt, msk)
    )
    best_d = jnp.where(qmask, best_d, _INF)
    return best_d, best_i


def knn(query, qmask, target, tmask, k, *, exclude_self=False, chunk=1024):
    """k-nearest-neighbors. Returns (dists2 (N,k) ascending, idx (N,k)).

    Missing neighbors (fewer than k valid targets) get dist2=inf.
    """
    n = query.shape[0]
    tgt, msk, nchunks = _chunked(target, tmask, chunk)
    qidx = jnp.arange(n, dtype=jnp.int32)

    def body(carry, inp):
        best_d, best_i = carry  # (N,k)
        ci, tc, mc = inp
        d2 = _dist2(query, tc)
        tglobal = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = mc[None, :]
        if exclude_self:
            valid = valid & (tglobal[None, :] != qidx[:, None])
        d2 = jnp.where(valid, d2, _INF)
        alld = jnp.concatenate([best_d, d2], axis=1)
        alli = jnp.concatenate(
            [best_i, jnp.broadcast_to(tglobal[None, :], (n, chunk))], axis=1
        )
        negd, sel = jax.lax.top_k(-alld, k)
        best_d = -negd
        best_i = jnp.take_along_axis(alli, sel, axis=1)
        return (best_d, best_i), None

    init = (
        jnp.full((n, k), _INF, query.dtype),
        jnp.zeros((n, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(nchunks, dtype=jnp.int32), tgt, msk)
    )
    best_d = jnp.where(qmask[:, None], best_d, _INF)
    return best_d, best_i


def radius_count(points, mask, radius, *, chunk=2048):
    """Number of *other* valid points within ``radius`` of each point."""
    n = points.shape[0]
    tgt, msk, nchunks = _chunked(points, mask, chunk)
    qidx = jnp.arange(n, dtype=jnp.int32)
    r2 = radius * radius

    def body(count, inp):
        ci, tc, mc = inp
        d2 = _dist2(points, tc)
        tglobal = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = mc[None, :] & (tglobal[None, :] != qidx[:, None])
        count = count + jnp.sum((d2 <= r2) & valid, axis=1).astype(count.dtype)
        return count, None

    count, _ = jax.lax.scan(
        body,
        jnp.zeros((n,), jnp.int32),
        (jnp.arange(nchunks, dtype=jnp.int32), tgt, msk),
    )
    return jnp.where(mask, count, 0)
