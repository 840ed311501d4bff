"""Pallas TPU kernel: tiled exact 1-nearest-neighbor (argmin) search.

The exact-NN path (kd-tree replacement for 'brute' correspondence and
fitness scoring) streams target tiles through VMEM and keeps a running
(best-distance, best-index) pair per query row — the full (N, M) distance
matrix never exists. Grid = (query tiles, target tiles) with the target
axis minor, so one query tile's accumulators stay resident in VMEM while
target tiles stream through (revision-on-first-tile pattern).

Falls back to the XLA scan implementation (ops.knn.nn_1) on non-TPU
platforms or shapes that don't tile.
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    pl = None
    HAVE_PALLAS = False

_INF = 3.4e38  # python float: jnp scalars would be captured tracers


def _nn_kernel(q_ref, t_ref, tmask_ref, dist_ref, idx_ref, *, chunk_t):
    """q_ref (TQ,3) | t_ref (TT,3) | tmask_ref (1,TT) f32 |
    dist_ref/idx_ref (TQ,1) running best."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]                                        # (TQ, 3)
    t = t_ref[:]                                        # (TT, 3)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)         # (TQ, 1)
    tt = jnp.sum(t * t, axis=-1)                        # (TT,)
    qt = jax.lax.dot_general(
        q, t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # MXU defaults to bf16 operands
    )                                                   # (TQ, TT)
    d2 = jnp.maximum(qq - 2.0 * qt + tt[None, :], 0.0)
    d2 = jnp.where(tmask_ref[0, :][None, :] > 0, d2, _INF)
    tile_best = jnp.min(d2, axis=1, keepdims=True)                  # (TQ,1)
    tile_arg = (
        jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None] + j * chunk_t
    )
    better = tile_best < dist_ref[:]
    dist_ref[:] = jnp.where(better, tile_best, dist_ref[:])
    idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])


@functools.partial(
    jax.jit, static_argnames=("tile_q", "tile_t", "interpret")
)
def nn_1_pallas(query, qmask, target, tmask, tile_q=512, tile_t=1024,
                interpret=False):
    """Exact 1-NN via the Pallas kernel; shapes must divide the tiles.

    Returns (d2 (N,), idx (N,)) like ops.knn.nn_1 (invalid queries -> inf).
    """
    n = query.shape[0]
    m = target.shape[0]
    assert n % tile_q == 0 and m % tile_t == 0, (n, m, tile_q, tile_t)
    q32 = query.astype(jnp.float32)
    t32 = target.astype(jnp.float32)
    tm = tmask.astype(jnp.float32).reshape(1, m)

    grid = (n // tile_q, m // tile_t)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, chunk_t=tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_t, 3), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q32, t32, tm)
    d2 = jnp.where(qmask, dist[:, 0], jnp.inf).astype(query.dtype)
    return d2, idx[:, 0]


def nn_1_auto(query, qmask, target, tmask, chunk=2048):
    """Pallas on TPU when shapes tile cleanly; XLA scan otherwise."""
    from .knn import nn_1

    if (
        HAVE_PALLAS
        and jax.default_backend() == "tpu"
        and query.shape[0] % 512 == 0
        and target.shape[0] % 1024 == 0
    ):
        return nn_1_pallas(query, qmask, target, tmask)
    return nn_1(query, qmask, target, tmask, chunk=chunk)
