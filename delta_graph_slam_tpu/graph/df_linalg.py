"""Double-float (two-f32) batched small-matrix algebra for the BCR core.

Why this exists: the block-cyclic-reduction elimination down an N-block
pose-graph chain has forward error ~ C * kappa(T) * eps. A SLAM chain's
kappa grows like N^2 (Laplacian-like), so at N=4096 f32 loses ALL
precision at small LM damping (measured 270% step error once lambda drops
under ~1e-5 — exactly the regime Levenberg-Marquardt needs for tail
convergence). TPU hardware has no f64, and XLA's software-emulated f64 is
~1000x slower than f32 here (measured 7.3 s vs 4.4 ms per LM iteration).

The fix is double-float arithmetic exactly where the elimination error
compounds: every value is an unevaluated sum (hi, lo) of two f32s
(~2^-48 effective epsilon), built from error-free transforms:

  - two_sum   (Knuth):   a + b = s + e exactly, 6 ops
  - two_prod  (Dekker):  a * b = p + e exactly, via magnitude splitting
                         (no FMA exposed through jnp on TPU)

All helpers are branch-free elementwise ops on (..., 3, 3) batches, so
XLA fuses each df matmul into a handful of VPU kernels — the op-count
inflation (~8x) stays inside fused kernels instead of multiplying kernel
launches. kappa * eps_df ~ 1.7e7 * 4e-15 ~ 1e-7: exact Newton steps at
any lambda the LM schedule reaches.

Replaces the f64 CHOLMOD arithmetic of the reference's solver
(/root/reference/src/hdl_graph_slam/graph_slam.cpp:31-33, g2o doubles).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1 Dekker split for f32 (24-bit)


class DFM(NamedTuple):
    """Double-float array: value = hi + lo elementwise."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def dfm(hi, lo=None) -> DFM:
    return DFM(hi, jnp.zeros_like(hi) if lo is None else lo)


# XLA's optimizer deletes textbook error-free transforms: the algebraic
# simplifier folds patterns like a - (s - (s - a)) once fusion exposes
# them (and jax.lax.optimization_barrier does NOT survive to that pass —
# measured: barriers present in stablehlo, stripped in the optimized HLO,
# jitted df dot products collapsing to plain-f32 accuracy on XLA:CPU).
# The select-based Dekker/Moller form below is simplifier-proof: every
# cancellation-carrying subtraction goes through jnp.where with a
# runtime predicate, which the simplifier cannot reason through.

def _two_sum(a, b):
    """a + b = s + e exactly, via magnitude-ordered fast_two_sum."""
    s = a + b
    a_big = jnp.abs(a) >= jnp.abs(b)
    big = jnp.where(a_big, a, b)
    small = jnp.where(a_big, b, a)
    e = small - (s - big)
    return s, e


def _quick_two_sum(a, b):
    """Same as _two_sum (the |a|>=|b| precondition is subsumed by the
    select, which we need anyway to stay opaque to the simplifier)."""
    return _two_sum(a, b)


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(x: DFM, y: DFM) -> DFM:
    s, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DFM(*_quick_two_sum(s, e))


def df_neg(x: DFM) -> DFM:
    return DFM(-x.hi, -x.lo)

def df_sub(x: DFM, y: DFM) -> DFM:
    return df_add(x, df_neg(y))


def df_mul(x: DFM, y: DFM) -> DFM:
    p, e = _two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DFM(*_quick_two_sum(p, e))


def df_div(x: DFM, y: DFM) -> DFM:
    """One Newton-refined division (standard double-float recipe)."""
    q1 = x.hi / y.hi
    r = df_sub(x, df_scale(y, q1))
    q2 = r.hi / y.hi
    r = df_sub(r, df_scale(y, q2))
    q3 = r.hi / y.hi
    s, e = _quick_two_sum(q1, q2)
    return DFM(*_quick_two_sum(s, e + q3))


def df_scale(x: DFM, f) -> DFM:
    """x * f where f is a plain f32 array/scalar."""
    p, e = _two_prod(x.hi, f)
    e = e + x.lo * f
    return DFM(*_quick_two_sum(p, e))


def df_value(x: DFM):
    return x.hi + x.lo


# ------------------------------------------------------- batched 3x3 algebra

def df_bmm(A: DFM, B: DFM) -> DFM:
    """Batched (...,D,K) @ (...,K,N) in double-float.

    Broadcast-multiply + df summation along K (matches lm_core.bmm's
    layout so XLA fuses it the same way).
    """
    a_h = A.hi[..., :, :, None]
    a_l = A.lo[..., :, :, None]
    b_h = B.hi[..., None, :, :]
    b_l = B.lo[..., None, :, :]
    p, e = _two_prod(a_h, b_h)
    e = e + (a_h * b_l + a_l * b_h)
    # sum over the contraction axis with two_sum accumulation
    K = p.shape[-2]
    s = DFM(p[..., 0, :], e[..., 0, :])
    for k in range(1, K):
        s = df_add(s, DFM(p[..., k, :], e[..., k, :]))
    return s


def df_bT(A: DFM) -> DFM:
    return DFM(jnp.swapaxes(A.hi, -1, -2), jnp.swapaxes(A.lo, -1, -2))


def df_segment_sum(vals: DFM, ids, num_segments) -> DFM:
    """Segment-sum with ~2^-48 accuracy via exact digit-channel scatters.

    jax.ops.segment_sum rounds every partial sum to f32; assembling a
    pose-graph Hessian that way perturbs T by ~1e-7 relative, which the
    chain's kappa ~ N^2 amplifies to an O(1) solve error (measured:
    step error growing as 1/lambda in the LM tail).

    Method (superaccumulator): per (segment, lane) compute a power-of-two
    scale from the max |hi|, then split each addend's exact value
    (hi + lo) into four 12-bit digit channels aligned to that scale.
    Each channel's addends are integer multiples of its window unit with
    segment totals below 2^24 units, so four plain f32 scatter-adds are
    EXACT; the channels recombine into a df pair. O(1) passes — much
    faster than a sorted segmented df scan (measured 2.2 ms -> ~0.5 ms
    at E=8k on TPU v5e) and no argsort.

    The 12-bit digit extraction uses the round-to-grid add-sub trick
    (v + C) - C with C = 1.5 * 2^23 * grid; the jnp.where(ok, ...) with
    a runtime-true predicate keeps XLA's algebraic simplifier from
    folding the pattern away (same issue as two_sum — see module doc).
    Valid while segments have <= 2^12 contributions (a pose-graph vertex
    has a few dozen at most).
    """
    ids = ids.astype(jnp.int32)
    hi, lo = vals.hi, vals.lo
    dtype = hi.dtype
    shape = (num_segments,) + hi.shape[1:]
    ok = (ids >= 0).reshape(ids.shape + (1,) * (hi.ndim - 1))

    # per-(segment, lane) power-of-two scale
    amax = jnp.zeros(shape, dtype).at[ids].max(jnp.abs(hi))
    scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30))))[ids]

    digits = []
    r = hi
    carry_lo = lo
    for k in range(4):
        grid = scale * np.float32(2.0 ** (-12 * (k + 1) + 1))
        C = np.float32(1.5 * 2.0**23) * grid
        t = r + C
        t = jnp.where(ok, t, 0.0)
        d = t - C                      # r rounded to the window grid
        r = r - d                      # exact remainder
        if k == 1:
            # fold the lo limb once the remainder matches its magnitude
            # (|r| <= grid1/2 ~ scale*2^-24 ~ |lo|): the fold then
            # rounds at scale*2^-47, within the target accuracy.
            # Folding a digit earlier rounds at scale*2^-35 (measured).
            r = r + carry_lo
        digits.append((d, grid))

    out = None
    for d, grid in digits:
        s = jnp.zeros(shape, dtype).at[ids].add(d)
        part = DFM(s, jnp.zeros_like(s))
        out = part if out is None else df_add(out, part)
    # final sub-grid remainder: plain f32 scatter (error ~2^-48 * scale)
    s = jnp.zeros(shape, dtype).at[ids].add(r)
    return df_add(out, DFM(s, jnp.zeros_like(s)))


def df_matmul(A: DFM, B: DFM) -> DFM:
    """(...,M,K) @ (...,K,N) with log-tree df reduction over K.

    For wider contractions than df_bmm's unrolled D=3 loop (dense base
    Newton polish, capacitance refinement). Materializes the (...,M,K,N)
    product tensor — use only for small dense blocks.
    """
    a_h = A.hi[..., :, :, None]
    a_l = A.lo[..., :, :, None]
    b_h = B.hi[..., None, :, :]
    b_l = B.lo[..., None, :, :]
    p, e = _two_prod(a_h, b_h)
    e = e + (a_h * b_l + a_l * b_h)
    K = p.shape[-2]
    P2 = 1 << max(K - 1, 0).bit_length()
    if P2 != K:
        pad = [(0, 0)] * (p.ndim - 2) + [(0, P2 - K), (0, 0)]
        p = jnp.pad(p, pad)
        e = jnp.pad(e, pad)
    s = DFM(p, e)
    while s.hi.shape[-2] > 1:
        h = s.hi.shape[-2] // 2
        s = df_add(
            DFM(s.hi[..., :h, :], s.lo[..., :h, :]),
            DFM(s.hi[..., h:, :], s.lo[..., h:, :]),
        )
    return DFM(s.hi[..., 0, :], s.lo[..., 0, :])


def df_inv6(A: DFM) -> DFM:
    """Batched 6x6 inverse in double-float via 2x2-blocked Schur:

        [[P, Q], [R, S]]^-1 with 3x3 blocks, using df_inv3 twice
        (P^-1 and the Schur complement S - R P^-1 Q).

    Needed by the SE3 chain solver (6-dim pose blocks); the same
    kappa ~ N^2 argument as the SE2 chain applies, so the elimination
    must not round to f32 between steps."""
    def blk(r, c):
        return DFM(A.hi[..., r:r + 3, c:c + 3], A.lo[..., r:r + 3, c:c + 3])

    P, Q = blk(0, 0), blk(0, 3)
    R, S = blk(3, 0), blk(3, 3)
    Pi = df_inv3(P)
    PiQ = df_bmm(Pi, Q)
    RPi = df_bmm(R, Pi)
    Schur = df_add(S, df_neg(df_bmm(R, PiQ)))
    Si = df_inv3(Schur)
    # inverse blocks
    TL = df_add(Pi, df_bmm(PiQ, df_bmm(Si, RPi)))
    TR = df_neg(df_bmm(PiQ, Si))
    BL = df_neg(df_bmm(Si, RPi))
    BR = Si

    def cat(a, b, axis):
        return DFM(jnp.concatenate([a.hi, b.hi], axis=axis),
                   jnp.concatenate([a.lo, b.lo], axis=axis))

    top = cat(TL, TR, -1)
    bot = cat(BL, BR, -1)
    return cat(top, bot, -2)


def df_inv_dense(M: DFM, steps: int = 2) -> DFM:
    """Dense (n,n) df inverse: f32 seed + Newton X <- X(2I - M X) in df.

    Valid when kappa(M) * eps_f32 < 1 (the Newton contraction factor);
    each step squares the error, so two steps reach ~2^-48 from an f32
    seed for the well-conditioned hub blocks this is used on (a plane
    vertex's diagonal is a sum of thousands of edge informations plus
    the LM damping)."""
    X = dfm(jnp.linalg.inv(M.hi))
    eye2 = dfm(2.0 * jnp.eye(M.hi.shape[-1], dtype=M.hi.dtype))
    for _ in range(steps):
        MX = df_matmul(M, X)
        X = df_matmul(X, df_add(eye2, df_neg(MX)))
    return X


def df_invD(A: DFM) -> DFM:
    """Block-size dispatch: 3 -> adjugate, 6 -> blocked Schur."""
    D = A.hi.shape[-1]
    if D == 3:
        return df_inv3(A)
    if D == 6:
        return df_inv6(A)
    raise NotImplementedError(f"df inverse for D={D}")


def df_inv3(A: DFM) -> DFM:
    """Batched 3x3 inverse via the adjugate, all in double-float."""
    def el(i, j):
        return DFM(A.hi[..., i, j], A.lo[..., i, j])

    a, b, c = el(0, 0), el(0, 1), el(0, 2)
    d, e, f = el(1, 0), el(1, 1), el(1, 2)
    g, h, i = el(2, 0), el(2, 1), el(2, 2)

    def m(x, y):
        return df_mul(x, y)

    A00 = df_sub(m(e, i), m(f, h))
    A01 = df_sub(m(c, h), m(b, i))
    A02 = df_sub(m(b, f), m(c, e))
    A10 = df_sub(m(f, g), m(d, i))
    A11 = df_sub(m(a, i), m(c, g))
    A12 = df_sub(m(c, d), m(a, f))
    A20 = df_sub(m(d, h), m(e, g))
    A21 = df_sub(m(b, g), m(a, h))
    A22 = df_sub(m(a, e), m(b, d))
    det = df_add(df_add(m(a, A00), m(b, A10)), m(c, A20))
    one = DFM(jnp.ones_like(det.hi), jnp.zeros_like(det.hi))
    inv_det = df_div(one, det)  # one division, then 9 multiplies

    rows = [[A00, A01, A02], [A10, A11, A12], [A20, A21, A22]]
    cells = [[df_mul(rows[r][cc], inv_det) for cc in range(3)]
             for r in range(3)]
    out_h = jnp.stack(
        [jnp.stack([cells[r][cc].hi for cc in range(3)], -1)
         for r in range(3)], -2
    )
    out_l = jnp.stack(
        [jnp.stack([cells[r][cc].lo for cc in range(3)], -1)
         for r in range(3)], -2
    )
    return DFM(out_h, out_l)
