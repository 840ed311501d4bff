"""Double-float (two-f32) arithmetic for the pose-graph solver state.

Why: TPU f64 is software-emulated and ~1000x slower than f32 (measured
7.3 s/LM-iter vs 4.4 ms on the 4k bench graph), but f32 pose storage
stalls Levenberg-Marquardt on metric-scale SLAM graphs: at KITTI scale
(|t| ~ 300 m) one f32 ulp is ~3e-5 m, so late-stage updates are swallowed
by rounding and the residual differences t_j - t_i cancel catastrophically.
Measured: f32 chain-LM stalls at chi2 0.41 / ATE 13.5 m on the 4k bench
graph whose true optimum (f64 trusted solve) is chi2 0.2957 / ATE 7.58 m.

The TPU-native fix is *selective* extended precision: keep the state as an
unevaluated sum hi + lo of two f32 arrays (a "double-float"), and use it
only where cancellation lives —

  - accumulating LM updates into the state (two_sum),
  - differencing nearby large coordinates in residuals (df_diff),

while Jacobians, robust weights, the linear solve, and chi2 sums remain
plain f32 (their errors are not amplified by cancellation). All helpers
are branch-free elementwise ops that fuse into the surrounding kernels.

Error-free transforms (Knuth two_sum, Dekker fast_two_sum) require IEEE
f32 add/sub without value-changing 'fast math'; tests/test_geom.py checks
the invariants on the actual backend.

This replaces the f64 dependency of the reference's CHOLMOD solve
(/root/reference/src/hdl_graph_slam/graph_slam.cpp:338-352, g2o doubles
throughout) with an idiomatic mixed-precision design.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DF(NamedTuple):
    """Unevaluated f32 sum: value = hi + lo, |lo| <= ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b):
    """Exact addition a + b = s + e via magnitude-ordered fast_two_sum.

    The select-based form is deliberate: XLA's algebraic simplifier
    folds the textbook Knuth pattern a - (s - (s - a)) once fusion
    exposes it, silently deleting the error term (measured on XLA:CPU;
    optimization_barrier does not survive to that pass). jnp.where with
    a runtime predicate is opaque to the simplifier."""
    s = a + b
    a_big = jnp.abs(a) >= jnp.abs(b)
    big = jnp.where(a_big, a, b)
    small = jnp.where(a_big, b, a)
    e = small - (s - big)
    return s, e


def df_split(x) -> DF:
    """Split a float64 (host) array into a DF pair."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def df_from_f32(x) -> DF:
    return DF(x, jnp.zeros_like(x))


def df_value(d: DF):
    """Collapse to f32 (rounds away lo)."""
    return d.hi + d.lo


def df_to_f64(d: DF):
    """Host-side exact value."""
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


def df_add_small(d: DF, dx) -> DF:
    """d + dx where |dx| is small vs |d| (an LM update). Renormalized."""
    s, e = two_sum(d.hi, dx)
    lo = d.lo + e
    hi2, e2 = two_sum(s, lo)
    return DF(hi2, e2)


def df_diff(a: DF, b: DF):
    """f32 value of (a - b), accurate when a and b nearly cancel.

    hi_a - hi_b is exact by Sterbenz's lemma whenever the values are
    within 2x of each other (always true for nearby poses); adding the
    lo difference then recovers ~f64-quality small differences.
    """
    return (a.hi - b.hi) + (a.lo - b.lo)


def df_diff_const(a: DF, c):
    """f32 value of (a - c) for an f32 constant c near a."""
    return (a.hi - c) + a.lo


# 2*pi as a two-f32 constant (sum is the correctly-rounded f64 2*pi)
_TWO_PI_HI = np.float32(2.0 * np.pi)
_TWO_PI_LO = np.float32(2.0 * np.pi - np.float64(np.float32(2.0 * np.pi)))


def df_normalize_angle(d: DF) -> DF:
    """Wrap hi+lo into [-pi, pi) without losing the lo bits.

    k = round(value / 2pi) is a small integer, so k * TWO_PI_HI and
    k * TWO_PI_LO are exact f32 products; two_sum re-absorbs the shift.
    """
    k = jnp.round((d.hi + d.lo) * np.float32(1.0 / (2.0 * np.pi)))
    s, e = two_sum(d.hi, -k * _TWO_PI_HI)
    lo = d.lo + e - k * _TWO_PI_LO
    hi2, e2 = two_sum(s, lo)
    return DF(hi2, e2)
