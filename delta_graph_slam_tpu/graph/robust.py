"""Robust loss kernels with g2o-compatible semantics.

The reference recognizes nine kernel names in its sidecar serialization
(/root/reference/src/g2o/robust_kernel_io.cpp:15-41): Huber, Cauchy, DCS,
Fair, GemanMcClure, PseudoHuber, Saturated, Tukey, Welsch (plus NONE).
g2o robustifies the squared error e2 = e^T Omega e with rho(e2) and scales
the normal equations by w = rho'(e2).

Kernels are selected per edge by integer id so a whole edge table evaluates
every branch and selects (lax-friendly, no data-dependent control flow).
"""

import jax.numpy as jnp

ROBUST_KERNELS = (
    "NONE", "Huber", "Cauchy", "DCS", "Fair", "GemanMcClure",
    "PseudoHuber", "Saturated", "Tukey", "Welsch",
)
_IDS = {name: i for i, name in enumerate(ROBUST_KERNELS)}


def kernel_id(name: str) -> int:
    if name not in _IDS:
        raise ValueError(f"unknown robust kernel {name!r}; known: {ROBUST_KERNELS}")
    return _IDS[name]


def _all_rhos(e2, delta):
    """rho(e2) for every kernel, stacked on axis 0. delta is the kernel width."""
    d2 = delta * delta
    sqrte = jnp.sqrt(jnp.maximum(e2, 1e-30))
    none = e2
    huber = jnp.where(e2 <= d2, e2, 2.0 * delta * sqrte - d2)
    cauchy = d2 * jnp.log1p(e2 / d2)
    # DCS (dynamic covariance scaling): s = min(1, 2 d2/(d2+e2)); rho = s(2-s) e2-ish.
    s = jnp.minimum(1.0, 2.0 * d2 / (d2 + e2))
    dcs = s * (2.0 - s) * e2  # equals e2 when s==1
    fair = 2.0 * d2 * (sqrte / delta - jnp.log1p(sqrte / delta))
    gmc = d2 * e2 / (d2 + e2)
    phuber = 2.0 * d2 * (jnp.sqrt(1.0 + e2 / d2) - 1.0)
    saturated = jnp.minimum(e2, d2)
    tk = 1.0 - e2 / d2
    tukey = jnp.where(e2 <= d2, (d2 / 3.0) * (1.0 - tk**3), d2 / 3.0)
    welsch = d2 * (1.0 - jnp.exp(-e2 / d2))
    return jnp.stack(
        [none, huber, cauchy, dcs, fair, gmc, phuber, saturated, tukey, welsch]
    )


def _all_weights(e2, delta):
    """w = d rho / d e2 for every kernel, stacked on axis 0."""
    d2 = delta * delta
    sqrte = jnp.sqrt(jnp.maximum(e2, 1e-30))
    one = jnp.ones_like(e2)
    huber = jnp.where(e2 <= d2, one, delta / sqrte)
    cauchy = 1.0 / (1.0 + e2 / d2)
    s = jnp.minimum(1.0, 2.0 * d2 / (d2 + e2))
    dcs = s * s
    fair = 1.0 / (1.0 + sqrte / delta)
    gmc = (d2 / (d2 + e2)) ** 2
    phuber = 1.0 / jnp.sqrt(1.0 + e2 / d2)
    saturated = jnp.where(e2 <= d2, one, jnp.zeros_like(e2))
    tukey = jnp.where(e2 <= d2, (1.0 - e2 / d2) ** 2, jnp.zeros_like(e2))
    welsch = jnp.exp(-e2 / d2)
    return jnp.stack(
        [one, huber, cauchy, dcs, fair, gmc, phuber, saturated, tukey, welsch]
    )


def robust_rho(e2, kernel_ids, deltas):
    """Robustified squared error. e2 (...,), kernel_ids int (...,), deltas (...,)."""
    deltas = jnp.where(deltas > 0, deltas, 1.0)
    rhos = _all_rhos(e2, deltas)  # (K, ...)
    return jnp.take_along_axis(rhos, kernel_ids[None].astype(jnp.int32), axis=0)[0]


def robust_weight(e2, kernel_ids, deltas):
    """IRLS weight rho'(e2) applied to the edge information in H and b."""
    deltas = jnp.where(deltas > 0, deltas, 1.0)
    ws = _all_weights(e2, deltas)
    return jnp.take_along_axis(ws, kernel_ids[None].astype(jnp.int32), axis=0)[0]
