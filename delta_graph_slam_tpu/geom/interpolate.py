"""Segment -> point-cloud interpolation (fixed-capacity, masked).

Reference: interpolate() emits one point every 2 cm from a to b inclusive of
the start and of every step <= |b-a| (/root/reference/src/hdl_graph_slam/
ros_utils.cpp:146-165). The TPU version is batched and static-shaped: it
emits ``capacity`` points per segment with a validity mask.
"""

import jax.numpy as jnp

SAMPLE_STEP = 0.02  # meters, matches the reference's 2 cm


def interpolate_segment(a, b, capacity, step=SAMPLE_STEP):
    """Sample points along segments a->b every ``step`` meters.

    a, b: (..., 2 or 3). Returns (points (..., capacity, d), mask (..., capacity)).
    Point i = a + i*step*normalize(b-a) for i*step <= |b-a| (z forced to 0 when
    d == 3, matching the reference which flattens buildings to the plane).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ab = b - a
    norm = jnp.linalg.norm(ab, axis=-1, keepdims=True)
    direction = ab / jnp.maximum(norm, 1e-12)
    i = jnp.arange(capacity, dtype=a.dtype)
    offs = i * step  # (capacity,)
    pts = a[..., None, :] + offs[..., :, None] * direction[..., None, :]
    mask = offs <= norm  # broadcast (..., capacity)
    if a.shape[-1] == 3:
        pts = pts.at[..., 2].set(0.0)
    pts = jnp.where(mask[..., None], pts, 0.0)
    return pts, mask
