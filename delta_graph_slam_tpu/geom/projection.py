"""KITTI-style Mercator projection between GPS and local metric frames.

Semantics of translation_from_gps_msg / gps_msg_from_translation
(/root/reference/src/hdl_graph_slam/ros_utils.cpp:168-194): a spherical
Mercator scaled by ``scale = cos(lat0 * pi / 180)`` shared across the run.
"""

import jax.numpy as jnp

EARTH_RADIUS_M = 6378137.0


def mercator_scale(lat0_deg):
    """Shared projection scale from the first GPS fix latitude (degrees)."""
    return jnp.cos(jnp.deg2rad(lat0_deg))


def mercator_from_gps(lat_deg, lon_deg, alt=0.0, *, scale):
    """(lat, lon, alt) -> local metric (x, y, z) (ros_utils.cpp:168-180)."""
    lat_deg = jnp.asarray(lat_deg)
    lon_deg = jnp.asarray(lon_deg)
    x = scale * lon_deg * jnp.pi * EARTH_RADIUS_M / 180.0
    y = scale * EARTH_RADIUS_M * jnp.log(
        jnp.tan((90.0 + lat_deg) * jnp.pi / 360.0)
    )
    z = jnp.broadcast_to(jnp.asarray(alt, x.dtype), x.shape)
    return jnp.stack([x, y, z], axis=-1)


def gps_from_mercator(xyz, *, scale):
    """Local metric (..., 3) -> (lat, lon, alt) (ros_utils.cpp:183-194)."""
    xyz = jnp.asarray(xyz)
    lon = xyz[..., 0] / (scale * jnp.pi * EARTH_RADIUS_M / 180.0)
    lat = (
        jnp.arctan(jnp.exp(xyz[..., 1] / (scale * EARTH_RADIUS_M))) * 360.0 / jnp.pi
        - 90.0
    )
    return jnp.stack([lat, lon, xyz[..., 2]], axis=-1)
