"""Spherical geometry ops, batched and jit-safe.

Reference equivalent: util/sphere.py.  All functions operate on arrays of any
shape (the reference versions are scalar/1-D NumPy).
"""

from __future__ import annotations

import jax.numpy as jnp

from tropical_cyclone_risk_tpu import constants


def haversine(lon1, lat1, lon2, lat2):
    """Great-circle distance in km (util/sphere.py:15-30)."""
    lon1 = jnp.deg2rad(lon1)
    lat1 = jnp.deg2rad(lat1)
    lon2 = jnp.deg2rad(lon2)
    lat2 = jnp.deg2rad(lat2)
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = (jnp.square(jnp.sin(dlat / 2)) +
         jnp.cos(lat1) * jnp.cos(lat2) * jnp.square(jnp.sin(dlon / 2)))
    c = 2 * jnp.arcsin(jnp.sqrt(a))
    return (constants.earth_R / 1000.0) * c


def to_sphere_dist(clon, clat, dx, dy):
    """Advance (lon, lat) by Cartesian displacements (m) (util/sphere.py:48-51)."""
    p_lat = clat + (dy / constants.earth_R) * (180.0 / jnp.pi)
    p_lon = clon + ((dx / constants.earth_R) * (180.0 / jnp.pi)
                    / jnp.cos(clat * jnp.pi / 180.0))
    return p_lon, p_lat


def translational_speed(lon, lat, dt_s):
    """Centered-difference storm translation speed in m/s along the last axis,
    with linear extrapolation at the edges (util/sphere.py:58-83).

    lon, lat: [..., T] track positions at spacing dt_s seconds.
    Returns (ut, vt) with shape [..., T].
    """
    if lon.shape[-1] <= 1:
        # single-sample track: no difference exists (util/sphere.py:59-60
        # returns NaN; without the guard the edge-extrapolation slices
        # broadcast to size 0 and the time axis silently vanishes)
        nan = jnp.full(lon.shape, jnp.nan, jnp.result_type(lon, jnp.float32))
        return nan, nan
    e_lon = jnp.concatenate([2 * lon[..., :1] - lon[..., 1:2], lon,
                             2 * lon[..., -1:] - lon[..., -2:-1]], axis=-1)
    e_lat = jnp.concatenate([2 * lat[..., :1] - lat[..., 1:2], lat,
                             2 * lat[..., -1:] - lat[..., -2:-1]], axis=-1)
    dlon = 0.5 * (jnp.sign(e_lon[..., 2:] - e_lon[..., :-2]) *
                  haversine(e_lon[..., 2:], e_lat[..., 1:-1],
                            e_lon[..., :-2], e_lat[..., 1:-1]))
    dlat = 0.5 * (jnp.sign(e_lat[..., 2:] - e_lat[..., :-2]) *
                  haversine(e_lon[..., 1:-1], e_lat[..., 2:],
                            e_lon[..., 1:-1], e_lat[..., :-2]))
    ut = dlon * 1000.0 / dt_s
    vt = dlat * 1000.0 / dt_s
    return ut, vt
