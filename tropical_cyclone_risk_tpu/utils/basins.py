"""Basin abstraction as pure functions on a canonical 0-360 longitude grid.

Reference equivalent: util/basins.py (class TC_Basin).  The reference keeps a
dual longitude convention (0-360 vs +/-180) and rotates fields between them
(util/basins.py:57-107); all default basin bounds are expressible in 0-360, so
this framework standardizes on 0-360 everywhere and the rotation machinery
disappears.  Bounds tests are jit-compatible (pure jnp), so they can run
inside the integration scan as termination masks.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist


def parse_bound(bound: str) -> float:
    """Parse '260E' / '45S' style bound strings (util/basins.py:23-27)."""
    xd = float(bound[:-1])
    if bound[-1] in ('W', 'S'):
        xd *= -1
    return xd


def basin_bounds(cfg: Namelist, basin_id: str) -> Tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) for a basin (util/basins.py:42-50)."""
    bid = basin_id.upper()
    bounds = cfg.basin_bounds_dict.get(bid)
    if bounds is None:
        raise ValueError(f'Basin ID {basin_id!r} is not valid. '
                         f'Valid: {sorted(cfg.basin_bounds_dict)}')
    b0, b1, b2, b3 = bounds
    return (parse_bound(b0), parse_bound(b1), parse_bound(b2), parse_bound(b3))


def in_basin(lon, lat, bounds: Tuple[float, float, float, float], dx: float):
    """True where (lon, lat) is strictly inside the basin shrunk by dx degrees
    (util/basins.py:32-37).  Vectorized / jit-safe."""
    lon_min, lat_min, lon_max, lat_max = bounds
    return ((lon > (lon_min + dx)) & (lon < (lon_max - dx)) &
            (lat > (lat_min + dx)) & (lat < (lat_max - dx)))


def validate_basin_id(cfg: Namelist, basin_id: str) -> str:
    bid = basin_id.upper()
    if bid not in cfg.basin_bounds_dict:
        raise ValueError(f'Basin ID {basin_id!r} is not valid. '
                         f'Valid: {sorted(cfg.basin_bounds_dict)}')
    return bid


def to_0360(lon):
    """Map longitudes into [0, 360)."""
    if isinstance(lon, np.ndarray) or np.isscalar(lon):
        return np.mod(lon, 360.0)
    return jnp.mod(lon, 360.0)


def roll_field_to_0360(lon: np.ndarray, field: np.ndarray):
    """Reorder a [..., lon]-last field whose longitudes may be in +/-180
    convention into ascending 0-360 (reference transform_lon_r,
    util/basins.py:103-107).  Host-side (numpy), used at ingestion only."""
    lon = np.asarray(lon)
    lon0360 = np.mod(lon, 360.0)
    order = np.argsort(lon0360, kind='stable')
    return lon0360[order], np.take(field, order, axis=-1)
