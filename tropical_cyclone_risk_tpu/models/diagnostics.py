"""Track diagnostics: azimuthal -> maximum wind conversion.

Reference equivalent: wind/tc_wind.py:6-21 (axi_to_max_wind) applied per
track; here batched over [N, T] padded track buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.ops import sphere


def axi_to_max_wind(track_lon, track_lat, dt_track, tc_v, env_wnds):
    """Maximum wind from azimuthal wind + translation + shear asymmetries.

    track_lon/lat/tc_v: [..., T]; env_wnds: [..., T, W] with channel order
    (u250, v250, u850, v850).  NaN positions (dead samples) yield NaN vmax,
    matching the reference's NaN-padded buffers.
    """
    utran, vtran = sphere.translational_speed(track_lon, track_lat, dt_track)
    G = jnp.minimum(1.0, 0.8 + 0.35 * (1.0 + jnp.tanh((track_lat - 35.0) / 10.0)))
    u_shr = env_wnds[..., 0] - env_wnds[..., 2]
    v_shr = env_wnds[..., 1] - env_wnds[..., 3]
    U_inc = G * utran + 0.1 * u_shr * tc_v / 15.0
    V_inc = G * vtran + 0.1 * v_shr * tc_v / 15.0

    mag_inc = jnp.sqrt(U_inc ** 2 + V_inc ** 2)
    mag_fac = jnp.minimum(1.0, (tc_v * 0.50) / mag_inc)
    theta_opt = jnp.arctan2(-U_inc, V_inc)
    ug = tc_v * -jnp.sin(theta_opt) + U_inc * mag_fac
    vg = tc_v * jnp.cos(theta_opt) + V_inc * mag_fac
    return jnp.sqrt(ug ** 2 + vg ** 2)


def vmax_filter(cfg: Namelist, vmax):
    """Lifetime-max filter (util/compute.py:205): keep if nanmax >= threshold."""
    peak = jnp.nanmax(jnp.where(jnp.isnan(vmax), -jnp.inf, vmax), axis=-1)
    return peak >= cfg.seed_vmax_threshold_ms
