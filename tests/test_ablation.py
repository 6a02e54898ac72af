"""Intensity-dependent steering ablation (reference namelist.py:73-74
``coupled_track`` + intensity/coupled_fast.py:183-192; the Lin et al. 2023
headline config).  With ``coupled_track`` on, intensifying storms weight the
250-hPa flow more (alpha250 = y + m*v[kts] rises, alpha850 falls); with it
off, the constant (0.2, 0.8) weights apply at every intensity.

The directional effect is pinned with a controlled environment where the two
steering levels oppose (u250 = +8, u850 = -8 m/s, zero mean meridional flow,
near-zero covariance): intense coupled storms must drift LESS westward than
uncoupled ones, because the upper-level westerlies cancel more of the
low-level easterly steering as alpha250 grows."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import fast, simulator
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.ops import fourier


def _controlled_pack(cfg):
    """synthetic_pack with the wind statistics replaced by a uniform
    two-level opposed flow and near-zero covariance."""
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0)
    from tropical_cyclone_risk_tpu.models import fields as F
    # kill ventilation (chi -> floor) so the 16 m/s deep-layer shear of the
    # opposed steering flow does not suppress intensification
    env = np.array(pack.env)
    env[..., F.CHI] = 1e-5
    pack = pack._replace(env=jnp.asarray(env))
    W = cfg.n_wind_levels
    wind = np.array(pack.wind)
    wind[..., :W] = 0.0
    wind[..., 0] = 8.0      # u250
    wind[..., 2] = -8.0     # u850
    n_tri = W * (W + 1) // 2
    wind[..., W:] = 0.0
    k = 0
    for i in range(W):
        for j in range(i + 1):
            if i == j:
                wind[..., W + k] = 1e-4   # tiny diagonal, PD
            k += 1
    return pack._replace(wind=jnp.asarray(wind))


def _zonal_displacement(cfg, key):
    pack = _controlled_pack(cfg)
    N = 64
    lon0 = jnp.linspace(150.0, 230.0, N)
    lat0 = jnp.full((N,), 15.0)
    y0 = fast.State(lon=lon0, lat=lat0, v=jnp.full((N,), 20.0),
                    m=jnp.full((N,), 0.7))
    params = fast.SeedParams(
        plane=jnp.full((N,), 7, jnp.int32),
        h_bl=jnp.full((N,), float(cfg.atm_bl_depth_dict['WP'])),
        fourier=fourier.draw_fourier(key, (N, cfg.n_wind_levels),
                                     cfg.T_fourier_s))
    out = simulator.integrate(pack, cfg, 'GL', y0, params,
                              jnp.ones((N,), bool))
    lon = np.asarray(out.lon)
    last = np.asarray(out.last_step)
    lon_end = lon[np.arange(N), last]
    v_peak = np.nanmax(np.asarray(out.v), axis=1)
    ok = np.isfinite(lon_end) & (v_peak >= 30.0)
    assert ok.sum() >= N // 2, 'environment must intensify most storms'
    return (lon_end - np.asarray(lon0))[ok], v_peak[ok]


def test_coupled_steering_reduces_westward_drift():
    key = jax.random.key(42)
    cfg_on = Namelist()
    assert cfg_on.coupled_track
    cfg_off = cfg_on.replace(coupled_track=False)

    dlon_on, vp_on = _zonal_displacement(cfg_on, key)
    dlon_off, vp_off = _zonal_displacement(cfg_off, key)

    # storms intensify in both configs
    assert np.median(vp_on) >= 40.0 and np.median(vp_off) >= 40.0
    # both drift westward on net (easterly low-level steering dominates)
    assert np.mean(dlon_off) < 0.0
    # intensity-dependent steering shifts weight to the +8 m/s upper flow:
    # clearly less westward drift than the constant (0.2, 0.8) weights
    assert np.mean(dlon_on) > np.mean(dlon_off) + 2.0


def test_steering_coefs_clip_and_limits():
    """alpha_i(v) = y_alpha + m_alpha * v[kts], clipped to
    [alpha_min, alpha_max] (coupled_fast.py:183-192)."""
    cfg = Namelist()
    v = jnp.asarray([0.0, 25.72, 200.0])   # 0 / 50 kts / above clip
    a = np.asarray(fast.steering_coefs(cfg, v))
    np.testing.assert_allclose(a[0], np.clip(cfg.y_alpha, cfg.alpha_min,
                                             cfg.alpha_max), rtol=1e-6)
    kts = 25.72 * fast.MS_TO_KTS
    np.testing.assert_allclose(
        a[1], np.clip(np.asarray(cfg.y_alpha) + kts * np.asarray(cfg.m_alpha),
                      cfg.alpha_min, cfg.alpha_max), rtol=1e-5)
    np.testing.assert_allclose(a[2, 0], cfg.alpha_max[0], rtol=1e-6)
    np.testing.assert_allclose(a[2, 1], cfg.alpha_min[1], rtol=1e-6)
    # uncoupled: constant weights at every intensity
    off = np.asarray(fast.steering_coefs(cfg.replace(coupled_track=False), v))
    np.testing.assert_allclose(off, np.tile(cfg.steering_coefs, (3, 1)))
