"""GCM (CMIP6-style) input path: noleap calendar, Pa pressure levels,
Celsius SST on an ocean grid, GCM variable keys — through the full
preprocessing chain (reference: util/input.py var_keys['GCM'],
thermo/calc_thermo.py unit handling, track/env_wind.py level select)."""

import os

import numpy as np
import pytest

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.io import input as tcin
from tropical_cyclone_risk_tpu.io import netcdf
from tropical_cyclone_risk_tpu.preprocess import thermo_driver, winds

NLON, NLAT = 30, 15
LON = np.arange(0.0, 360.0, 12.0)
LAT = np.linspace(-84.0, 84.0, NLAT)
# CMIP6 plev: Pa, descending (1000 hPa first)
PLEV = np.array([100000.0, 85000.0, 60000.0, 40000.0, 25000.0, 10000.0])


def test_decode_time_noleap():
    # 2015-02-28 + 1 day = 2015-03-01 in a noleap 2016 (no Feb 29)
    units = 'days since 2016-01-01'
    t = tcin.decode_time(np.array([58.0, 59.0, 60.0]), units, 'noleap')
    assert str(t[0])[:10] == '2016-02-28'
    assert str(t[1])[:10] == '2016-03-01'
    assert str(t[2])[:10] == '2016-03-02'
    # fractional days keep time of day
    t2 = tcin.decode_time(np.array([0.5]), units, '365_day')
    assert str(t2[0]) == '2016-01-01T12:00:00'


def _write_gcm(base, year=2016):
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(1)
    LA = LAT[:, None] + 0 * LON[None, :]
    tattrs = {'units': f'days since {year}-01-01', 'calendar': 'noleap'}
    # monthly mid-month timestamps in noleap days
    t_mon = np.cumsum([14.0] + [30.0] * 11)

    # tos: Celsius on a finer ocean grid
    olat = np.linspace(-84.0, 84.0, 29)
    olon = np.arange(0.0, 360.0, 6.0)
    OLA = olat[:, None] + 0 * olon[None, :]
    tos = 28.0 - 26.0 * (OLA / 84.0) ** 2 + np.zeros((12, 29, 60))
    netcdf.write(f'{base}/gcm_tos_Omon.nc',
                 {'tos': (('time', 'lat', 'lon'), tos.astype(np.float32))},
                 coords={'time': t_mon, 'lat': olat, 'lon': olon},
                 var_attrs={'time': tattrs, 'tos': {'units': 'degC'}})
    psl = np.full((12, NLAT, NLON), 101000.0, np.float32)
    netcdf.write(f'{base}/gcm_psl_Amon.nc',
                 {'psl': (('time', 'lat', 'lon'), psl)},
                 coords={'time': t_mon, 'lat': LAT, 'lon': LON},
                 var_attrs={'time': tattrs})
    Tsfc = 300.0 - 24.0 * (LA / 84.0) ** 2
    ta = np.zeros((12, 6, NLAT, NLON), np.float32)
    hus = np.zeros_like(ta)
    for li, p in enumerate(PLEV):
        ta[:, li] = Tsfc * (p / 101000.0) ** 0.19
        hus[:, li] = 0.015 * np.exp(-(101000.0 - p) / 25000.0)
    for nm, arr in (('ta', ta), ('hus', hus)):
        netcdf.write(f'{base}/gcm_{nm}_Amon.nc',
                     {nm: (('time', 'plev', 'lat', 'lon'), arr)},
                     coords={'time': t_mon, 'plev': PLEV,
                             'lat': LAT, 'lon': LON},
                     var_attrs={'time': tattrs, 'plev': {'units': 'Pa'}})
    # daily winds on plev [25000, 85000] over January (noleap)
    t_day = np.arange(31.0)
    ua = rng.normal(-6, 3, (31, 2, NLAT, NLON)).astype(np.float32)
    va = rng.normal(1, 3, (31, 2, NLAT, NLON)).astype(np.float32)
    for nm, arr in (('ua', ua), ('va', va)):
        netcdf.write(f'{base}/gcm_{nm}_day.nc',
                     {nm: (('time', 'plev', 'lat', 'lon'), arr)},
                     coords={'time': t_day,
                             'plev': np.array([25000.0, 85000.0]),
                             'lat': LAT, 'lon': LON},
                     var_attrs={'time': tattrs, 'plev': {'units': 'Pa'}})
    return ua, va


@pytest.fixture(scope='module')
def gcm_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('gcm')
    cfg = Namelist().replace(
        base_directory=str(tmp / 'raw'), output_directory=str(tmp / 'out'),
        dataset_type='GCM', exp_prefix='gcm',
        start_year=2016, start_month=1, end_year=2016, end_month=1)
    os.makedirs(tmp / 'out')
    ua, va = _write_gcm(str(tmp / 'raw'))
    return cfg, ua, va


def test_gcm_wind_stats(gcm_cfg):
    cfg, ua, va = gcm_cfg
    fn = winds.gen_wind_mean_cov(cfg)
    ds = netcdf.read(fn)
    # plev 25000 Pa is the "250" steering level
    got = ds['ua250_Mean'].data
    assert got.shape == (1, NLAT, NLON)
    np.testing.assert_allclose(got[0], ua[:, 0].mean(axis=0), atol=1e-4)
    np.testing.assert_allclose(ds['va850_Var'].data[0],
                               va[:, 1].var(axis=0, ddof=0), rtol=1e-3,
                               atol=1e-4)


def test_gcm_thermo(gcm_cfg):
    cfg, _, _ = gcm_cfg
    fn = thermo_driver.gen_thermo(cfg)
    vmax, chi, rh, lon, lat, times = thermo_driver.read_thermo(fn)
    assert vmax.shape == (1, NLAT, NLON)
    assert tcin.month_of(times).tolist() == [1]
    # degC -> K conversion happened: tropical PI is substantial
    assert np.nanmax(vmax[0, np.abs(LAT) < 25]) > 40.0
    assert np.all((rh >= 0) & (rh <= 1))


def test_noleap_decode_vectorized_scale():
    """45 years of daily noleap timestamps decode correctly (and fast —
    no per-element Python loop; prerequisite for daily CMIP6 ua/va)."""
    import time
    from tropical_cyclone_risk_tpu.io import input as tcin
    days = np.arange(45 * 365, dtype=np.float64)      # days since 1979-01-01
    t0 = time.time()
    out = tcin.decode_time(days, 'days since 1979-1-1', 'noleap')
    elapsed = time.time() - t0
    assert elapsed < 0.5, f'noleap decode too slow: {elapsed:.2f}s'
    assert out[0] == np.datetime64('1979-01-01', 's')
    assert out[31] == np.datetime64('1979-02-01', 's')
    assert out[365] == np.datetime64('1980-01-01', 's')   # no leap day
    # day 59 of a noleap year is March 1 even in Gregorian leap year 1980
    assert out[365 + 59] == np.datetime64('1980-03-01', 's')
    assert out[-1] == np.datetime64('2023-12-31', 's')
    # sub-daily offsets survive
    out2 = tcin.decode_time(np.array([0.5, 400.25]), 'days since 2000-1-1',
                            '365_day')
    assert out2[0] == np.datetime64('2000-01-01T12:00:00', 's')
    assert out2[1] == np.datetime64('2001-02-05T06:00:00', 's')
