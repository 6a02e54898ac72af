"""Generate a synthetic CMIP6 (GFDL-CM4 ssp585-style) raw workspace for
GCM-forced end-to-end runs without network access.

Conventions mirror the real ESGF files the reference downloads
(scripts/download_cmip6.py:17-34, scripts/GFDL-CM4/wget_*.sh; variable keys
util/input.py:111-133): noleap calendar, plev in Pa (descending), daily
ua/va on [25000, 85000] Pa, Amon ta/hus/psl, Omon tos in degC on a finer
ocean grid, CMIP6 filename schema {var}_{table}_GFDL-CM4_ssp585_r1i1p1f1.

Usage: python tools/make_synthetic_cmip6.py WORKDIR [Y0 Y1] [--coarse]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tropical_cyclone_risk_tpu.io import netcdf  # noqa: E402

PLEV_AMON = np.array([100000.0, 85000.0, 60000.0, 40000.0, 25000.0,
                      10000.0])
PLEV_DAY = np.array([25000.0, 85000.0])
TAG = 'GFDL-CM4_ssp585_r1i1p1f1_gr1'


def grids(coarse):
    step = 4.0 if coarse else 1.0
    lon = np.arange(0.0, 360.0, step)
    lat = np.arange(-90.0, 90.0 + step / 2, step)
    return lon, lat


def land_2d(lon, lat):
    LO, LA = np.meshgrid(lon, lat)
    return ((np.abs(LA) > 70) | ((LO > 265) & (LO < 310) & (LA > -55) &
                                 (LA < 60)) |
            ((LO > 10) & (LO < 50) & (LA > -35) & (LA < 35))
            ).astype(np.float32)


def noleap_midmonths(year, epoch_year):
    """Mid-month day offsets (noleap) from Jan 1 of epoch_year."""
    days = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
    cum = np.concatenate([[0], np.cumsum(days)[:-1]])
    return (year - epoch_year) * 365.0 + cum + 14.0


def write_year(base, year, rng, lon, lat, epoch_year):
    nlat, nlon = lat.size, lon.size
    land = land_2d(lon, lat)
    LA = lat[:, None] + 0 * lon[None, :]
    tattrs = {'units': f'days since {epoch_year}-01-01',
              'calendar': 'noleap'}
    t_mon = noleap_midmonths(year, epoch_year)
    rng_tag = f'{year}0101-{year}1231'

    seasonal = np.cos(2 * np.pi * (np.arange(12)[:, None, None] - 7.5) / 12)
    warm = 0.015 * (year - 2030)
    sst_c = (29.0 + warm - 30.0 * (LA / 90.0) ** 2 + 1.5 * seasonal
             + 0.3 * rng.standard_normal((12, nlat, nlon))).astype(np.float32)
    # tos on a finer ocean grid (degC, NaN over land) like the real Omon file
    olon = np.arange(0.0, 360.0, 360.0 / (2 * nlon))
    olat = np.linspace(lat[0], lat[-1], 2 * nlat - 1)
    from scipy.interpolate import RegularGridInterpolator
    tos = np.empty((12, olat.size, olon.size), np.float32)
    pts = np.stack(np.meshgrid(olat, np.minimum(olon, lon.max()),
                               indexing='ij'), -1)
    for i in range(12):
        f = RegularGridInterpolator((lat, lon), sst_c[i], bounds_error=False,
                                    fill_value=None)
        tos[i] = f(pts.reshape(-1, 2)).reshape(olat.size, olon.size)
    oland = land_2d(olon, olat)
    tos = np.where(oland[None] > 0, np.nan, tos)
    netcdf.write(f'{base}/tos_Omon_{TAG}_{rng_tag}.nc',
                 {'tos': (('time', 'lat', 'lon'), tos)},
                 coords={'time': t_mon, 'lat': olat, 'lon': olon},
                 var_attrs={'time': tattrs, 'tos': {'units': 'degC'}})

    psl = np.full((12, nlat, nlon), 101000.0, np.float32)
    netcdf.write(f'{base}/psl_Amon_{TAG}_{rng_tag}.nc',
                 {'psl': (('time', 'lat', 'lon'), psl)},
                 coords={'time': t_mon, 'lat': lat, 'lon': lon},
                 var_attrs={'time': tattrs, 'psl': {'units': 'Pa'}})

    Tsfc = (sst_c + 273.15 - 1.0).astype(np.float32)
    Tsfc = np.nan_to_num(Tsfc, nan=285.0)
    ta = np.zeros((12, PLEV_AMON.size, nlat, nlon), np.float32)
    hus = np.zeros_like(ta)
    for li, p in enumerate(PLEV_AMON):
        ta[:, li] = Tsfc * (p / 101000.0) ** 0.19
        hus[:, li] = (0.016 * np.exp(-(101000.0 - p) / 25000.0)
                      * np.clip((Tsfc - 260.0) / 40.0, 0.05, 1.2))
    for nm, arr in (('ta', ta), ('hus', hus)):
        netcdf.write(f'{base}/{nm}_Amon_{TAG}_{rng_tag}.nc',
                     {nm: (('time', 'plev', 'lat', 'lon'), arr)},
                     coords={'time': t_mon, 'plev': PLEV_AMON,
                             'lat': lat, 'lon': lon},
                     var_attrs={'time': tattrs, 'plev': {'units': 'Pa'}})

    # daily winds (noleap: 365 days), AR(1) synoptic noise over jets
    nt = 365
    t_day = (year - epoch_year) * 365.0 + np.arange(nt) + 0.5
    base_u = {25000.0: -8.0 + 20.0 * np.sin(np.deg2rad(LA)) ** 2,
              85000.0: -5.0 + 6.0 * np.sin(np.deg2rad(LA)) ** 2}
    for nm in ('ua', 'va'):
        arr = np.empty((nt, 2, nlat, nlon), np.float32)
        noise = rng.standard_normal((2, nlat, nlon)).astype(np.float32) * 3
        for it in range(nt):
            season = np.cos(2 * np.pi * (it / 365.0 - 0.6))
            noise = 0.9 * noise + 0.44 * rng.standard_normal(
                (2, nlat, nlon)).astype(np.float32) * 3
            for lv, p in enumerate(PLEV_DAY):
                b = base_u[p] if nm == 'ua' else 0.0
                arr[it, lv] = b + 2.0 * season + noise[lv]
        netcdf.write(f'{base}/{nm}_day_{TAG}_{rng_tag}.nc',
                     {nm: (('time', 'plev', 'lat', 'lon'), arr)},
                     coords={'time': t_day, 'plev': PLEV_DAY,
                             'lat': lat, 'lon': lon},
                     var_attrs={'time': tattrs, 'plev': {'units': 'Pa'}})


def write_static(ws, lon, lat):
    land = land_2d(lon, lat)
    os.makedirs(f'{ws}/static', exist_ok=True)
    netcdf.write(f'{ws}/static/land.nc', {'land': (('lat', 'lon'), land)},
                 coords={'lat': lat, 'lon': lon})
    nlat, nlon = lat.size, lon.size
    mld = np.where(land[:, :, None] > 0, np.nan,
                   40.0 + 20.0 * np.cos(np.deg2rad(lat))[:, None, None]
                   * np.ones((nlat, nlon, 12))).astype(np.float32)
    strat = np.where(land[:, :, None] > 0, np.nan,
                     np.full((nlat, nlon, 12), 5.0)).astype(np.float32)
    netcdf.write(f'{ws}/static/mld.nc',
                 {'mld': (('lat', 'lon', 'month'), mld)},
                 coords={'lat': lat, 'lon': lon,
                         'month': np.arange(1.0, 13.0)})
    netcdf.write(f'{ws}/static/strat.nc',
                 {'strat': (('lat', 'lon', 'month'), strat)},
                 coords={'lat': lat, 'lon': lon,
                         'month': np.arange(1.0, 13.0)})


def build(ws, y0=2030, y1=2031, coarse=False, seed=0):
    lon, lat = grids(coarse)
    os.makedirs(f'{ws}/raw', exist_ok=True)
    os.makedirs(f'{ws}/out', exist_ok=True)
    rng = np.random.default_rng(seed)
    write_static(ws, lon, lat)
    for year in range(y0, y1 + 1):
        write_year(f'{ws}/raw', year, rng, lon, lat, epoch_year=y0)
        print('wrote', year, flush=True)
    with open(f'{ws}/namelist.py', 'w') as f:
        f.write(f"""
base_directory = {ws + '/raw'!r}
output_directory = {ws + '/out'!r}
exp_name = 'proj'
exp_prefix = 'ssp585'
dataset_type = 'GCM'
start_year = {y0}
start_month = 1
end_year = {y1}
end_month = 12
tracks_per_year = 14
fn_land = {ws + '/static/land.nc'!r}
fn_bathy = {ws + '/static/bathymetry.nc'!r}
fn_mld = {ws + '/static/mld.nc'!r}
fn_strat = {ws + '/static/strat.nc'!r}
mask_dir = {ws + '/land'!r}
seed_batch = 16384
""")
    print('workspace ready:', ws)


def main():
    ws = sys.argv[1]
    args = [a for a in sys.argv[2:] if not a.startswith('--')]
    y0 = int(args[0]) if args else 2030
    y1 = int(args[1]) if len(args) > 1 else 2031
    build(ws, y0, y1, coarse='--coarse' in sys.argv)


if __name__ == '__main__':
    main()
