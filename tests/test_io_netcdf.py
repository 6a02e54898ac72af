"""Round-trip and reference-data tests for the minimal NetCDF layer."""

import os

import numpy as np
import pytest

from tropical_cyclone_risk_tpu.io import netcdf

REF_DATA = '/root/reference/intensity/data'


def test_roundtrip_classic(tmp_path):
    fn = str(tmp_path / 'out.nc')
    rng = np.random.default_rng(0)
    tracks = rng.normal(size=(4, 10)).astype(np.float32)
    months = np.array([1, 5, 9, 12], dtype=np.float64)
    basins_arr = np.array(['NA', 'EP', 'WP', 'SI'], dtype='U2')
    netcdf.write(
        fn,
        data_vars={'lon_trks': (('n_trk', 'time'), tracks),
                   'tc_month': (('n_trk',), months),
                   'tc_basins': (('n_trk',), basins_arr)},
        coords={'time': np.arange(10, dtype=np.float64),
                'n_trk': np.arange(4)},
        attrs={'title': 'test'},
        var_attrs={'time': {'units': 'seconds'}})
    ds = netcdf.read(fn)
    np.testing.assert_allclose(ds['lon_trks'].data, tracks)
    np.testing.assert_allclose(ds['tc_month'].data, months)
    assert ds['lon_trks'].dims == ('n_trk', 'time')
    got_basins = ds['tc_basins'].data
    # char matrix decodes back to the basin strings
    joined = [b''.join(row).decode() for row in got_basins]
    assert joined == ['NA', 'EP', 'WP', 'SI']
    assert ds.attrs['title'] == 'test'
    assert ds['time'].attrs['units'] == 'seconds'


@pytest.mark.skipif(not os.path.exists(f'{REF_DATA}/land.nc'),
                    reason='reference data not mounted')
def test_read_reference_hdf5_land():
    ds = netcdf.read(f'{REF_DATA}/land.nc')
    land = ds['land']
    assert land.data.shape == (1440, 2880)
    assert land.dims == ('lat', 'lon')
    assert ds['lon'].data[0] == 0.0
    assert set(np.unique(land.data)) <= {0, 1}


@pytest.mark.skipif(not os.path.exists(f'{REF_DATA}/mld_climatology.nc'),
                    reason='reference data not mounted')
def test_read_reference_hdf5_mld():
    ds = netcdf.read(f'{REF_DATA}/mld_climatology.nc')
    assert ds['mixed_layer'].data.shape == (180, 361, 12)
    assert ds['mixed_layer'].dims == ('lat', 'lon', 'month')
