"""Unit tests for geometry, basins, and the bilinear gather engine."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RectBivariateSpline

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.ops import interp, sphere
from tropical_cyclone_risk_tpu.utils import basins

CFG = Namelist()


# ----------------------------- sphere -----------------------------

def _haversine_np(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = map(np.deg2rad, (lon1, lat1, lon2, lat2))
    a = (np.sin((lat2 - lat1) / 2) ** 2 +
         np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2)
    return 6.3781e3 * 2 * np.arcsin(np.sqrt(a))


def test_haversine_matches_reference_formula():
    rng = np.random.default_rng(0)
    lon1, lon2 = rng.uniform(0, 360, (2, 100))
    lat1, lat2 = rng.uniform(-80, 80, (2, 100))
    got = np.asarray(sphere.haversine(lon1, lat1, lon2, lat2))
    want = _haversine_np(lon1, lat1, lon2, lat2)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_haversine_equator_degree():
    # 1 degree along the equator ~ 111.3 km for R=6378.1 km
    km = float(sphere.haversine(10.0, 0.0, 11.0, 0.0))
    assert abs(km - 2 * np.pi * 6378.1 / 360) < 0.1


def test_translational_speed_constant_motion():
    # storm moving due east at constant dlon/dt near the equator
    t = np.arange(20)
    lon = 100.0 + 0.1 * t
    lat = np.zeros_like(lon)
    ut, vt = sphere.translational_speed(jnp.asarray(lon), jnp.asarray(lat), 3600.0)
    expect_u = 0.1 * 2 * np.pi * 6.3781e6 / 360 / 3600
    np.testing.assert_allclose(np.asarray(ut), expect_u, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(vt), 0.0, atol=1e-6)


# ----------------------------- basins -----------------------------

def test_basin_bounds_parse():
    assert basins.basin_bounds(CFG, 'NA') == (260.0, 0.0, 360.0, 60.0)
    assert basins.basin_bounds(CFG, 'SI') == (20.0, -45.0, 100.0, 0.0)
    assert basins.basin_bounds(CFG, 'GL') == (0.0, -90.0, 360.0, 90.0)


def test_in_basin_margin():
    b = basins.basin_bounds(CFG, 'NA')
    assert bool(basins.in_basin(300.0, 30.0, b, 1.0))
    assert not bool(basins.in_basin(260.5, 30.0, b, 1.0))   # within margin
    assert not bool(basins.in_basin(100.0, 30.0, b, 1.0))


def test_invalid_basin_raises():
    with pytest.raises(ValueError):
        basins.basin_bounds(CFG, 'XX')


def test_roll_field_to_0360():
    lon = np.array([-180., -90., 0., 90.])
    field = np.arange(8, dtype=float).reshape(2, 4)
    lon2, f2 = basins.roll_field_to_0360(lon, field)
    np.testing.assert_array_equal(lon2, [0., 90., 180., 270.])
    np.testing.assert_array_equal(f2, field[:, [2, 3, 0, 1]])


# ----------------------------- interp -----------------------------

def test_bilinear_matches_scipy_interior_and_extrapolation():
    rng = np.random.default_rng(1)
    lon = np.arange(0, 360, 2.0)
    lat = np.arange(-88, 90, 2.0)
    field = rng.normal(size=(lat.size, lon.size))
    spl = RectBivariateSpline(lon, lat, field.T, kx=1, ky=1)

    grid = interp.UniformGrid.from_axes(lon, lat)
    qlon = rng.uniform(-3, 362, 500)          # includes extrapolation region
    qlat = rng.uniform(-92, 92, 500)
    got = np.asarray(interp.bilinear_scalar(
        jnp.asarray(field, jnp.float64 if jnp.float64.dtype == jnp.zeros(1).dtype else jnp.float32),
        grid, jnp.asarray(qlon), jnp.asarray(qlat)))
    want = spl.ev(qlon, qlat)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bilinear_multichannel_and_planes():
    rng = np.random.default_rng(2)
    lon = np.arange(0, 360, 4.0)
    lat = np.arange(-88, 90, 4.0)
    field = rng.normal(size=(3, lat.size, lon.size, 5)).astype(np.float32)
    grid = interp.UniformGrid.from_axes(lon, lat)
    qlon = rng.uniform(10, 350, 64)
    qlat = rng.uniform(-80, 80, 64)
    plane = rng.integers(0, 3, 64)
    got = np.asarray(interp.bilinear(jnp.asarray(field), grid,
                                     jnp.asarray(qlon), jnp.asarray(qlat),
                                     jnp.asarray(plane)))
    for c in range(5):
        for p in range(3):
            spl = RectBivariateSpline(lon, lat, field[p, :, :, c].T, kx=1, ky=1)
            m = plane == p
            np.testing.assert_allclose(got[m, c], spl.ev(qlon[m], qlat[m]),
                                       rtol=1e-4, atol=1e-5)


def test_regrid_identity():
    rng = np.random.default_rng(3)
    lon = np.arange(0, 360, 4.0)
    lat = np.arange(-88, 90, 4.0)
    field = rng.normal(size=(lat.size, lon.size)).astype(np.float32)
    out = np.asarray(interp.regrid(field, lon, lat, lon, lat))
    np.testing.assert_allclose(out, field, rtol=1e-5, atol=1e-6)


def test_nearest_psd():
    from tropical_cyclone_risk_tpu.ops import chol
    rng = np.random.default_rng(2)
    M = rng.normal(size=(5, 4, 4))
    sym = 0.5 * (M + np.swapaxes(M, -1, -2))        # indefinite
    fixed = np.asarray(chol.nearest_psd(jnp.asarray(sym)))
    w = np.linalg.eigvalsh(fixed)
    # float32 reconstruction: eigenvalues nonnegative up to roundoff
    assert np.all(w >= -1e-5 * np.abs(w).max())
    # already-PSD matrices pass through unchanged
    psd = M @ np.swapaxes(M, -1, -2) + 0.1 * np.eye(4)
    out = np.asarray(chol.nearest_psd(jnp.asarray(psd)))
    np.testing.assert_allclose(out, psd, rtol=1e-4, atol=1e-5)


def test_bilinear_packed_matches_bilinear():
    from tropical_cyclone_risk_tpu.ops import interp
    rng = np.random.default_rng(5)
    field = jnp.asarray(rng.normal(size=(3, 19, 36, 7)).astype(np.float32))
    grid = interp.UniformGrid(0.0, 10.0, 36, -90.0, 10.0, 19)
    lon = jnp.asarray(rng.uniform(-20, 380, 500), jnp.float32)  # incl. edges
    lat = jnp.asarray(rng.uniform(-100, 100, 500), jnp.float32)
    plane = jnp.asarray(rng.integers(0, 3, 500), jnp.int32)
    want = interp.bilinear(field, grid, lon, lat, plane)
    got = interp.bilinear_packed(interp.pack_corners(field), grid,
                                 lon, lat, plane)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # unstacked variant
    want2 = interp.bilinear(field[1], grid, lon, lat)
    got2 = interp.bilinear_packed(interp.pack_corners(field[1]), grid,
                                  lon, lat)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-6, atol=1e-6)


def test_vmax_finite_at_final_valid_sample():
    """axi_to_max_wind must give a finite vmax at each track's last valid
    sample (reference edge extrapolation, util/sphere.py:66-69), with NaN
    only beyond death."""
    from tropical_cyclone_risk_tpu.models import diagnostics
    T = 20
    lon = np.full((1, T), np.nan, np.float32)
    lat = np.full((1, T), np.nan, np.float32)
    v = np.full((1, T), np.nan, np.float32)
    wnds = np.full((1, T, 4), np.nan, np.float32)
    k = 7                                  # valid samples 0..7
    lon[0, :k + 1] = 150.0 + 0.2 * np.arange(k + 1)
    lat[0, :k + 1] = 15.0 + 0.1 * np.arange(k + 1)
    v[0, :k + 1] = 20.0
    wnds[0, :k + 1] = 3.0
    vmax = np.asarray(diagnostics.axi_to_max_wind(
        jnp.asarray(lon), jnp.asarray(lat), 3600.0,
        jnp.asarray(v), jnp.asarray(wnds)))
    assert np.all(np.isfinite(vmax[0, :k + 1]))
    assert np.all(np.isnan(vmax[0, k + 1:]))


def test_obs_metrics_and_phase():
    from tropical_cyclone_risk_tpu.utils import obs
    m = obs.Metrics()
    m.count('seeds', 100)
    m.count('seeds', 50)
    with obs.phase('work', m):
        pass
    assert m.counters['seeds'] == 150
    assert 'work' in m.timings and m.timings['work'] >= 0
    m.time('simulate', 3.0)
    assert m.rate('seeds', 'simulate') == 50.0
    assert m.rate('seeds', 'missing') == 0.0
    s = m.summary()
    assert s['seeds'] == 150 and 'simulate_s' in s


def test_inv_trans_sampling_and_nc_valid(tmp_path):
    from tropical_cyclone_risk_tpu.utils import util as u
    rng = np.random.default_rng(0)
    data = rng.normal(10.0, 2.0, 5000)
    samples = u.inv_trans_sampling(data, n_samples=5000,
                                   rng=np.random.default_rng(1))
    assert abs(samples.mean() - 10.0) < 0.2
    assert abs(samples.std() - 2.0) < 0.3
    assert not u.is_nc_file_valid(str(tmp_path / 'nope.nc'))
    bad = tmp_path / 'bad.nc'
    bad.write_bytes(b'not netcdf')
    assert not u.is_nc_file_valid(str(bad))


def test_translational_speed_single_sample():
    """Length-1 tracks return NaN (util/sphere.py:59-60), not empty arrays
    that would silently drop the time axis downstream."""
    from tropical_cyclone_risk_tpu.ops import sphere
    ut, vt = sphere.translational_speed(jnp.ones((5, 1)), jnp.ones((5, 1)),
                                        3600.0)
    assert ut.shape == vt.shape == (5, 1)
    assert np.all(np.isnan(np.asarray(ut))) and np.all(np.isnan(np.asarray(vt)))


def test_bilinear_rejects_spurious_plane_idx():
    """A plane_idx given with an unstacked (3-D) field is a caller bug —
    it would silently serve one plane for every query month."""
    field = jnp.zeros((5, 7, 2))
    grid = interp.UniformGrid(lon0=0.0, dlon=1.0, nlon=7,
                              lat0=0.0, dlat=1.0, nlat=5)
    with pytest.raises(ValueError, match='no plane axis'):
        interp.bilinear(field, grid, jnp.zeros(3), jnp.zeros(3),
                        plane_idx=jnp.zeros(3, jnp.int32))


def test_stable_partition_order_matches_argsort():
    """The cumsum+scatter partition order is bit-identical to the argsort
    idiom it replaced across mask densities, including all-True/all-False
    (ops/compact.py; the argsort keys are distinct so the sort is unique)."""
    from tropical_cyclone_risk_tpu.ops import compact

    rng = np.random.default_rng(7)
    n = 4096
    for p in (0.0, 0.02, 0.3, 0.97, 1.0):
        mask = jnp.asarray(rng.random(n) < p)
        slot = jnp.arange(n)
        ref = jnp.argsort(jnp.where(mask, slot, slot + n))
        for w in (None, 1, 256, n):
            got = compact.stable_partition_order(mask, w)
            want = ref if w is None else ref[:w]
            assert np.array_equal(np.asarray(got), np.asarray(want)), (p, w)
