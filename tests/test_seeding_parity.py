"""Statistical parity of the vectorized seeder against a sequential
NumPy/scipy reimplementation of the reference's rejection loop
(util/compute.py:134-175) — same masks, same gates, spline lookups like the
reference's RectBivariateSpline(kx=ky=1).  Distribution-level comparison
(SURVEY.md section 7, hard parts: parity is distributional)."""

import jax
import numpy as np
import pytest
from scipy.interpolate import RectBivariateSpline
from scipy.stats import ks_2samp

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import seeding
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack

CFG = Namelist()


def _splines(pack):
    """kx=ky=1 splines over the pack's mask/env grids (reference
    interp2_fx, util/mat.py:142-153)."""
    g = pack.mask_grid
    lon = g.lon_axis()
    lat = g.lat_axis()
    f_run = RectBivariateSpline(lon, lat,
                                np.asarray(pack.run_mask).T, kx=1, ky=1)
    masks = np.asarray(pack.basin_masks)
    f_basins = [RectBivariateSpline(lon, lat, masks[:, :, b].T, kx=1, ky=1)
                for b in range(masks.shape[-1])]
    ga = pack.grid
    vpot = np.asarray(pack.env[..., 1])     # [P, nlat, nlon]
    f_vpot = [RectBivariateSpline(ga.lon_axis(), ga.lat_axis(),
                                  vpot[p].T, kx=1, ky=1)
              for p in range(vpot.shape[0])]
    return f_run, f_basins, f_vpot


def _reference_seed_loop(pack, cfg, n_counted, rng):
    """Sequential reference-style seeding until n_counted seeds count.
    Returns (lats, basins, months, integrated_flags) of counted seeds."""
    f_run, f_basins, f_vpot = _splines(pack)
    b_bounds = (0.0, -90.0, 360.0, 90.0)    # GL
    powers = cfg.lat_vort_power_by_basin()
    lats, basins_out, months, integ = [], [], [], []
    while len(lats) < n_counted:
        lat_min = 3 if np.sign(b_bounds[1]) >= 0 else -45
        lat_max = 45 if np.sign(b_bounds[3]) >= 0 else -3
        y0, y1 = np.sin(np.deg2rad([lat_min, lat_max]))
        lon = rng.uniform(b_bounds[0], b_bounds[2])
        lat = np.rad2deg(np.arcsin(rng.uniform(y0, y1)))
        while f_run.ev(lon, lat) < 1e-2:
            lon = rng.uniform(b_bounds[0], b_bounds[2])
            lat = rng.uniform(b_bounds[1], b_bounds[3])
        month = rng.integers(1, 13)
        basin_val = np.array([f.ev(lon, lat) for f in f_basins])
        b_idx = int(np.argmax(basin_val))
        p_lowlat = min(max((abs(lat) - cfg.lat_vort_fac) / 12.0, 0), 1) \
            ** powers[b_idx]
        if basin_val.max() > 1e-3 and rng.uniform() < p_lowlat:
            lats.append(lat)
            basins_out.append(b_idx)
            months.append(month)
            integ.append(float(f_vpot[month - 1].ev(lon, lat)) > 35.0)
    return (np.array(lats), np.array(basins_out), np.array(months),
            np.array(integ))


def test_seeding_distribution_parity():
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    rng = np.random.default_rng(0)
    ref_lat, ref_basin, ref_month, ref_integ = _reference_seed_loop(
        pack, CFG, 4000, rng)

    props = [seeding.propose_seeds(jax.random.fold_in(jax.random.key(1), i),
                                   pack, CFG, 'GL', 8192) for i in range(3)]
    lat = np.concatenate([np.asarray(p.lat) for p in props])
    counted = np.concatenate([np.asarray(p.counted) for p in props])
    integrate = np.concatenate([np.asarray(p.integrate) for p in props])
    basin_idx = np.concatenate([np.asarray(p.basin_idx) for p in props])

    got_lat = lat[counted]
    assert got_lat.size > 2000

    # (1) genesis-latitude distribution of counted seeds
    ks = ks_2samp(ref_lat, got_lat)
    assert ks.statistic < 0.05, (ks.statistic, ks.pvalue)

    # (2) per-basin composition of counted seeds
    ref_share = np.bincount(ref_basin, minlength=7) / ref_lat.size
    got_share = np.bincount(basin_idx[counted], minlength=7) / got_lat.size
    np.testing.assert_allclose(got_share, ref_share, atol=0.04)

    # (3) PI-gate pass rate among counted seeds
    ref_rate = ref_integ.mean()
    got_rate = integrate[counted].mean()
    assert abs(ref_rate - got_rate) < 0.05, (ref_rate, got_rate)


def _prop_fields(p):
    return {f: np.asarray(getattr(p, f)) for f in p._fields}


def test_retry_compaction_bit_identical():
    """With widths covering every round's unresolved population, the
    retry-compacted seeder is BIT-identical to the full-width one (same
    draws, same tests; only dead-slot gathers are skipped)."""
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    key = jax.random.key(7)
    full = _prop_fields(seeding.propose_seeds(key, pack, CFG, 'GL', 8192))
    # generous geometric schedule (unresolved decays >= 2x/round)
    caps = tuple(max(1.0 / 16, 0.75 * 0.5 ** r) for r in range(15))
    cfg_c = CFG.replace(seed_retry_caps=caps)
    comp = _prop_fields(seeding.propose_seeds(key, pack, cfg_c, 'GL', 8192))
    assert not full['dropped'].any()        # widths covered everything
    for f in full:
        np.testing.assert_array_equal(comp[f], full[f], err_msg=f)


def test_retry_compaction_overflow_drops():
    """Slots evicted from the active set by an undersized width are dropped
    (uniform thinning, visible in the drop counter); every slot that stays
    resolves identically to the full-width path."""
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    key = jax.random.key(8)
    n = 8192
    full = _prop_fields(seeding.propose_seeds(key, pack, CFG, 'GL', n))
    cfg_t = CFG.replace(seed_retry_caps=(1.0 / 32,) * 15)   # 256 slots/round
    tiny = _prop_fields(seeding.propose_seeds(key, pack, cfg_t, 'GL', n))
    # capped drops are a superset of the full path's, and strictly more here
    assert (tiny['dropped'] & ~full['dropped']).sum() > 0
    assert not (full['dropped'] & ~tiny['dropped']).any()
    keep = ~tiny['dropped']
    for f in full:
        np.testing.assert_array_equal(tiny[f][keep], full[f][keep],
                                      err_msg=f)
    # dropped slots never count nor integrate
    assert not tiny['counted'][tiny['dropped']].any()
    assert not tiny['integrate'][tiny['dropped']].any()


def test_auto_seed_retry_caps():
    """The probe-derived schedule is non-increasing, engages on this
    environment, and reproduces the full-width proposals exactly."""
    from tropical_cyclone_risk_tpu.models import pipeline

    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    cfg = pipeline.auto_seed_retry_caps(jax.random.key(3), pack, CFG, 'GL')
    assert cfg.seed_retry_caps is not None
    caps = cfg.seed_retry_caps
    assert len(caps) == seeding.N_RETRY_ROUNDS - 1
    assert all(b <= a for a, b in zip(caps, caps[1:]))
    assert sum(caps) < 0.9 * len(caps)
    key = jax.random.key(9)
    full = _prop_fields(seeding.propose_seeds(key, pack, CFG, 'GL', 8192))
    comp = _prop_fields(seeding.propose_seeds(key, pack, cfg, 'GL', 8192))
    for f in full:
        np.testing.assert_array_equal(comp[f], full[f], err_msg=f)
