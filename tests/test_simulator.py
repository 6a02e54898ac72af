"""Simulation-core tests: Fourier synthesis, Cholesky, RHS integration vs
scipy's adaptive solver, termination masks, and seeding statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import fast, fields, seeding, simulator
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.ops import chol, fourier

CFG = Namelist(rk_substeps=1)


# ----------------------------- fourier -----------------------------

def test_fourier_matches_direct_sum():
    key = jax.random.key(0)
    T = 20 * 86400.0
    fs = fourier.draw_fourier(key, (3, 4), T, dtype=jnp.float64
                              if jax.config.jax_enable_x64 else jnp.float32)
    # reconstruct phases from A, B and evaluate the reference form directly
    A = np.asarray(fs.A)
    B = np.asarray(fs.B)
    n = np.arange(1, fourier.N_FOURIER + 1)
    c = np.sqrt(2 / np.sum(n ** -3.0)) * n ** -1.5
    phi = np.arctan2(B / c, A / c) / (2 * np.pi)    # recovered phases
    for t in (0.0, 3600.0, 86400.0 * 3, 86400.0 * 15):
        got = np.asarray(fs.evaluate(jnp.asarray(t)))
        want = np.sum(c * np.sin(2 * np.pi * (n * t / T + phi)), axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_fourier_statistics():
    # F has zero mean and unit-ish variance by construction (normalization
    # sqrt(2/sum n^-3) makes E[F^2] = 1)
    key = jax.random.key(1)
    fs = fourier.draw_fourier(key, (2000, 1), 20 * 86400.0)
    t = jnp.linspace(0.0, 15 * 86400.0, 50)
    vals = np.asarray(fs.evaluate(t))    # [2000, 1, 50]
    assert abs(vals.mean()) < 0.02
    assert abs(vals.var() - 1.0) < 0.05


# ----------------------------- cholesky -----------------------------

def test_cholesky_unrolled_matches_numpy():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(64, 4, 4))
    cov = M @ np.swapaxes(M, -1, -2) + 0.1 * np.eye(4)
    L, ok = chol.cholesky_unrolled(jnp.asarray(cov, jnp.float32))
    assert bool(jnp.all(ok))
    want = np.linalg.cholesky(cov)
    np.testing.assert_allclose(np.asarray(L), want, rtol=2e-3, atol=2e-3)


def test_cholesky_detects_non_pd():
    cov = np.eye(4)[None].repeat(3, axis=0)
    cov[1, 3, 3] = -1.0                        # negative pivot
    cov[2] = np.ones((4, 4))                   # singular (rank 1): pivot 0
    L, ok = chol.cholesky_unrolled(jnp.asarray(cov, jnp.float32))
    assert bool(ok[0]) and not bool(ok[1]) and not bool(ok[2])


def test_lower_tri_roundtrip():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(5, 4, 4))
    cov = M @ np.swapaxes(M, -1, -2)
    # pack in reference order (i, then j <= i)
    tri = np.stack([cov[:, i, j] for i in range(4) for j in range(i + 1)],
                   axis=-1)
    full = np.asarray(chol.lower_tri_to_full(jnp.asarray(tri), 4))
    np.testing.assert_allclose(full, cov, rtol=1e-6)


# ----------------------------- integration -----------------------------

def _setup_batch(n=4, v0=12.0, m0=0.4):
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    key = jax.random.key(42)
    fs = fourier.draw_fourier(key, (n, CFG.n_wind_levels), CFG.T_fourier_s)
    params = fast.SeedParams(
        plane=jnp.full((n,), 7, jnp.int32),           # August
        h_bl=jnp.full((n,), 1400.0, jnp.float32),
        fourier=fs)
    lon0 = jnp.asarray(np.linspace(150.0, 210.0, n), jnp.float32)
    lat0 = jnp.asarray(np.linspace(10.0, 18.0, n), jnp.float32)
    y0 = fast.State(lon0, lat0, jnp.full((n,), v0, jnp.float32),
                    jnp.full((n,), m0, jnp.float32))
    return pack, params, y0


def test_integrate_runs_and_intensifies():
    pack, params, y0 = _setup_batch()
    out = simulator.integrate(pack, CFG, 'GL', y0, params,
                              jnp.ones(4, bool))
    v = np.asarray(out.v)
    assert v.shape == (4, CFG.n_steps_output)
    assert np.all(np.asarray(out.alive[:, 0]))
    # warm synthetic ocean with ~70 m/s PI: storms should intensify
    assert np.nanmax(v) > 25.0
    # NaN after death, finite while alive
    alive = np.asarray(out.alive)
    assert np.all(np.isfinite(v[alive]))
    assert np.all(np.isnan(v[~alive]))


def test_integrate_matches_solve_ivp():
    """Fixed-step RK4 at the output interval vs scipy RK45 (tight tolerance)
    on the identical RHS: the step-size-sufficiency check demanded by
    SURVEY.md section 7 (the reference allows max_step=86400 s)."""
    pack, params, y0 = _setup_batch(n=2)
    cfg_exact = CFG.replace(rk_exact_stage_fields=True)
    out = simulator.integrate(pack, cfg_exact, 'GL', y0, params,
                              jnp.ones(2, bool))

    stacks = fields.build_stacks(pack)
    rhs_jit = jax.jit(lambda t, y: fast.rhs(stacks, CFG, t, y, params))

    def rhs_np(t, yflat):
        y = fast.State(*(jnp.asarray(yflat.reshape(4, 2), jnp.float32)))
        d, _ = rhs_jit(jnp.float32(t), y)
        return np.asarray(jnp.stack(d)).ravel()

    T = CFG.total_track_time_s
    t_eval = np.arange(0, T + 1, CFG.output_interval_s, dtype=float)
    y0flat = np.asarray(jnp.stack(y0)).ravel()
    res = solve_ivp(rhs_np, (0, T), y0flat, t_eval=t_eval,
                    rtol=1e-6, atol=1e-6, max_step=86400)
    ref = res.y.reshape(4, 2, -1)     # (state, seed, time)

    alive = np.asarray(out.alive)
    for s in range(2):
        m = alive[s]
        np.testing.assert_allclose(np.asarray(out.lon)[s][m],
                                   ref[0, s, m], atol=0.15)
        np.testing.assert_allclose(np.asarray(out.lat)[s][m],
                                   ref[1, s, m], atol=0.15)
        np.testing.assert_allclose(np.asarray(out.v)[s][m],
                                   ref[2, s, m], atol=0.6)
        np.testing.assert_allclose(np.asarray(out.m)[s][m],
                                   ref[3, s, m], atol=0.02)


def test_frozen_field_step_accuracy():
    """Default once-per-step field sampling vs exact per-stage sampling:
    trajectories agree far inside physical noise over the full 15 days."""
    pack, params, y0 = _setup_batch(n=4)
    # stride pinned to 1: this test bounds the once-per-STEP approximation
    # alone (the strided generalization has its own bounds below)
    out_frozen = simulator.integrate(
        pack, CFG.replace(field_sample_stride=1), 'GL', y0, params,
        jnp.ones(4, bool))
    out_exact = simulator.integrate(pack, CFG.replace(
        rk_exact_stage_fields=True), 'GL', y0, params, jnp.ones(4, bool))
    both = np.asarray(out_frozen.alive) & np.asarray(out_exact.alive)
    d_lon = np.abs(np.asarray(out_frozen.lon) - np.asarray(out_exact.lon))
    d_v = np.abs(np.asarray(out_frozen.v) - np.asarray(out_exact.v))
    # deviations stay far below the stochastic track spread (the synthetic
    # wind sigma ~3 m/s wanders tracks by hundreds of km over 15 days)
    assert np.nanmax(d_lon[:, :120][both[:, :120]]) < 0.25   # 5 days
    assert np.nanmax(d_lon[both]) < 0.5        # < 50 km over 15 days
    assert np.nanmax(d_v[both]) < 1.5


def test_field_sample_stride_uniform_fields_exact():
    """With spatially uniform fields, block-start gathers return the same
    values as per-step gathers, so the strided scan must reproduce the
    per-step scan essentially exactly — this pins the block plumbing
    (step indexing, per-step Fourier slices, alive semantics, remainder
    stitching) with the staleness confound removed."""
    pack, params, y0 = _setup_batch(n=4)
    # flatten every field to its value at one tropical-ocean point
    la = int(np.round((12.0 - (-90.0)) / 2.0))       # lat 12, 2-deg grid
    lo = int(np.round(180.0 / 2.0))
    const = lambda a: jnp.broadcast_to(a[..., la:la + 1, lo:lo + 1, :],
                                       a.shape)
    pack = pack._replace(
        wind=const(pack.wind), env=const(pack.env),
        land=jnp.zeros_like(pack.land),
        bathy=jnp.full_like(pack.bathy, -4000.0),
        basin_masks=jnp.ones_like(pack.basin_masks),
        run_mask=jnp.ones_like(pack.run_mask))
    out1 = simulator.integrate(pack, CFG.replace(field_sample_stride=1),
                               'GL', y0, params, jnp.ones(4, bool))
    for stride in (2, 3):
        outS = simulator.integrate(
            pack, CFG.replace(field_sample_stride=stride), 'GL', y0,
            params, jnp.ones(4, bool))
        np.testing.assert_array_equal(np.asarray(out1.alive),
                                      np.asarray(outS.alive))
        both = np.asarray(out1.alive)
        for a, b in ((out1.lon, outS.lon), (out1.lat, outS.lat),
                     (out1.v, outS.v), (out1.m, outS.m)):
            np.testing.assert_allclose(np.asarray(a)[both],
                                       np.asarray(b)[both],
                                       rtol=2e-5, atol=2e-5)


def test_field_sample_stride_accuracy():
    """Strided field sampling on the structured synthetic environment:
    deviation from the per-step default stays far below the stochastic
    track spread (same bar as test_frozen_field_step_accuracy; staleness
    grows from <= 1 h to <= stride hours)."""
    pack, params, y0 = _setup_batch(n=4)
    out1 = simulator.integrate(pack, CFG.replace(field_sample_stride=1),
                               'GL', y0, params, jnp.ones(4, bool))
    for stride, lim_lon, lim_v in ((2, 1.0, 3.0), (3, 1.5, 4.5)):
        outS = simulator.integrate(
            pack, CFG.replace(field_sample_stride=stride), 'GL', y0,
            params, jnp.ones(4, bool))
        both = np.asarray(out1.alive) & np.asarray(outS.alive)
        d_lon = np.abs(np.asarray(out1.lon) - np.asarray(outS.lon))
        d_v = np.abs(np.asarray(out1.v) - np.asarray(outS.v))
        assert np.nanmax(d_lon[both]) < lim_lon, stride
        assert np.nanmax(d_v[both]) < lim_v, stride


def test_track_dies_over_cold_water():
    pack, params, _ = _setup_batch()
    # seeds at high latitude: vpot ~ 0 there, v decays below 4 m/s
    n = 4
    y0 = fast.State(jnp.full((n,), 200.0), jnp.full((n,), 48.0),
                    jnp.full((n,), 8.0), jnp.full((n,), 0.3))
    out = simulator.integrate(pack, CFG, 'GL', y0, params,
                              jnp.ones(n, bool))
    assert np.all(np.asarray(out.last_step) < CFG.n_steps_output - 1)


def test_integrate_mask_disables_slots():
    pack, params, y0 = _setup_batch()
    mask = jnp.asarray([True, False, True, False])
    out = simulator.integrate(pack, CFG, 'GL', y0, params, mask)
    alive0 = np.asarray(out.alive[:, 0])
    assert not alive0[1] and not alive0[3]
    assert np.all(np.isnan(np.asarray(out.v)[1]))


def test_tc_filters():
    n_steps = CFG.n_steps_output
    v = np.full((3, n_steps), np.nan, np.float32)
    alive = np.zeros((3, n_steps), bool)
    # track 0: strong TC alive throughout
    v[0] = 20.0
    alive[0] = True
    # track 1: reaches 15 but dies before 2 days with v < 6.5 at death
    v[1, :30] = np.linspace(16, 5, 30)
    alive[1, :30] = True
    # track 2: never reaches threshold
    v[2] = 10.0
    alive[2] = True
    out = simulator.TrackOutput(
        lon=jnp.zeros_like(jnp.asarray(v)), lat=jnp.zeros_like(jnp.asarray(v)),
        v=jnp.asarray(v), m=jnp.asarray(v) * 0,
        wnds=jnp.zeros((3, n_steps, 4)),
        alive=jnp.asarray(alive),
        last_step=jnp.asarray([n_steps - 1, 29, n_steps - 1]))
    is_tc, v2d = simulator.tc_filters(CFG, out)
    assert bool(is_tc[0])
    assert not bool(is_tc[1])      # v at death (5) < 6.5
    assert not bool(is_tc[2])      # never reached 15


# ----------------------------- seeding -----------------------------

def test_propose_seeds_distributions():
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    prop = seeding.propose_seeds(jax.random.key(0), pack, CFG, 'GL', 8192)
    lon = np.asarray(prop.lon)
    lat = np.asarray(prop.lat)
    month = np.asarray(prop.month)
    counted = np.asarray(prop.counted)
    integrate = np.asarray(prop.integrate)

    assert lon.min() >= 0 and lon.max() <= 360
    # months uniform over 1..12
    hist = np.bincount(month, minlength=13)[1:]
    assert hist.min() > 8192 / 12 * 0.8
    # equatorward rejection: counted seeds cluster away from the equator
    assert np.abs(lat[counted]).min() > 2.0
    assert counted.sum() > 100
    # PI gate only passes where vpot > 35: integrated subset of counted
    assert np.all(counted[integrate])
    assert integrate.sum() < counted.sum()
    # v_init ~ N(5, 1)
    v = np.asarray(prop.v_init)
    assert abs(v.mean() - 5.0) < 0.1 and abs(v.std() - 1.0) < 0.1
    # m_init within sigmoid range
    m = np.asarray(prop.m_init)
    assert m.min() >= 0.125 - 1e-5 and m.max() <= 0.325 + 1e-5


def test_count_seeds_per_month_cutoff():
    basin_idx = np.array([0, 1, 0, 2, 1])
    month = np.array([1, 1, 2, 3, 1])
    counted = np.array([True, False, True, True, True])
    full = seeding.count_seeds_per_month(basin_idx, month, counted, 7)
    assert full.sum() == 4
    cut = seeding.count_seeds_per_month(basin_idx, month, counted, 7, upto=2)
    assert cut.sum() == 2 and cut[0, 0] == 1 and cut[0, 1] == 1


def test_debug_fixed_position():
    """cfg.debug_fixed_position freezes storm motion (the reference's
    Coupled_FAST.debug mode, intensity/coupled_fast.py:204-205)."""
    pack, params, y0 = _setup_batch()
    cfg_dbg = CFG.replace(debug_fixed_position=True)
    out = simulator.integrate(pack, cfg_dbg, 'GL', y0, params,
                              jnp.ones(4, bool))
    lon = np.asarray(out.lon)
    alive = np.asarray(out.alive)
    for s in range(4):
        np.testing.assert_array_equal(lon[s][alive[s]], lon[s][0])
    # intensity still evolves
    v = np.asarray(out.v)
    assert np.nanstd(v[alive]) > 0.5


def test_propose_seeds_southern_hemisphere():
    """SH basins flip the genesis belt to [-45, -3] (util/compute.py:140-141)
    and the beta drift sign; seeds must all sit south of the equator."""
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0,
                          run_basin='SI')
    prop = seeding.propose_seeds(jax.random.key(4), pack, CFG, 'SI', 4096)
    lat = np.asarray(prop.lat)
    counted = np.asarray(prop.counted)
    assert counted.sum() > 30
    assert lat[counted].max() < -2.0
    assert lat[counted].min() >= -45.0 - 1e-4
    lon = np.asarray(prop.lon)
    assert lon[counted].min() >= 20.0 and lon[counted].max() <= 100.0
    # SH basin indices only (SI=4 in sorted AU,EP,NA,NI,SI,SP,WP)
    ids = CFG.basin_ids_sorted()
    got = {ids[i] for i in np.asarray(prop.basin_idx)[counted]}
    assert got <= {'SI', 'AU'}, got


def test_run_tracks_year_na_basin():
    """Single-basin (NA) quota run: all tracks start inside NA bounds."""
    from tropical_cyclone_risk_tpu.models import pipeline
    cfg = CFG.replace(seed_batch=1024, tracks_per_year=2)
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0,
                          run_basin='NA')
    yt = pipeline.run_tracks_year(jax.random.key(9), pack, cfg, 'NA', 0)
    assert yt.lon.shape[0] == 2
    assert np.all(yt.lon[:, 0] >= 260.0) and np.all(yt.lon[:, 0] <= 360.0)
    assert np.all(yt.lat[:, 0] > 2.0)


def test_time_interp_fields():
    """Optional monthly-plane time interpolation: t=0 equals the frozen
    sample; mid-track blends toward the next plane."""
    from tropical_cyclone_risk_tpu.models import fields as fields_mod
    pack, params, y0 = _setup_batch()
    stacks = fields_mod.build_stacks(pack)
    cfg_ti = CFG.replace(time_interp_fields=True)
    s_frozen = fast.sample_fields(stacks, y0.lon, y0.lat, params.plane)
    s_t0 = fast.sample_fields_at_time(stacks, cfg_ti, y0.lon, y0.lat,
                                      params.plane, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(s_t0.env),
                               np.asarray(s_frozen.env), rtol=1e-6)
    t_half = jnp.float32(fast.SECONDS_PER_MONTH / 2)
    s_next = fast.sample_fields(stacks, y0.lon, y0.lat, params.plane + 1)
    s_mid = fast.sample_fields_at_time(stacks, cfg_ti, y0.lon, y0.lat,
                                       params.plane, t_half)
    want = 0.5 * (np.asarray(s_frozen.env) + np.asarray(s_next.env))
    np.testing.assert_allclose(np.asarray(s_mid.env), want, rtol=1e-5,
                               atol=1e-5)
    # full integration under time interp runs and produces live tracks
    out = simulator.integrate(pack, cfg_ti, 'GL', y0, params,
                              jnp.ones(4, bool))
    assert np.all(np.asarray(out.alive[:, 0]))


def test_rk_substeps_stability():
    """rk_substeps subdivides each output interval; trajectories stay close
    to the single-step integration (step-size sufficiency, SURVEY sec 7)."""
    pack, params, y0 = _setup_batch()
    out1 = simulator.integrate(pack, CFG, 'GL', y0, params,
                               jnp.ones(4, bool))
    out4 = simulator.integrate(pack, CFG.replace(rk_substeps=4), 'GL', y0,
                               params, jnp.ones(4, bool))
    both = np.asarray(out1.alive) & np.asarray(out4.alive)
    d_v = np.abs(np.asarray(out1.v) - np.asarray(out4.v))
    assert np.nanmax(d_v[both]) < 1.5


def test_crop_pack_preserves_interior_samples():
    """Basin-cropped packs return identical gathers inside the basin."""
    from tropical_cyclone_risk_tpu.models import fields as F
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0,
                          run_basin='NA')
    cropped = F.crop_pack(pack, CFG, 'NA')
    assert cropped.grid.nlon < pack.grid.nlon
    assert cropped.grid.nlat < pack.grid.nlat
    s_full = F.build_stacks(pack)
    s_crop = F.build_stacks(cropped)
    rng = np.random.default_rng(0)
    lon = jnp.asarray(rng.uniform(262, 358, 200), jnp.float32)
    lat = jnp.asarray(rng.uniform(2, 58, 200), jnp.float32)
    plane = jnp.asarray(rng.integers(0, 12, 200), jnp.int32)
    a = fast.sample_fields(s_full, lon, lat, plane)
    b = fast.sample_fields(s_crop, lon, lat, plane)
    for x, y in zip(a, b):
        # float32 (x - lon0)/dlon differs in the last ulp between origins
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=1e-5)
    # GL is a no-op
    assert F.crop_pack(pack, CFG, 'GL') is pack


def test_three_level_steering_end_to_end(tmp_path):
    """steering_levels=(250, 500, 850): 6-component wind vector through
    seeding, integration, shear (resolved by level), and the output schema
    (u500_trks etc.)."""
    from tropical_cyclone_risk_tpu import runtime
    from tropical_cyclone_risk_tpu.io import netcdf
    cfg = CFG.replace(steering_levels=(250, 500, 850),
                      steering_coefs=(0.1, 0.2, 0.7),
                      y_alpha=(0.1, 0.2, 0.7), m_alpha=(0.001, 0.0, -0.001),
                      alpha_max=(0.4, 0.4, 0.9), alpha_min=(0.05, 0.05, 0.5),
                      seed_batch=512, tracks_per_year=1,
                      start_year=2016, end_year=2016,
                      output_directory=str(tmp_path), exp_name='w3')
    pack = synthetic_pack(cfg, n_planes=12, nlat=46, nlon=90, seed=0)
    assert pack.wind.shape[-1] == 6 + 21
    fn = runtime.run_downscaling(pack=pack, cfg=cfg, basin_id='GL',
                                 key=jax.random.key(3), n_years=1)
    ds = netcdf.read(fn)
    for nm in ('u250_trks', 'v250_trks', 'u500_trks', 'v500_trks',
               'u850_trks', 'v850_trks'):
        assert nm in ds, nm
    assert np.isfinite(ds['u500_trks'].data[0, 0])

    # deep_layer_indices picks 250/850, skipping 500
    assert fast.deep_layer_indices(cfg) == (0, 1, 4, 5)
    import pytest
    with pytest.raises(ValueError, match='850'):
        fast.deep_layer_indices(CFG.replace(steering_levels=(250, 500)))
