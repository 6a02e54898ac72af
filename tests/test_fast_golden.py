"""Golden scalar checks of the coupled FAST + BAM tendency.

A float64, loop-free scalar re-derivation of the physics from the model
equations (Emanuel 2017 FAST; Lin et al. 2023 intensity-dependent steering;
reference intensity/coupled_fast.py + track/bam_track.py), evaluated against
the batched float32 RHS on hand-built field samples.  Bypasses the gather
path entirely — catches transcription errors in the dynamics (unit
conversions, clip bounds, branch conditions, channel order)."""

import numpy as np
import jax.numpy as jnp

from tropical_cyclone_risk_tpu import constants
from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import fast
from tropical_cyclone_risk_tpu.ops.fourier import FourierSeries, N_FOURIER

CFG = Namelist()
EPS, KAP = 0.33, 0.1
BET = 1 - EPS - KAP


def scalar_rhs(cfg, t, lon, lat, v, m, mean4, cov44, F4, chi, vpot_raw,
               mld, strat, land, bathy, h_bl):
    """Float64 scalar tendency (one storm)."""
    # --- env winds: mean + chol(cov) @ F (bam_track.py:116-128) ---
    L = np.linalg.cholesky(cov44)
    wnds = mean4 + L @ F4
    if abs(lat) >= 80:
        wnds = np.zeros(4)
    # --- intensity-dependent steering (coupled_fast.py:183-192) ---
    if cfg.coupled_track:
        a = np.array(cfg.y_alpha) + np.array(cfg.m_alpha) * (v * 1.94384)
        a = np.clip(a, cfg.alpha_min, cfg.alpha_max)
    else:
        a = np.array(cfg.steering_coefs)
    clat = np.cos(np.deg2rad(lat))
    u_bam = a[0] * wnds[0] + a[1] * wnds[2] + cfg.u_beta * clat
    v_bam = a[0] * wnds[1] + a[1] * wnds[3] + np.sign(lat) * cfg.v_beta * clat
    if abs(lat) >= 80:
        u_bam = v_bam = 0.0
    # --- ocean feedback alpha (coupled_fast.py:65-94) ---
    is_land = land >= 1.0 - 1e-5
    vpot = 0.0 if is_land else vpot_raw
    u_T = np.hypot(u_bam, v_bam)
    if bathy >= 0 or -mld <= bathy or strat == 0:
        alpha = 1.0
    else:
        z = 0.01 * strat ** -0.4 * mld * u_T * vpot / v
        alpha = 1 - 0.87 * np.exp(-z)
    gamma = EPS + alpha * KAP
    ck2h = 0.5 * cfg.Ck / h_bl
    dvdt = ck2h * (alpha * BET * vpot ** 2 * m ** 3
                   - (1 - gamma * m ** 3) * v ** 2)
    shear = np.hypot(wnds[0] - wnds[2], wnds[1] - wnds[3])
    dmdt = ck2h * ((1 - m) * v - shear * chi * m)
    rad = 180.0 / np.pi / constants.earth_R
    return (u_bam * rad / clat, v_bam * rad, dvdt, dmdt, wnds)


def _sample(mean4, cov44, chi, vpot, mld, strat, land, bathy):
    tri = [cov44[i, j] for i in range(4) for j in range(i + 1)]
    stats = np.concatenate([mean4, tri])[None].astype(np.float32)
    env = np.array([[chi, vpot, mld, strat, 0.6]], np.float32)
    return fast.FieldSample(jnp.asarray(stats), jnp.asarray(env),
                            jnp.asarray([land], jnp.float32),
                            jnp.asarray([bathy], jnp.float32))


def _fourier_identity(F4):
    """FourierSeries whose evaluation at t=0 equals F4 exactly."""
    A = np.zeros((1, 4, N_FOURIER), np.float32)
    B = np.zeros((1, 4, N_FOURIER), np.float32)
    B[0, :, 0] = F4      # cos(0) = 1
    return FourierSeries(jnp.asarray(A), jnp.asarray(B),
                         jnp.asarray(CFG.T_fourier_s, jnp.float32))


def _compare(cfg, lon, lat, v, m, mean4, cov44, F4, chi, vpot, mld, strat,
             land, bathy, h_bl=1400.0, rtol=2e-4, atol=5e-7):
    smp = _sample(mean4, cov44, chi, vpot, mld, strat, land, bathy)
    params = fast.SeedParams(plane=jnp.zeros(1, jnp.int32),
                             h_bl=jnp.asarray([h_bl], jnp.float32),
                             fourier=_fourier_identity(F4))
    y = fast.State(*(jnp.asarray([x], jnp.float32)
                     for x in (lon, lat, v, m)))
    d, wnds = fast.rhs_from_sample(cfg, jnp.asarray(0.0), y, params, smp)
    want = scalar_rhs(cfg, 0.0, lon, lat, v, m, np.asarray(mean4, float),
                      np.asarray(cov44, float), np.asarray(F4, float), chi,
                      vpot, mld, strat, land, bathy, h_bl)
    got = [float(d.lon[0]), float(d.lat[0]), float(d.v[0]), float(d.m[0])]
    np.testing.assert_allclose(got, want[:4], rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(wnds)[0], want[4], rtol=1e-4,
                               atol=1e-4)


def _cov():
    rng = np.random.default_rng(3)
    M = rng.normal(size=(4, 4))
    return M @ M.T + 2 * np.eye(4)


def test_golden_deep_ocean_intensifying():
    _compare(CFG, 150.0, 18.0, 25.0, 0.6, np.array([-8.0, 2.0, -4.0, 1.0]),
             _cov(), np.array([0.5, -0.3, 0.2, 0.8]),
             chi=0.8, vpot=60.0, mld=40.0, strat=5.0, land=0.0,
             bathy=-4000.0)


def test_golden_over_land():
    # land: vpot -> 0, alpha = 1 (no-mixing branch via bathy >= 0)
    _compare(CFG, 260.0, 30.0, 30.0, 0.7, np.array([-5.0, 1.0, -2.0, 0.5]),
             _cov(), np.array([-0.2, 0.4, 0.1, -0.6]),
             chi=1.5, vpot=55.0, mld=0.0, strat=0.0, land=1.0, bathy=100.0)


def test_golden_shallow_water_no_mixing():
    # ocean but -mld <= bathy: alpha = 1
    _compare(CFG, 100.0, -15.0, 20.0, 0.5, np.array([-6.0, -1.0, -3.0, 0.0]),
             _cov(), np.array([0.1, 0.1, -0.2, 0.3]),
             chi=0.9, vpot=65.0, mld=30.0, strat=4.0, land=0.0, bathy=-20.0)


def test_golden_southern_hemisphere_drift():
    # sign(lat) flips the meridional beta drift
    _compare(CFG, 60.0, -12.0, 18.0, 0.45, np.array([-7.0, 0.5, -3.5, -0.5]),
             _cov(), np.array([-0.4, 0.2, 0.6, -0.1]),
             chi=1.1, vpot=58.0, mld=50.0, strat=6.0, land=0.0,
             bathy=-3500.0)


def test_golden_uncoupled_steering():
    cfg = CFG.replace(coupled_track=False)
    _compare(cfg, 140.0, 20.0, 40.0, 0.8, np.array([-9.0, 3.0, -5.0, 2.0]),
             _cov(), np.array([0.7, -0.5, 0.3, 0.2]),
             chi=0.7, vpot=70.0, mld=45.0, strat=5.0, land=0.0,
             bathy=-5000.0)


def test_golden_steering_clip_bounds():
    # strong storm: alpha clipped at (alpha_min, alpha_max)
    for v in (5.0, 90.0):
        _compare(CFG, 150.0, 22.0, v, 0.6, np.array([-8.0, 2.0, -4.0, 1.0]),
                 _cov(), np.array([0.5, -0.3, 0.2, 0.8]),
                 chi=0.8, vpot=75.0, mld=40.0, strat=5.0, land=0.0,
                 bathy=-4000.0, rtol=1e-3, atol=1e-6)


def test_golden_polar_cutoff():
    smp = _sample(np.array([-8.0, 2.0, -4.0, 1.0]), _cov(),
                  0.8, 60.0, 40.0, 5.0, 0.0, -4000.0)
    params = fast.SeedParams(plane=jnp.zeros(1, jnp.int32),
                             h_bl=jnp.asarray([1400.0], jnp.float32),
                             fourier=_fourier_identity(np.zeros(4)))
    y = fast.State(jnp.asarray([10.0]), jnp.asarray([81.0]),
                   jnp.asarray([20.0]), jnp.asarray([0.5]))
    d, wnds = fast.rhs_from_sample(CFG, jnp.asarray(0.0), y, params, smp)
    assert float(d.lon[0]) == 0.0 and float(d.lat[0]) == 0.0
    assert np.all(np.asarray(wnds) == 0.0)


def test_init_m_dvdt0_golden():
    """m initialization by dv/dt=0 inversion incl. the 5-point vpot max
    (coupled_fast.py:152-167) vs a scalar float64 spline re-derivation."""
    from scipy.interpolate import RectBivariateSpline
    from tropical_cyclone_risk_tpu.models.fields import synthetic_pack

    cfg = CFG
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0)
    n = 6
    lon = jnp.asarray(np.linspace(150.0, 210.0, n), jnp.float32)
    lat = jnp.asarray(np.linspace(8.0, 30.0, n), jnp.float32)
    v = jnp.asarray(np.linspace(4.0, 9.0, n), jnp.float32)
    plane = jnp.full((n,), 7, jnp.int32)
    h_bl = jnp.full((n,), 1600.0, jnp.float32)
    # zero Fourier coefficients -> colored winds == monthly means on both
    # sides (coloring itself is covered by the RHS golden tests)
    W = cfg.n_wind_levels
    fz = FourierSeries(jnp.zeros((n, W, N_FOURIER)),
                       jnp.zeros((n, W, N_FOURIER)),
                       jnp.asarray(cfg.T_fourier_s))
    params = fast.SeedParams(plane=plane, h_bl=h_bl, fourier=fz)
    got = np.asarray(fast.init_m_dvdt0(pack, cfg, lon, lat, v, params))

    g = pack.grid
    p = 7
    spl = lambda f: RectBivariateSpline(g.lon_axis(), g.lat_axis(),
                                        np.asarray(f).T, kx=1, ky=1)
    f_env = [spl(pack.env[p, :, :, c]) for c in range(5)]
    f_wnd = [spl(pack.wind[p, :, :, c])
             for c in range(np.asarray(pack.wind).shape[-1])]
    f_land = spl(pack.land)
    f_bathy = spl(pack.bathy)

    for i in range(n):
        lo, la, vv = float(lon[i]), float(lat[i]), float(v[i])
        mean = np.array([f_wnd[c].ev(lo, la) for c in range(W)])
        a = np.clip(np.array(cfg.y_alpha)
                    + np.array(cfg.m_alpha) * vv * 1.94384,
                    cfg.alpha_min, cfg.alpha_max)
        clat = np.cos(np.deg2rad(la))
        u_bam = a @ mean[0::2] + cfg.u_beta * clat
        v_bam = a @ mean[1::2] + np.sign(la) * cfg.v_beta * clat
        u_T = np.hypot(u_bam, v_bam)

        def vp(lo_, la_):
            if f_land.ev(lo_, la_) >= 1.0 - 1e-5:
                return 0.0
            return float(f_env[1].ev(lo_, la_))
        vpot5 = max(vp(lo, la), vp(lo - .25, la - .25), vp(lo - .25, la + .25),
                    vp(lo + .25, la - .25), vp(lo + .25, la + .25))
        mld = float(f_env[2].ev(lo, la))
        strat = float(f_env[3].ev(lo, la))
        bathy = float(f_bathy.ev(lo, la))
        vpot_c = vp(lo, la)
        if bathy >= 0 or -mld <= bathy or strat == 0:
            alpha = 1.0
        else:
            z = 0.01 * strat ** -0.4 * mld * u_T * vpot_c / vv
            alpha = 1 - 0.87 * np.exp(-np.clip(z, 0, 100))
        gamma = EPS + alpha * KAP
        want = np.clip(np.cbrt(vv ** 2 / (alpha * BET * vpot5 ** 2
                                          + gamma * vv ** 2)), 0, 1)
        np.testing.assert_allclose(got[i], want, atol=2e-3, rtol=2e-3)


def test_init_m_dvdt0_pipeline_mode():
    """cfg.m_init_mode='dvdt0' runs the full launch and changes m_init."""
    import jax
    from tropical_cyclone_risk_tpu.models import pipeline
    from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
    cfg = CFG.replace(seed_batch=1024, tracks_per_year=2)
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0)
    yt_rh = pipeline.run_tracks_year(jax.random.key(11), pack, cfg, 'GL', 0)
    cfg2 = cfg.replace(m_init_mode='dvdt0')
    yt_dv = pipeline.run_tracks_year(jax.random.key(11), pack, cfg2, 'GL', 0)
    assert yt_dv.m.shape[0] == 2
    m0_rh = yt_rh.m[:, 0]
    m0_dv = yt_dv.m[:, 0]
    assert np.all((m0_dv >= 0) & (m0_dv <= 1))
    # the two initialization modes genuinely differ
    assert not np.allclose(np.sort(m0_rh), np.sort(m0_dv), atol=1e-3)
