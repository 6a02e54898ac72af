"""Thermodynamics kernels vs float64 references and the bundled table."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import lambertw as scipy_lambertw

from tropical_cyclone_risk_tpu.ops import pi as pi_mod
from tropical_cyclone_risk_tpu.ops import thermo

import golden_pi

REF_TABLE = '/root/reference/thermo/entropy_table.npz'


def test_sat_thermo_bolton():
    T = np.linspace(200, 320, 50)
    p = np.full_like(T, 9e4)
    es, rs = thermo.sat_thermo(jnp.asarray(T), jnp.asarray(p))
    es_ref, rs_ref = golden_pi.sat(T, p)
    np.testing.assert_allclose(np.asarray(es), es_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rs), rs_ref, rtol=1e-5)


def test_conv_q_to_rh_bounds():
    rh = thermo.conv_q_to_rh(jnp.asarray(280.0), jnp.asarray(1e-9),
                             jnp.asarray(6e4))
    assert float(rh) == pytest.approx(1e-5)
    rh2 = thermo.conv_q_to_rh(jnp.asarray(280.0), jnp.asarray(0.5),
                              jnp.asarray(6e4))
    assert float(rh2) == 1.0


def test_lambertw_m1_vs_scipy():
    x = -np.exp(np.linspace(np.log(1e-6), np.log(0.3678), 200))
    got = np.asarray(thermo.lambertw_m1(jnp.asarray(x, jnp.float64)
                                        if jnp.zeros(1).dtype == jnp.float64
                                        else jnp.asarray(x)))
    want = scipy_lambertw(x, -1).real
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_lcl_saturated_parcel_is_at_surface():
    p, T, r = 1.0e5, 300.0, 0.018
    _, rs = golden_pi.sat(T, p)
    rh = 1.0
    plcl = float(thermo.get_LCL(jnp.asarray(p), jnp.asarray(T),
                                jnp.asarray(rs), jnp.asarray(rh)))
    assert plcl == pytest.approx(p, rel=1e-3)


def test_lcl_vs_scipy_reference():
    rng = np.random.default_rng(0)
    T = rng.uniform(280, 305, 100)
    p = rng.uniform(9.5e4, 1.02e5, 100)
    rh = rng.uniform(0.3, 0.99, 100)
    _, rs = golden_pi.sat(T, p)
    r = rh * rs
    got = np.asarray(thermo.get_LCL(jnp.asarray(p), jnp.asarray(T),
                                    jnp.asarray(r), jnp.asarray(rh)))
    want = np.array([golden_pi.lcl_romps(p[i], T[i], r[i], rh[i])
                     for i in range(100)])
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_entropy_inversion_roundtrip():
    # physically meaningful (p, T) pairs: es(T) well below p
    T_true = np.linspace(150, 305, 100)
    p = np.linspace(1.04e5, 2e4, 100)
    s_ref = np.asarray(thermo.s_sat(jnp.asarray(T_true), jnp.asarray(p), 0.0))
    T_inv = np.asarray(thermo.invert_entropy_newton(jnp.asarray(p),
                                                    jnp.asarray(s_ref)))
    np.testing.assert_allclose(T_inv, T_true, rtol=2e-4, atol=0.05)


@pytest.mark.skipif(not os.path.exists(REF_TABLE),
                    reason='reference table not mounted')
def test_generated_entropy_table_matches_bundled():
    ref = np.load(REF_TABLE)
    p_look, s_look, T = thermo.generate_entropy_table()
    np.testing.assert_allclose(np.asarray(p_look), ref['p'], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_look), ref['s'], rtol=1e-6)
    # The bundled table was made with Nelder-Mead at loose tolerance; agree
    # to ~0.1 K away from the unphysical low-T corner.
    mask = ref['T'] > 150
    err = np.abs(np.asarray(T) - ref['T'])[mask]
    assert np.percentile(err, 99) < 0.2, np.percentile(err, 99)
    assert err.max() < 2.0


def _synthetic_sounding(rng, n=16):
    """Tropical-like soundings: warm SST, decreasing T, moist low levels."""
    p_env = np.array([1000, 975, 950, 925, 900, 875, 850, 825, 800, 775,
                      750, 700, 650, 600, 550, 500, 450, 400, 350, 300,
                      250, 225, 200, 175, 150, 125, 100, 70]) * 100.0
    sst = rng.uniform(295, 304, n)
    p_surf = rng.uniform(1.004e5, 1.016e5, n)
    T0 = sst - rng.uniform(0.5, 1.5, n)
    # exponent 0.45 gives a cold upper troposphere -> realistic CAPE excess
    Tenv = 200.0 + (T0[None] - 200.0) * (p_env[:, None] / p_env[0]) ** 0.45
    rh_prof = np.clip(0.85 - 0.45 * (1 - p_env / p_env[0])[:, None]
                      + rng.uniform(-0.05, 0.05, (len(p_env), n)), 0.05, 0.99)
    rs = np.stack([golden_pi.sat(Tenv[l], p_env[l])[1]
                   for l in range(len(p_env))])
    renv = rh_prof * rs
    return sst, p_surf, p_env, Tenv, renv


def test_cape_pi_matches_scalar_golden():
    rng = np.random.default_rng(42)
    sst, p_surf, p_env, Tenv, renv = _synthetic_sounding(rng, n=24)
    table = pi_mod.EntropyTable.create()
    got = np.asarray(pi_mod.cape_pi(
        jnp.asarray(sst, jnp.float32), jnp.asarray(p_surf, jnp.float32),
        jnp.asarray(p_env, jnp.float32), jnp.asarray(Tenv, jnp.float32),
        jnp.asarray(renv, jnp.float32), table))

    p_look = np.asarray(table.grid.lat_axis())
    s_look = np.asarray(table.grid.lon_axis())
    T_look = np.asarray(table.T)
    want = np.array([golden_pi.pi_column(sst[i], p_surf[i], p_env,
                                         Tenv[:, i], renv[:, i],
                                         p_look, s_look, T_look)
                     for i in range(len(sst))])
    # tropical soundings should support hurricanes
    assert want.max() > 40.0
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1.5)


def test_cape_pi_cold_sst_gives_zero():
    rng = np.random.default_rng(7)
    sst, p_surf, p_env, Tenv, renv = _synthetic_sounding(rng, n=4)
    sst = np.full_like(sst, 270.0)   # cold ocean: no CAPE excess
    table = pi_mod.EntropyTable.create()
    got = np.asarray(pi_mod.cape_pi(
        jnp.asarray(sst, jnp.float32), jnp.asarray(p_surf, jnp.float32),
        jnp.asarray(p_env, jnp.float32), jnp.asarray(Tenv, jnp.float32),
        jnp.asarray(renv, jnp.float32), table))
    assert np.all(got < 5.0)


def test_cape_pi_direct_inversion_mode():
    """select_interp=1 (direct Newton entropy inversion) agrees with the
    table mode within the table's discretization error, and the reversible
    branch (select_thermo=2) runs and gives physical PI."""
    import jax.numpy as jnp
    from tropical_cyclone_risk_tpu.ops import pi as pi_mod

    table = pi_mod.EntropyTable.create(1)
    p_env = jnp.asarray([101000.0, 85000.0, 60000.0, 40000.0, 25000.0,
                         10000.0], jnp.float32)
    sst = jnp.asarray([[302.0, 299.0]])
    psl = jnp.asarray([[101000.0, 101000.0]])
    Tsfc = sst - 1.0
    T = jnp.stack([Tsfc[0] * (p / 101000.0) ** 0.19 for p in p_env])[:, None]
    r = jnp.stack([0.018 * jnp.exp(-(101000.0 - p) / 25000.0)
                   * jnp.ones(2) for p in p_env])[:, None]
    pi_table = pi_mod.cape_pi(sst, psl, p_env, T, r, table,
                              select_interp=2)
    pi_direct = pi_mod.cape_pi(sst, psl, p_env, T, r, table,
                               select_interp=1)
    a, b = np.asarray(pi_table), np.asarray(pi_direct)
    assert a.max() > 40.0
    np.testing.assert_allclose(a, b, rtol=0.08, atol=2.0)

    # reversible branch needs per-parcel total water -> direct mode only
    pi_rev = pi_mod.cape_pi(sst, psl, p_env, T, r, table,
                            select_thermo=2, select_interp=1)
    c = np.asarray(pi_rev)
    assert np.all(np.isfinite(c)) and c.max() > 30.0


def test_reversible_table3_matches_direct():
    """The 3-D reversible table agrees with direct Newton inversion (the
    reference's entropy_table_reversible.npz + interpn path,
    thermo/thermo.py:159-163,230)."""
    import jax.numpy as jnp
    from tropical_cyclone_risk_tpu.ops import pi as pi_mod

    t3 = pi_mod.EntropyTable3.create()
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(2e4, 1.0e5, 50), jnp.float32)
    rt = jnp.asarray(rng.uniform(0.0, 0.03, 50), jnp.float32)
    T_want = thermo.invert_entropy_newton(p, jnp.full(50, 2900.0), rt,
                                          select_thermo=2, use_pog=False)
    T_got = t3.lookup(p, jnp.full(50, 2900.0), rt)
    np.testing.assert_allclose(np.asarray(T_got), np.asarray(T_want),
                               rtol=5e-3)

    # full reversible PI via the 3-D table is close to direct inversion
    p_env = jnp.asarray([101000.0, 85000.0, 60000.0, 40000.0, 25000.0,
                         10000.0], jnp.float32)
    sst = jnp.asarray([[302.0, 299.0]])
    psl = jnp.asarray([[101000.0, 101000.0]])
    Tsfc = sst - 1.0
    T = jnp.stack([Tsfc[0] * (pp / 101000.0) ** 0.19
                   for pp in p_env])[:, None]
    r = jnp.stack([0.018 * jnp.exp(-(101000.0 - pp) / 25000.0)
                   * jnp.ones(2) for pp in p_env])[:, None]
    pi_t3 = pi_mod.cape_pi(sst, psl, p_env, T, r, t3, select_thermo=2,
                           select_interp=2)
    pi_direct = pi_mod.cape_pi(sst, psl, p_env, T, r, t3, select_thermo=2,
                               select_interp=1)
    np.testing.assert_allclose(np.asarray(pi_t3), np.asarray(pi_direct),
                               rtol=0.1, atol=2.5)
    assert np.asarray(pi_t3).max() > 30.0
