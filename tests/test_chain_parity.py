"""Whole-chain statistical parity: the full TPU pipeline (vectorized seeding
-> fused RK4 scan -> filters -> vmax) against an independent sequential
NumPy/scipy reference chain (solve_ivp RK45, scalar spline physics —
tests/reference_chain.py) on the same synthetic environment.

This is the BASELINE.json quality metric exercised end to end: LMI
distribution, genesis latitude, seasonal cycle, track density, and the
survival rate (the model's frequency signal).  Piecewise parity lives in
test_seeding_parity / test_simulator / test_fast_golden; this test catches
compounding biases those cannot.

Thresholds: KS statistics far above sampling noise would flag a physics
difference.  With n_ref ~ 190 and n_tpu ~ 530 the 1% KS critical value is
~0.135; we assert < 0.13 (observed ~0.05-0.08).  Seasonal total-variation
noise floor at these sizes is ~0.09 (observed ~0.10); assert < 0.18.
Track-density overlap observed ~0.80 at these sample sizes (sampling noise
dominates); assert > 0.70.  Survival-per-counted-seed agreed to 4% relative
in calibration (0.0370 vs 0.0386); assert ratio within [0.75, 1.35].
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import ks_2samp

sys.path.insert(0, str(Path(__file__).parent))

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import pipeline
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack

from reference_chain import ReferenceChain

CFG = Namelist(seed_batch=8192)
N_REF_SEEDS = 5000       # counted seeds for the sequential chain (~50 s)
N_TPU_LAUNCHES = 3


@pytest.fixture(scope='module')
def populations():
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)

    rc = ReferenceChain(pack, CFG, 'GL')
    tracks, n_counted, _ = rc.run(np.random.default_rng(0), N_REF_SEEDS)
    ref = {
        'lmi': np.array([t.vmax.max() for t in tracks]),
        'lat0': np.array([t.lat[0] for t in tracks]),
        'month': np.array([t.month for t in tracks]),
        'pos': np.concatenate([np.stack([t.lon, t.lat], 1) for t in tracks]),
        'survival': len(tracks) / n_counted,
    }

    lmis, lat0s, months, poss = [], [], [], []
    n_counted = n_kept = 0
    for i in range(N_TPU_LAUNCHES):
        tr, meta = pipeline._simulate_batch(
            jax.random.fold_in(jax.random.key(1), i), pack, CFG, 'GL',
            CFG.seed_batch, 2048, jnp.int32(0))
        valid = np.asarray(tr['valid'])
        vmax = np.asarray(tr['vmax'])[valid]
        with np.errstate(all='ignore'):
            lmis.append(np.nanmax(np.where(np.isfinite(vmax), vmax, -np.inf),
                                  axis=1))
        lat0s.append(np.asarray(tr['lat'])[valid, 0])
        months.append(np.asarray(tr['month'])[valid])
        lon_t = np.asarray(tr['lon'])[valid]
        lat_t = np.asarray(tr['lat'])[valid]
        ok = np.isfinite(lon_t)
        poss.append(np.stack([lon_t[ok], lat_t[ok]], 1))
        n_counted += int(np.asarray(meta['counted']).sum())
        n_kept += int(np.asarray(meta['keep']).sum())
    tpu = {
        'lmi': np.concatenate(lmis),
        'lat0': np.concatenate(lat0s),
        'month': np.concatenate(months),
        'pos': np.concatenate(poss),
        'survival': n_kept / n_counted,
    }
    assert ref['lmi'].size > 100 and tpu['lmi'].size > 300
    return ref, tpu


def test_lmi_distribution(populations):
    ref, tpu = populations
    ks = ks_2samp(ref['lmi'], tpu['lmi'])
    assert ks.statistic < 0.13, (ks.statistic, ks.pvalue)


def test_genesis_latitude(populations):
    ref, tpu = populations
    ks = ks_2samp(ref['lat0'], tpu['lat0'])
    assert ks.statistic < 0.13, (ks.statistic, ks.pvalue)


def test_seasonal_cycle(populations):
    ref, tpu = populations
    h_r = np.bincount(ref['month'], minlength=13)[1:] / ref['month'].size
    h_t = np.bincount(tpu['month'], minlength=13)[1:] / tpu['month'].size
    tv = 0.5 * np.abs(h_r - h_t).sum()
    assert tv < 0.18, tv


def test_track_density(populations):
    ref, tpu = populations
    bins = [np.arange(0, 361, 10), np.arange(-90, 91, 10)]
    H_r, _, _ = np.histogram2d(ref['pos'][:, 0], ref['pos'][:, 1], bins=bins)
    H_t, _, _ = np.histogram2d(tpu['pos'][:, 0], tpu['pos'][:, 1], bins=bins)
    overlap = np.minimum(H_r / H_r.sum(), H_t / H_t.sum()).sum()
    assert overlap > 0.70, overlap


def test_survival_rate(populations):
    """Survivors per counted seed — the frequency signal (Gamma in the
    reference's analysis notebook, cell 11)."""
    ref, tpu = populations
    ratio = tpu['survival'] / ref['survival']
    assert 0.75 < ratio < 1.35, (ref['survival'], tpu['survival'])
