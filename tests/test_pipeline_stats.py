"""Pipeline-level statistical properties (SURVEY.md section 4 test tiers):
(c) distributional stability of the physics outputs across independent RNG
streams, (d) bitwise determinism for a fixed key (unlike the reference's
wall-clock reseeding)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ks_2samp

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import pipeline
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack

CFG = Namelist(seed_batch=4096)


def _launch(key):
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    return pipeline._simulate_batch(key, pack, CFG, 'GL', CFG.seed_batch,
                                    256, jnp.int32(0))


def test_deterministic_for_fixed_key():
    t1, m1 = _launch(jax.random.key(123))
    t2, m2 = _launch(jax.random.key(123))
    np.testing.assert_array_equal(np.asarray(m1['keep']),
                                  np.asarray(m2['keep']))
    np.testing.assert_array_equal(np.asarray(t1['lon']),
                                  np.asarray(t2['lon']))
    np.testing.assert_array_equal(np.asarray(t1['vmax']),
                                  np.asarray(t2['vmax']))


def test_distributional_stability_across_keys():
    """Independent RNG streams produce statistically indistinguishable
    survivor populations: LMI distribution and genesis latitudes."""
    def stats(key):
        tracks, meta = _launch(key)
        valid = np.asarray(tracks['valid'])
        vmax = np.asarray(tracks['vmax'])[valid]
        lat0 = np.asarray(tracks['lat'])[valid, 0]
        with np.errstate(all='ignore'):
            lmi = np.nanmax(np.where(np.isfinite(vmax), vmax, -np.inf),
                            axis=1)
        return lmi[np.isfinite(lmi)], lat0, int(valid.sum())

    lmi_a, lat_a, n_a = stats(jax.random.key(1))
    lmi_b, lat_b, n_b = stats(jax.random.key(2))
    assert n_a > 30 and n_b > 30
    # survivor counts within Poisson-ish noise of each other
    assert abs(n_a - n_b) < 4 * np.sqrt(0.5 * (n_a + n_b))
    assert ks_2samp(lmi_a, lmi_b).pvalue > 0.01
    assert ks_2samp(lat_a, lat_b).pvalue > 0.01
    # physical sanity of the LMI population
    assert 18.0 <= np.median(np.concatenate([lmi_a, lmi_b])) <= 90.0
