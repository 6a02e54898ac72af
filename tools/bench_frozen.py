"""Frozen-per-step vs per-stage field sampling on the real chip."""
import time

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, 'tools'))
sys.path.insert(0, _ROOT)

import jax
import _tpu_cache  # noqa: F401
import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import pipeline
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack

n_seeds = 32768
for exact in (True, False):
    cfg = Namelist().replace(seed_batch=n_seeds, rk_exact_stage_fields=exact)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    tracks, meta = pipeline._simulate_batch(jax.random.key(0), pack, cfg,
                                            'GL', n_seeds, 64, jnp.int32(0))
    int(np.asarray(meta['keep']).sum())
    t0 = time.perf_counter()
    for i in range(3):
        tracks, meta = pipeline._simulate_batch(jax.random.key(i + 1), pack,
                                                cfg, 'GL', n_seeds, 64,
                                                jnp.int32(0))
        surv = int(np.asarray(meta['keep']).sum())
    dt = (time.perf_counter() - t0) / 3
    print(f'exact_stage_fields={exact}: launch={dt:.3f}s '
          f'({n_seeds / dt * 60:.0f} storms/min), survivors={surv}',
          flush=True)
