"""Separate fixed per-launch cost from per-step cost: time launches at two
track lengths and solve the linear model."""
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

N = 131072
results = {}
for days in (3, 15):
    cfg = Namelist().replace(seed_batch=N, total_track_time_days=days)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    tracks, meta = pipeline._simulate_batch(jax.random.key(0), pack, cfg,
                                            'GL', N, 64, jnp.int32(0))
    int(np.asarray(meta['keep']).sum())
    t0 = time.perf_counter()
    for i in range(4):
        tracks, meta = pipeline._simulate_batch(jax.random.key(i + 1), pack,
                                                cfg, 'GL', N, 64,
                                                jnp.int32(0))
        int(np.asarray(meta['keep']).sum())
    dt = (time.perf_counter() - t0) / 4
    steps = cfg.n_steps_output
    results[days] = (steps, dt)
    print(f'{days}d ({steps} steps): {dt:.3f}s/launch', flush=True)

(s1, t1), (s2, t2) = results[3], results[15]
per_step = (t2 - t1) / (s2 - s1)
fixed = t1 - s1 * per_step
print(f'per-step: {per_step * 1e6:.0f} us; fixed per launch: {fixed:.3f}s',
      flush=True)
