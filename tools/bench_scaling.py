"""Throughput scaling with seed-batch size (run on the real chip)."""
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

for n_seeds in (8192, 32768, 131072):
    cfg = Namelist().replace(seed_batch=n_seeds)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    t_c0 = time.perf_counter()
    tracks, meta = pipeline._simulate_batch(jax.random.key(0), pack, cfg,
                                            'GL', n_seeds, 64, jnp.int32(0))
    int(np.asarray(meta['keep']).sum())
    compile_s = time.perf_counter() - t_c0
    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        tracks, meta = pipeline._simulate_batch(jax.random.key(i + 1), pack,
                                                cfg, 'GL', n_seeds, 64,
                                                jnp.int32(0))
        int(np.asarray(meta['keep']).sum())
    dt = (time.perf_counter() - t0) / n_iter
    print(f'n_seeds={n_seeds}: launch={dt:.3f}s '
          f'({n_seeds / dt * 60:.0f} storms/min) compile={compile_s:.0f}s',
          flush=True)
