"""On-chip measurement of the integration-scan unroll factor.

The round-4 launch decomposition left ~15 ms of 'scan skeleton' in an
~88 ms launch; lax.scan unroll replays the (already 3-step, stride-block)
body several times per loop iteration, trading compile time for loop
bookkeeping.  This times the full bench launch at several unroll factors.

Usage: python tools/bench_unroll.py [unrolls...]   (default 1 2 4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    from tools import _tpu_cache  # noqa: F401
except ImportError:
    pass
import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import pipeline
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack


def measure(cfg, pack, n_seeds, n_iter=6):
    k_max = 64
    t_c = time.perf_counter()
    _, meta = pipeline._simulate_batch(jax.random.key(0), pack, cfg, 'GL',
                                       n_seeds, k_max, jnp.int32(0))
    n0 = int(np.asarray(meta['scalars'])[0])
    t_compile = time.perf_counter() - t_c
    inflight = [pipeline._simulate_batch(jax.random.key(1), pack, cfg, 'GL',
                                         n_seeds, k_max, jnp.int32(0))]
    t0 = time.perf_counter()
    for i in range(n_iter):
        if i + 1 < n_iter:
            inflight.append(pipeline._simulate_batch(
                jax.random.key(i + 2), pack, cfg, 'GL', n_seeds, k_max,
                jnp.int32(0)))
        _, meta = inflight.pop(0)
        int(np.asarray(meta['scalars'])[0])
    dt = (time.perf_counter() - t0) / n_iter
    return dt, t_compile, n0


def main():
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    n_seeds = 131072
    cfg = Namelist().replace(seed_batch=n_seeds)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    cfg = pipeline.auto_integrate_cap(jax.random.key(0), pack, cfg, 'GL')
    for u in unrolls:
        dt, t_c, n0 = measure(cfg.replace(scan_unroll=u), pack, n_seeds)
        print(f'unroll={u}: {dt * 1000:.1f} ms/launch '
              f'({n_seeds / dt * 60 / 1e6:.1f}M storms/min; survivors {n0}; '
              f'first call {t_c:.0f} s)', flush=True)


if __name__ == '__main__':
    main()
