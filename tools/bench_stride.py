"""Measure the launch-rate effect of field_sample_stride on the TPU.

One auto-tune pass (stride 1) resolves the compaction schedule; each stride
then reuses that schedule (seg_schedule snaps boundaries to stride
multiples, and the tuned boundaries are multiples of 30 anyway) so the
only new compile per stride is the launch program itself.

Run from the repo root with the default (axon) platform and a QUIET host:
    python tools/bench_stride.py [strides...]
"""

import sys
import time

import jax

from tools import _tpu_cache  # noqa: F401
import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import pipeline
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack


def measure(cfg, pack, n_seeds, n_iter=6):
    launch = pipeline._simulate_batch
    k_max = 64
    t_c = time.perf_counter()
    tracks, meta = launch(jax.random.key(0), pack, cfg, 'GL', n_seeds,
                          k_max, jnp.int32(0))
    n0 = int(np.asarray(meta['keep']).sum())
    t_compile = time.perf_counter() - t_c
    survivors = 0
    inflight = [launch(jax.random.key(1), pack, cfg, 'GL', n_seeds, k_max,
                       jnp.int32(0))]
    t0 = time.perf_counter()
    for i in range(n_iter):
        if i + 1 < n_iter:
            inflight.append(launch(jax.random.key(i + 2), pack, cfg, 'GL',
                                   n_seeds, k_max, jnp.int32(0)))
        tracks, meta = inflight.pop(0)
        survivors += int(np.asarray(meta['keep']).sum())
    dt = (time.perf_counter() - t0) / n_iter
    return dt, survivors / n_iter, n0, t_compile


def main():
    strides = [int(s) for s in sys.argv[1:]] or [1, 2, 3]
    n_seeds = 131072
    cfg = Namelist().replace(seed_batch=n_seeds)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    t0 = time.perf_counter()
    cfg = pipeline.auto_integrate_cap(jax.random.key(0), pack, cfg, 'GL')
    print(f'auto-tune: cap={cfg.integrate_cap} '
          f'schedule={cfg.recompact_schedule} '
          f'({time.perf_counter() - t0:.1f} s)', flush=True)
    for s in strides:
        cfg_s = cfg.replace(field_sample_stride=s)
        dt, surv, n0, t_c = measure(cfg_s, pack, n_seeds)
        print(f'stride={s}: {dt:.4f} s/launch = '
              f'{n_seeds / dt * 60 / 1e6:.1f}M storms/min, '
              f'{surv:.0f} survivors/launch (warmup {n0}; '
              f'compile+first {t_c:.1f} s)', flush=True)


if __name__ == '__main__':
    main()
