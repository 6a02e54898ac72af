"""Measure K-fused launches: K proposal batches in ONE device program.

Hypothesis (docs/performance.md, launch cost model): at the stride-3
default the launch's device work is ~60 ms while the relay charges a
~40 ms per-PROGRAM dispatch round trip that 2-deep pipelining only
partly hides.  Scanning K launch bodies inside one program keeps every
scan width identical to a single launch (unlike widening the batch,
which degrades the per-row gather rate) while amortizing the dispatch
overhead K-fold.

Run on a quiet host (no concurrent pytest): the 2-deep pipeline's
feed/fetch loop is host-side.
"""
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
simulate_fused = pipeline._simulate_batches


def main():
    cfg = Namelist().replace(seed_batch=N)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    cfg = pipeline.auto_integrate_cap(jax.random.key(0), pack, cfg, 'GL')
    print(f'caps: integrate={cfg.integrate_cap} sched={cfg.recompact_schedule}',
          flush=True)

    # baseline: single-launch 2-deep pipeline (bench.py pattern)
    launch = pipeline._simulate_batch
    tracks, meta = launch(jax.random.key(0), pack, cfg, 'GL', N, 64,
                          jnp.int32(0))
    int(np.asarray(meta['scalars'])[0])
    n_iter = 6
    inflight = [launch(jax.random.key(1), pack, cfg, 'GL', N, 64,
                       jnp.int32(0))]
    t0 = time.perf_counter()
    for i in range(n_iter):
        if i + 1 < n_iter:
            inflight.append(launch(jax.random.key(i + 2), pack, cfg, 'GL',
                                   N, 64, jnp.int32(0)))
        tracks, meta = inflight.pop(0)
        int(np.asarray(meta['scalars'])[0])
    dt = (time.perf_counter() - t0) / n_iter
    print(f'single: {dt:.4f} s/launch = {N / dt * 60 / 1e6:.1f}M storms/min',
          flush=True)

    for K in (2, 4, 8):
        keys = jax.random.split(jax.random.key(10), K)
        t_c0 = time.perf_counter()
        out = simulate_fused(keys, pack, cfg, 'GL', N, 64, jnp.int32(0))
        s = np.asarray(out[1]['scalars'])
        print(f'K={K} compile+run: {time.perf_counter() - t_c0:.1f} s '
              f'(survivors/batch {s[:, 0].tolist()})', flush=True)
        reps = max(2, 6 // K)
        inflight = [simulate_fused(jax.random.split(jax.random.key(11), K),
                                   pack, cfg, 'GL', N, 64, jnp.int32(0))]
        t0 = time.perf_counter()
        for i in range(reps):
            if i + 1 < reps:
                inflight.append(simulate_fused(
                    jax.random.split(jax.random.key(12 + i), K), pack, cfg,
                    'GL', N, 64, jnp.int32(0)))
            out = inflight.pop(0)
            int(np.asarray(out[1]['scalars'])[0, 0])
        dt = (time.perf_counter() - t0) / (reps * K)
        print(f'K={K}: {dt:.4f} s/launch-equiv = '
              f'{N / dt * 60 / 1e6:.1f}M storms/min', flush=True)


if __name__ == '__main__':
    main()
