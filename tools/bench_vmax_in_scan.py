"""A/B the in-scan vmax diagnostic (Namelist.vmax_in_scan) at the bench
shape: the standalone axi_to_max_wind_raw pass re-reads every [T, m]
launch buffer from HBM (~14-18 ms of an ~85 ms launch, r4 decomposition),
while the in-scan form evaluates one elementwise sample per step from
values the scan already holds and fixes only each track's final valid
sample afterwards (diagnostics.fix_last_sample).
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


def run(cfg, pack, label, reps=5, blocks=3):
    launch = pipeline._simulate_batch
    tracks, meta = launch(jax.random.key(0), pack, cfg, 'GL', N, 64,
                          jnp.int32(0))
    s0 = np.asarray(meta['scalars'])
    dts = []
    for b in range(blocks):
        k0 = 1 + b * (reps + 1)
        inflight = [launch(jax.random.key(k0), pack, cfg, 'GL', N, 64,
                           jnp.int32(0))]
        t0 = time.perf_counter()
        for i in range(reps):
            if i + 1 < reps:
                inflight.append(launch(jax.random.key(k0 + i + 1), pack,
                                       cfg, 'GL', N, 64, jnp.int32(0)))
            _, meta = inflight.pop(0)
            np.asarray(meta['scalars'])
        dts.append((time.perf_counter() - t0) / reps)
    med = sorted(dts)[len(dts) // 2]
    print(f'{label}: {med * 1e3:.1f} ms/launch '
          f'(spread {min(dts)*1e3:.1f}-{max(dts)*1e3:.1f}), '
          f'survivors {int(s0[0])}', flush=True)
    return med


def main():
    cfg = Namelist().replace(seed_batch=N)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    cfg = pipeline.auto_integrate_cap(jax.random.key(0), pack, cfg, 'GL')
    print(f'm={pipeline.launch_width(cfg, N)}, '
          f'schedule={cfg.recompact_schedule}', flush=True)
    a = run(cfg.replace(vmax_in_scan=False), pack, 'post-pass vmax (False)')
    b = run(cfg.replace(vmax_in_scan=True), pack, 'in-scan vmax   (True)')
    print(f'delta: {(a - b) * 1e3:+.1f} ms ({a / b:.3f}x)', flush=True)


if __name__ == '__main__':
    main()
