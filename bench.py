"""Throughput benchmark: synthetic-storm lifecycles integrated per minute per chip.

The benchmark unit is the fused downscaling launch (propose seeds ->
361-step coupled FAST/beta-advection integration -> TC filters -> survivor
compaction) on an ERA5-resolution (1-degree, 12-month) global environment —
the hot path of the reference's run_downscaling (util/compute.py:64-210),
which integrates one storm at a time with scipy.solve_ivp.

Prints ONE JSON line.  vs_baseline is measured against the driver-set north
star of 100k storm lifecycles/min/chip (BASELINE.json; the reference itself
publishes no numbers — BASELINE.md)."""

import json
import time

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

NORTH_STAR_PER_MIN = 100_000.0


def main():
    n_seeds = 131072
    cfg = Namelist().replace(seed_batch=n_seeds)
    pack = synthetic_pack(cfg, n_planes=12, nlat=181, nlon=360, seed=0)
    pack = jax.device_put(pack)
    # resolve the integrate-compaction cap exactly as a production run does
    cfg = pipeline.auto_integrate_cap(jax.random.key(0), pack, cfg, 'GL')

    launch = pipeline._simulate_batch
    k_max = 64

    # warm-up / compile; the device->host fetch forces real completion
    # (block_until_ready through this image's TPU relay returns at enqueue)
    tracks, meta = launch(jax.random.key(0), pack, cfg, 'GL', n_seeds, k_max,
                          jnp.int32(0))
    int(np.asarray(meta['keep']).sum())

    # steady state: several launches with distinct keys (fresh RNG each);
    # each iteration ends in a host fetch of the full keep mask so the
    # measured time covers execution, not enqueue.  Two launches are kept
    # in flight (the production year loop does the same,
    # runtime.run_downscaling), so the host round-trip and dispatch
    # latency overlap device execution.
    n_iter = 5
    survivors = 0
    inflight = [launch(jax.random.key(1), pack, cfg, 'GL', n_seeds, k_max,
                       jnp.int32(0))]
    t0 = time.perf_counter()
    for i in range(n_iter):
        if i + 1 < n_iter:
            inflight.append(launch(jax.random.key(i + 2), pack, cfg, 'GL',
                                   n_seeds, k_max, jnp.int32(0)))
        tracks, meta = inflight.pop(0)
        survivors = int(np.asarray(meta['keep']).sum())
    dt = time.perf_counter() - t0

    per_min = n_seeds * n_iter / dt * 60.0
    dev = jax.devices()[0]
    print(json.dumps({
        'metric': 'storm_lifecycles_per_min_per_chip',
        'value': round(per_min, 1),
        'unit': 'storms/min/chip',
        'vs_baseline': round(per_min / NORTH_STAR_PER_MIN, 3),
        'detail': {
            'n_seeds_per_launch': n_seeds,
            'n_steps': cfg.n_steps_output,
            'launch_seconds': round(dt / n_iter, 4),
            'survivors_last_launch': survivors,
            'device': str(dev),
            'platform': dev.platform,
        },
    }))


if __name__ == '__main__':
    main()
