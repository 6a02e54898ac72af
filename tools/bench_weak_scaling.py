"""Weak-scaling shape check on the virtual CPU mesh (VERDICT r2 item 6).

Runs the SHARDED launch (parallel.sharding.simulate_batch_sharded) at
1/2/4/8 devices with seed_batch growing proportionally, so per-device work
is constant.  If the sharded design is communication-free over the seed
axis (it is: integration does no collectives; only the final survivor
compaction all-gathers a [N] bool mask plus <=k_max track rows), wall time
per launch should stay ~flat as devices are added.

This measures the *shape* of scaling, not absolute speed — virtual CPU
devices time-share the host's core(s) (this image has ONE), so N virtual
devices doing N x the work costs ~N x the wall time even for a perfectly
parallel program.  What the numbers CAN establish, and what the assertion
below pins, is that the per-seed cost stays FLAT as devices are added:
slowdown/work <= ~1.15 means the sharded program adds no super-linear
collective or serialization cost (the seed axis is communication-free;
only the final survivor compaction all-gathers a [N] bool mask plus
<= k_max track rows).  Measuring slowdown *below* work/1.15 would require
as many host cores as devices.  On real v5e chips the per-device
resources are genuinely independent and the ICI all-gather of one bool
mask per launch is microseconds, so the expected pod-scaling is linear in
chips (gather-row-bound: each chip integrates its own seeds against its
own HBM copy of the fields; see docs/performance.md).

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_weak_scaling.py
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tropical_cyclone_risk_tpu.config import Namelist  # noqa: E402
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack  # noqa: E402
from tropical_cyclone_risk_tpu.parallel import sharding  # noqa: E402

PER_DEVICE_SEEDS = 2048
N_ITER = 3


def main():
    n_avail = len(jax.devices())
    rows = []
    for n_dev in (1, 2, 4, 8):
        if n_dev > n_avail:
            break
        mesh = sharding.make_mesh(n_dev)
        n_seeds = PER_DEVICE_SEEDS * n_dev
        cfg = Namelist().replace(seed_batch=n_seeds, integrate_cap=0.5)
        pack = sharding.replicate_pack(
            synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0),
            mesh)
        # compile + warm
        _, meta = sharding.simulate_batch_sharded(
            mesh, jax.random.key(0), pack, cfg, 'GL', n_seeds, 16,
            jnp.int32(0))
        int(np.asarray(meta['keep']).sum())
        t0 = time.perf_counter()
        for i in range(N_ITER):
            _, meta = sharding.simulate_batch_sharded(
                mesh, jax.random.key(i + 1), pack, cfg, 'GL', n_seeds, 16,
                jnp.int32(0))
            int(np.asarray(meta['keep']).sum())
        dt = (time.perf_counter() - t0) / N_ITER
        rows.append({'devices': n_dev, 'seeds': n_seeds,
                     'launch_s': round(dt, 3),
                     'seeds_per_s': round(n_seeds / dt, 1),
                     'per_device_s': round(dt, 3)})
        print(f'devices={n_dev} seeds={n_seeds} launch={dt:.3f}s '
              f'({n_seeds / dt:.0f} seeds/s)', flush=True)

    if len(rows) >= 2:
        # weak-scaling shape on time-shared cores: per-seed cost must stay
        # flat (slowdown <= work x 1.15) — any super-linear collective or
        # serialization cost in the sharded program would push it higher.
        slowdown = rows[-1]['launch_s'] / rows[0]['launch_s']
        work = rows[-1]['devices'] / rows[0]['devices']
        per_seed_ratio = slowdown / work
        print(f'slowdown at {rows[-1]["devices"]} devices: '
              f'{slowdown:.2f}x for {work:.0f}x work -> per-seed cost '
              f'ratio {per_seed_ratio:.3f} (flat=1.0 on a time-shared '
              f'host; >1.15 = super-linear sharding cost)')
        assert per_seed_ratio < 1.15, (
            'sharded launch has super-linear cost: per-seed ratio '
            f'{per_seed_ratio:.3f}')
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
