"""Bisect the launch epilogue (bench_body_bisect stage C - stage B ~ 18 ms).

Candidates: the per-segment vmax diagnostic, the is_tc/last_step stitched
reductions, or the segs/keep_full scatters.  Each variant monkeypatches one
block out of launch_body (same program shape otherwise) and times the
scalar-reduced body.
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
from tropical_cyclone_risk_tpu.models import diagnostics, pipeline
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack

N = 131072


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f'{name}: {dt * 1e3:.1f} ms', flush=True)
    return dt


def main():
    cfg = Namelist().replace(seed_batch=N)
    pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181,
                                         nlon=360, seed=0))
    cfg = pipeline.auto_integrate_cap(jax.random.key(0), pack, cfg, 'GL')
    m = pipeline.launch_width(cfg, N)
    print(f'm={m}', flush=True)

    timeit('relay floor', jax.jit(lambda x: x + 1), jnp.zeros(8))

    key = jax.random.key(1)
    poff = jnp.int32(0)

    def body_sum(key):
        body = pipeline.launch_body(key, pack, cfg, 'GL', N, poff)
        return (body['trk']['keep'].sum()
                + body['tm']['lon'].sum() + body['overflow'].sum())

    timeit('C0: full launch_body', jax.jit(body_sum), key)

    # C1: vmax pass stubbed (constant vmax/peak of the right shapes)
    real_vmax = diagnostics.axi_to_max_wind_raw

    def fake_vmax(lon, lat, dt_track, tc_v, env_wnds, alive, last_step,
                  cfg=None, pos_before=None, pos_after=None):
        return tc_v * 1.0001, jnp.max(jnp.where(alive, tc_v, -jnp.inf),
                                      axis=0)

    diagnostics.axi_to_max_wind_raw = fake_vmax
    pipeline.diagnostics.axi_to_max_wind_raw = fake_vmax
    try:
        timeit('C1: vmax stubbed', jax.jit(body_sum), key)
    finally:
        diagnostics.axi_to_max_wind_raw = real_vmax
        pipeline.diagnostics.axi_to_max_wind_raw = real_vmax

    # C2: vmax stubbed AND the translation fix-up removed is covered by C1;
    # next isolate the stitched reductions by pointing the threshold filters
    # at constants: monkeypatch jnp-level is hard, so instead reduce only
    # through tm (keep the scan) and recompute keep as alive[0]
    def body_no_stitch(key):
        body = pipeline.launch_body(key, pack, cfg, 'GL', N, poff)
        # touch only scan outputs + the full-width seed side
        return (body['tm']['lon'].sum() + body['tm']['alive'].sum()
                + sum(t['lon'].sum() for t in body.get('tms', ()))
                + body['seed']['counted'].sum() + body['overflow'].sum())

    timeit('C3: keep/vmax dead (DCE probe)', jax.jit(body_no_stitch), key)


if __name__ == '__main__':
    main()
