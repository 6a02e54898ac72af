"""Does the scan cost scale with rows, or is there a per-block fixed cost?

The r4 launch-split attribution scaled per-row deltas from a full-width
scan to the launch's 6.7M rows and left ~40 ms of the ~80 ms device launch
unattributed.  Hypothesis: each scan *block* (stride steps) carries a
width-independent fixed cost, so the multi-segment schedule's narrow tail
segments save far fewer milliseconds than rows.  Measures:

1. the full launch with and without the re-compaction schedule;
2. one full-length block scan at widths m, m/2, m/4, m/8 -> fit
   t = f * n_blocks + r * rows.
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
from tropical_cyclone_risk_tpu.models import fast, pipeline, seeding, simulator
from tropical_cyclone_risk_tpu.models import fields as fields_mod
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.ops import fourier
from tropical_cyclone_risk_tpu.utils import basins as basins_mod

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
    T = cfg.n_steps_output
    stride = cfg.field_sample_stride
    print(f'm={m}, stride={stride}, schedule={cfg.recompact_schedule}',
          flush=True)

    t_relay = timeit('relay floor (x+1 on [8])', jax.jit(lambda x: x + 1),
                     jnp.zeros(8))

    launch = pipeline._simulate_batch
    timeit('launch (tuned schedule)',
           lambda k: launch(k, pack, cfg, 'GL', N, 64,
                            jnp.int32(0))[1]['scalars'], jax.random.key(1))
    cfg_1seg = cfg.replace(recompact_schedule=None, recompact_step=None,
                           recompact_cap=None)
    timeit('launch (single segment)',
           lambda k: launch(k, pack, cfg_1seg, 'GL', N, 64,
                            jnp.int32(0))[1]['scalars'], jax.random.key(1))

    # ---- block scans at decreasing widths ----
    stacks = fields_mod.build_stacks(pack)
    bounds = basins_mod.basin_bounds(cfg, 'GL')
    prop = jax.jit(lambda k: seeding.propose_seeds(
        k, pack, cfg, 'GL', N, jnp.int32(0)))(jax.random.key(4))
    fs = fourier.draw_fourier(jax.random.key(5), (N, cfg.n_wind_levels),
                              cfg.T_fourier_s)
    n_blocks = (T - 1) // stride

    meas = []
    for w in (m, m // 2, m // 4, m // 8):
        g = lambda a: a[:w]
        params = fast.SeedParams(plane=g(prop.plane), h_bl=g(prop.h_bl),
                                 fourier=fs._replace(A=g(fs.A), B=g(fs.B)))
        y0 = fast.State(g(prop.lon), g(prop.lat), g(prop.v_init),
                        g(prop.m_init))
        alive0 = jnp.ones((w,), bool)

        def run(y0, alive0, params):
            outs, carry = simulator.integrate_segment(
                stacks, cfg, bounds, y0, alive0, params, 0,
                n_blocks * stride)
            return sum(o.sum() for o in outs[:4]) + carry[0].lon.sum()

        t = timeit(f'segment scan [{w} x {n_blocks * stride}]',
                   jax.jit(run), y0, alive0, params)
        meas.append((w, t - t_relay))

    # least-squares fit: t = f * n_blocks + r * rows
    rows = np.array([w * n_blocks * stride for w, _ in meas], float)
    ts = np.array([t for _, t in meas], float)
    A = np.stack([np.full_like(rows, n_blocks), rows], axis=1)
    (f_fit, r_fit), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(f'\nfit: {f_fit * 1e6:.1f} us/block fixed + '
          f'{r_fit * 1e9:.2f} ns/row '
          f'(per-launch fixed at {n_blocks} blocks: '
          f'{f_fit * n_blocks * 1e3:.1f} ms)', flush=True)
    sched = pipeline.seg_schedule(cfg, m)
    edges, widths = pipeline.seg_edges_widths(sched, m, T)
    l_rows = sum(w * (edges[i + 1] - edges[i]) for i, w in enumerate(widths))
    print(f'predicted tuned-schedule scan: '
          f'{(f_fit * n_blocks + r_fit * l_rows) * 1e3:.1f} ms; '
          f'single-segment: '
          f'{(f_fit * n_blocks + r_fit * m * n_blocks * stride) * 1e3:.1f} '
          f'ms', flush=True)


if __name__ == '__main__':
    main()
