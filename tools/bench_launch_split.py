"""Decompose the post-stride launch on the chip (VERDICT r3 item 2).

BENCH_r03: 0.0901 s/launch at 131072 seeds, 6.7M scan rows, of which
~1/3 are gather steps ~= 25 ms — so the old "~100% gather-bound" story is
stale and the real remainder (dynamics arithmetic? output-buffer writes?
coloring? compaction epilogue? seeding?) was unattributed.

Method: time ONE scan segment at the real integrate width (m =
launch_width at the auto cap) for a full-length stride-3 block scan, in
ablation variants that each remove one cost class; per-row-step deltas
then scale to the launch's actual row count (the multi-segment schedule
only changes widths, not per-row work).  Fixed per-launch stages
(seeding, epilogue/compaction, relay dispatch) are timed separately.

Run on a quiet host (the 2-deep pipeline's feed/fetch loop is host-side).
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
from tropical_cyclone_risk_tpu.models import fast, pipeline, seeding
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
    sched = pipeline.seg_schedule(cfg, m)
    edges, widths = pipeline.seg_edges_widths(sched, m, T)
    rows = sum(w * (edges[i + 1] - edges[i]) for i, w in enumerate(widths))
    print(f'integrate width m={m}, stride={stride}, launch rows={rows}',
          flush=True)

    # ---- baseline: the real full launch ----
    launch = pipeline._simulate_batch
    t_launch = timeit(
        'full launch', lambda k: launch(k, pack, cfg, 'GL', N, 64,
                                        jnp.int32(0))[1]['scalars'],
        jax.random.key(1))

    # ---- fixed stages ----
    # scalar-reduced: fetching the [N] lon array costs ~2x the relay floor
    # in transfer alone and would masquerade as device time
    t_seed = timeit('propose_seeds', jax.jit(
        lambda k: seeding.propose_seeds(k, pack, cfg, 'GL', N,
                                        jnp.int32(0)).lon.sum()),
        jax.random.key(2))
    t_four = timeit('draw_fourier', jax.jit(
        lambda k: fourier.draw_fourier(k, (N, cfg.n_wind_levels),
                                       cfg.T_fourier_s).A.sum()),
        jax.random.key(3))
    t_disp = timeit('relay floor (x+1 on [8])', jax.jit(lambda x: x + 1),
                    jnp.zeros(8))

    # ---- scan variants at width m, one segment, T-1 steps ----
    stacks = fields_mod.build_stacks(pack)
    bounds = basins_mod.basin_bounds(cfg, 'GL')
    prop = jax.jit(lambda k: seeding.propose_seeds(
        k, pack, cfg, 'GL', N, jnp.int32(0)))(jax.random.key(4))
    fs = fourier.draw_fourier(jax.random.key(5), (N, cfg.n_wind_levels),
                              cfg.T_fourier_s)
    g = lambda a: a[:m]
    params = fast.SeedParams(plane=g(prop.plane), h_bl=g(prop.h_bl),
                             fourier=fs._replace(A=g(fs.A), B=g(fs.B)))
    y0 = fast.State(g(prop.lon), g(prop.lat), g(prop.v_init), g(prop.m_init))
    alive0 = jnp.ones((m,), bool)
    n_blocks = (T - 1) // stride
    n_steps = n_blocks * stride
    dt_out = float(cfg.output_interval_s)
    seg_rows = m * n_steps

    stacks_meta = stacks
    params_meta = params

    def scan_variant(big, y0, alive0, gather_per_block=True,
                     n_stages=4, color_per_step=True, write_outputs=True,
                     events=True):
        # rebuild stacks/params from the big arrays passed as jit ARGUMENTS
        # (closure capture would bake ~100 MB of field/Fourier buffers into
        # the HLO as constants and blow the remote-compile relay's
        # request-body limit, HTTP 413); grid metadata and channel counts
        # stay static via the *_meta closures
        cell4, land_geo4, bathy4, A, B = big
        stacks = stacks_meta._replace(cell4=cell4, land_geo4=land_geo4,
                                      bathy4=bathy4)
        params = params_meta._replace(
            fourier=params_meta.fourier._replace(A=A, B=B))
        ks_all = jnp.arange(n_steps)
        f_all = params.fourier.evaluate_grid(
            ks_all.astype(jnp.float32) * dt_out)
        kb = stride * jnp.arange(n_blocks)
        f_blk = f_all.reshape((n_blocks, stride) + f_all.shape[1:])
        smp0 = fast.sample_fields_at_time(stacks, cfg, y0.lon, y0.lat,
                                          params.plane, 0.0)
        wnds0 = fast.color_winds_given_f(cfg, smp0.wind_stats, f_blk[0, 0])

        def block(carry, x):
            y, alive = carry
            k, f_s = x
            t0 = k.astype(jnp.float32) * dt_out
            smp = (fast.sample_fields_at_time(stacks, cfg, y.lon, y.lat,
                                              params.plane, t0)
                   if gather_per_block else smp0)
            outs = []
            for j in range(stride):
                t = t0 + j * dt_out
                wnds = (fast.color_winds_given_f(cfg, smp.wind_stats, f_s[j])
                        if color_per_step else wnds0)
                rhs_fn = lambda tt, yy, w=wnds: fast.rhs_given_winds(
                    cfg, tt, yy, params, smp, w)
                if n_stages == 4:
                    k1, _ = rhs_fn(t, y)
                    add = lambda a, ka, h: fast.State(
                        *(x_ + h * dx for x_, dx in zip(a, ka)))
                    k2, _ = rhs_fn(t + dt_out / 2, add(y, k1, dt_out / 2))
                    k3, _ = rhs_fn(t + dt_out / 2, add(y, k2, dt_out / 2))
                    k4, _ = rhs_fn(t + dt_out, add(y, k3, dt_out))
                    y_next = fast.State(
                        *(x_ + dt_out / 6 * (a + 2 * b + 2 * c + d)
                          for x_, a, b, c, d in zip(y, k1, k2, k3, k4)))
                else:
                    k1, _ = rhs_fn(t, y)
                    y_next = fast.State(*(x_ + dt_out * dx
                                          for x_, dx in zip(y, k1)))
                if write_outputs:
                    outs.append((y.lon, y.lat, y.v, y.m, wnds, alive))
                y = fast.State(*(jnp.where(alive, a, b)
                                 for a, b in zip(y_next, y)))
                if events:
                    in_b = basins_mod.in_basin(y.lon, y.lat, bounds, 1.0)
                    alive = alive & in_b & (jnp.abs(y.lat) > 2.0) \
                        & (y.v > 4.0)
            if write_outputs:
                out = tuple(jnp.stack(ch) for ch in zip(*outs))
            else:
                out = None
            return (y, alive), out

        carry_end, outs = jax.lax.scan(block, (y0, alive0), (kb, f_blk))
        y_end, alive_end = carry_end
        acc = y_end.lon.sum() + y_end.v.sum() + alive_end.sum()
        if outs is not None:
            acc = acc + sum(o.sum() for o in outs[:4]) + outs[4].sum()
        return acc

    variants = [
        ('scan full', dict()),
        ('scan no-output-writes', dict(write_outputs=False)),
        ('scan no-gather (frozen fields)', dict(gather_per_block=False)),
        ('scan euler (1 rhs stage)', dict(n_stages=1)),
        ('scan frozen coloring', dict(color_per_step=False)),
        ('scan no-events', dict(events=False)),
        ('scan floor (all ablations)', dict(
            gather_per_block=False, n_stages=1, color_per_step=False,
            write_outputs=False, events=False)),
    ]
    big = (stacks.cell4, stacks.land_geo4, stacks.bathy4,
           params.fourier.A, params.fourier.B)
    t_full = None
    for name, kw in variants:
        fn = jax.jit(lambda bg, y, a, kw=kw: scan_variant(bg, y, a, **kw))
        t = timeit(f'{name} [{m} x {n_steps}]', fn, big, y0, alive0)
        if t_full is None:
            t_full = t
        else:
            d = t_full - t
            print(f'   -> delta vs full: {d * 1e3:.1f} ms '
                  f'({d / seg_rows * 1e9:.2f} ns/row; launch share '
                  f'~{d / seg_rows * rows * 1e3:.1f} ms)', flush=True)

    # ---- epilogue pieces (the ~35 ms unattributed slice) ----
    from tropical_cyclone_risk_tpu.models import diagnostics

    kd = jax.random.split(jax.random.key(9), 6)
    lon_t = 140.0 + 10 * jax.random.normal(kd[0], (n_steps, m))
    lat_t = 20.0 + 5 * jax.random.normal(kd[1], (n_steps, m))
    v_t = 20.0 + 5 * jax.random.normal(kd[2], (n_steps, m))
    wnds_t = 5.0 * jax.random.normal(kd[3], (n_steps, m,
                                              cfg.n_wind_levels))
    alive_t = jnp.ones((n_steps, m), bool)
    ls = jnp.full((m,), n_steps - 1, jnp.int32)

    t_vmax = timeit(f'axi_to_max_wind_raw [{m} x {n_steps}]', jax.jit(
        lambda lo, la, v, w, al, l: diagnostics.axi_to_max_wind_raw(
            lo, la, float(cfg.output_interval_s), v, w, al, l, cfg
        )[0].sum()), lon_t, lat_t, v_t, wnds_t, alive_t, ls)
    print(f'   -> launch share ~{t_vmax / seg_rows * rows * 1e3:.1f} ms '
          f'(x2: segments recompute boundary columns)', flush=True)

    # argsort-based stable partition (the compaction idiom) vs the
    # cumsum+scatter equivalent, at integrate-compaction width
    keep = jax.random.bernoulli(kd[4], 0.07, (N,))

    def part_argsort(k):
        slot = jnp.arange(N)
        return jnp.argsort(jnp.where(k, slot, slot + N))[:m].sum()

    def part_cumsum(k):
        slot = jnp.arange(N, dtype=jnp.int32)
        n_keep = jnp.cumsum(k.astype(jnp.int32))
        pos = jnp.where(k, n_keep - 1, n_keep[-1] + slot - n_keep)
        order = jnp.zeros((N,), jnp.int32).at[pos].set(slot)
        return order[:m].sum()

    t_sort = timeit(f'stable partition argsort [{N}]',
                    jax.jit(part_argsort), keep)
    t_csum = timeit(f'stable partition cumsum+scatter [{N}]',
                    jax.jit(part_cumsum), keep)

    print(f'\nsummary: launch {t_launch * 1e3:.1f} ms; seeding '
          f'{t_seed * 1e3:.1f}; fourier {t_four * 1e3:.1f}; relay floor '
          f'{t_disp * 1e3:.1f}; full-seg scan {t_full * 1e3:.1f} ms for '
          f'{seg_rows} rows -> scaled to launch rows '
          f'{t_full / seg_rows * rows * 1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
