"""Bisect the unattributed ~50 ms of the tuned launch.

bench_width_scaling measured: tuned launch ~86 ms device, its scan ~30 ms
(5.2 ns/row, row-linear), seeding ~3 ms, vmax ~2 ms — leaving ~50 ms
unattributed.  This reconstructs launch_body stage by stage (same code
paths, scalar-reduced outputs) to find it.
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
from tropical_cyclone_risk_tpu.models import (diagnostics, fast, pipeline,
                                              seeding, simulator)
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
    print(f'm={m}, schedule={cfg.recompact_schedule}', flush=True)

    timeit('relay floor', jax.jit(lambda x: x + 1), jnp.zeros(8))

    key = jax.random.key(1)
    poff = jnp.int32(0)

    # stage A: seeding + fourier + compaction order + genesis gates
    def stage_a(key):
        k_seed, k_fourier = jax.random.split(key)
        prop = seeding.propose_seeds(k_seed, pack, cfg, 'GL', N, poff)
        fs = fourier.draw_fourier(k_fourier, (N, cfg.n_wind_levels),
                                  cfg.T_fourier_s)
        slot = jnp.arange(N)
        order = jnp.argsort(jnp.where(prop.integrate, slot, slot + N))[:m]
        g = lambda a: jnp.take(a, order, axis=0)
        params = fast.SeedParams(plane=g(prop.plane), h_bl=g(prop.h_bl),
                                 fourier=fourier.take_leading(fs, order))
        state = fast.State(g(prop.lon), g(prop.lat), g(prop.v_init),
                           g(prop.m_init))
        alive0 = simulator.genesis_alive(pack, cfg, state, params,
                                         g(prop.integrate))
        return (params.fourier.A.sum() + state.lon.sum()
                + alive0.sum() + prop.counted.sum())

    timeit('A: seed+fourier+compact+genesis', jax.jit(stage_a), key)

    # stage B: A + the multi-segment scan chain (no vmax, no stitches)
    def segments(key):
        k_seed, k_fourier = jax.random.split(key)
        prop = seeding.propose_seeds(k_seed, pack, cfg, 'GL', N, poff)
        fs = fourier.draw_fourier(k_fourier, (N, cfg.n_wind_levels),
                                  cfg.T_fourier_s)
        slot = jnp.arange(N)
        order = jnp.argsort(jnp.where(prop.integrate, slot, slot + N))[:m]
        g = lambda a: jnp.take(a, order, axis=0)
        params = fast.SeedParams(plane=g(prop.plane), h_bl=g(prop.h_bl),
                                 fourier=fourier.take_leading(fs, order))
        state = fast.State(g(prop.lon), g(prop.lat), g(prop.v_init),
                           g(prop.m_init))
        T = cfg.n_steps_output
        sched = pipeline.seg_schedule(cfg, m)
        edges, widths = pipeline.seg_edges_widths(sched, m, T)
        stacks = fields_mod.build_stacks(pack)
        bounds = basins_mod.basin_bounds(cfg, 'GL')
        alive0 = simulator.genesis_alive(pack, cfg, state, params,
                                         g(prop.integrate))
        raws = []
        state_k, alive_k, params_k = state, alive0, params
        prev_w = m
        for k, w in enumerate(widths):
            t0, t1 = edges[k], edges[k + 1]
            if k > 0:
                slot = jnp.arange(prev_w)
                order_k = jnp.argsort(
                    jnp.where(alive_k, slot, slot + prev_w))[:w]
                gk = lambda a, o=order_k: jnp.take(a, o, axis=0)
                params_k = fast.SeedParams(
                    plane=gk(params_k.plane), h_bl=gk(params_k.h_bl),
                    fourier=fourier.take_leading(params_k.fourier,
                                                 order_k))
                state_k = fast.State(*(gk(x) for x in state_k))
                alive_k = gk(alive_k)
            outs, (y_end, alive_end) = simulator.integrate_segment(
                stacks, cfg, bounds, state_k, alive_k, params_k, t0,
                t1 - t0)
            raws.append(outs)
            state_k, alive_k = y_end, alive_end
            prev_w = w
        return sum(r[0].sum() + r[2].sum() + r[5].sum() for r in raws)

    timeit('B: A + segment scans', jax.jit(segments), key)

    # stage C: the full launch_body (scalar-reduced)
    def body_only(key):
        body = pipeline.launch_body(key, pack, cfg, 'GL', N, poff)
        return (body['trk']['keep'].sum()
                + body['tm']['lon'].sum() + body['overflow'].sum())

    timeit('C: full launch_body', jax.jit(body_only), key)

    # stage D: body + compact_survivors (= the real launch program)
    def full(key):
        body = pipeline.launch_body(key, pack, cfg, 'GL', N, poff)
        tracks, meta = pipeline.compact_survivors(
            body, m, 64, n_basins=len(cfg.basin_ids_sorted()))
        return meta['scalars']

    timeit('D: body + compact_survivors', jax.jit(full), key)

    t = timeit('E: the real _simulate_batch',
               lambda k: pipeline._simulate_batch(
                   k, pack, cfg, 'GL', N, 64, poff)[1]['scalars'], key)
    del t


if __name__ == '__main__':
    main()
