"""Bisect stage A of the launch body (seed+fourier+compact+genesis).

bench_body_bisect measured stage A at ~23 ms device — 4x the old ~5 ms
propose_seeds attribution — and under the speculative quota prefix the
production year is essentially stage-A-bound (fused k=2 measures
~27 ms/sim-year).  Splits A into:

  1. propose_seeds alone
  2. draw_fourier alone
  3. the argsort compaction order + the 8 order-gathers
  4. genesis_alive on the compacted slots
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
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.ops import fourier

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

    def seeds_only(key):
        k_seed, _ = jax.random.split(key)
        prop = seeding.propose_seeds(k_seed, pack, cfg, 'GL', N, poff)
        return (prop.lon.sum() + prop.counted.sum() + prop.plane.sum()
                + prop.h_bl.sum() + prop.integrate.sum())

    timeit('1: propose_seeds', jax.jit(seeds_only), key)

    def fourier_only(key):
        _, k_fourier = jax.random.split(key)
        fs = fourier.draw_fourier(k_fourier, (N, cfg.n_wind_levels),
                                  cfg.T_fourier_s)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(fs))

    timeit('2: draw_fourier', jax.jit(fourier_only), key)

    def through_gathers(key):
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
        return (params.fourier.A.sum() + params.fourier.B.sum()
                + state.lon.sum() + state.m.sum() + prop.counted.sum()
                + g(prop.integrate).sum())

    timeit('3: 1+2 + argsort + order gathers', jax.jit(through_gathers), key)

    def full_a(key):
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

    timeit('4: A full (adds genesis_alive)', jax.jit(full_a), key)


if __name__ == '__main__':
    main()
