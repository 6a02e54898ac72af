"""Micro-decomposition of the launch's vmax pass + candidate-gather probe.

The r4 launch split (tools/bench_launch_split.py) put the vmax diagnostic
(axi_to_max_wind_raw over every integrated row, ~6.7M/launch) at ~16-18 ms
— as large as the field gathers.  But `keep = is_tc & (peak >= thr)` means
vmax/peak is only ever NEEDED for the is_tc slots (~8% of the integrate
width on the bench environment); the rest is discarded.  This tool answers
two questions on the chip:

1. where inside axi_to_max_wind_raw the time goes (translation haversines,
   shear/G increment, the last-sample fix-up, the peak reduction);
2. what compacting the TC candidates to a narrow bucket FIRST would cost:
   column gathers of the 9 track channels at w_tc columns (take on axis 1
   of the time-major [T, m] buffers) vs the vmax rows it saves.

Run on a quiet host.
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

from tropical_cyclone_risk_tpu.models import diagnostics

T = 361
M = 40960
W_TC = 5120     # candidate bucket (~1/8 of m, is_tc rate ~8% on bench env)
DT = 3600.0


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f'{name}: {dt * 1e3:.2f} ms', flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # representative track buffers: smooth-ish positions, storms die along
    # the track (alive prefix), winds O(10 m/s)
    lon = jnp.asarray(np.cumsum(rng.normal(0.1, 0.05, (T, M)), axis=0)
                      + rng.uniform(120, 240, (1, M)), jnp.float32)
    lat = jnp.asarray(np.cumsum(rng.normal(0.05, 0.03, (T, M)), axis=0)
                      + rng.uniform(5, 30, (1, M)), jnp.float32)
    v = jnp.asarray(rng.uniform(4, 40, (T, M)), jnp.float32)
    m_ = jnp.asarray(rng.uniform(0, 1, (T, M)), jnp.float32)
    wnds = jnp.asarray(rng.normal(0, 8, (T, M, 4)), jnp.float32)
    last = jnp.asarray(rng.integers(10, T, (M,)), jnp.int32)
    alive = jnp.arange(T)[:, None] <= last[None, :]

    print(f'buffers: [T={T}, m={M}], w_tc={W_TC}', flush=True)
    t_relay = timeit('relay floor (x+1 on [8])', jax.jit(lambda x: x + 1),
                     jnp.zeros(8))

    # ---- the full pass, scalar-reduced output ----
    full = jax.jit(lambda *a: tuple(
        x.sum() for x in diagnostics.axi_to_max_wind_raw(*a, DT)))
    # note: positional signature is (lon, lat, dt, v, wnds, alive, last)
    full = jax.jit(lambda lon, lat, v, wnds, alive, last: tuple(
        x.sum() for x in diagnostics.axi_to_max_wind_raw(
            lon, lat, DT, v, wnds, alive, last)))
    t_full = timeit('axi_to_max_wind_raw [T,m]', full,
                    lon, lat, v, wnds, alive, last)

    # ---- pieces ----
    def trans_only(lon, lat):
        first = lambda x, b: jnp.concatenate([b[None], x[:-1]], axis=0)
        pad0 = lambda x: first(x, 2 * x[0] - x[1])
        lastr = lambda x, a: jnp.concatenate([x[1:], a[None]], axis=0)
        ut, vt = diagnostics._translation_tm(
            lon, lat, pad0(lon), pad0(lat), lastr(lon, lon[-1]),
            lastr(lat, lat[-1]), DT)
        return ut.sum() + vt.sum()

    timeit('  translation only', jax.jit(trans_only), lon, lat)

    def inc_only(lat, v, wnds):
        G = jnp.minimum(1.0, 0.8 + 0.35 * (1.0 + jnp.tanh((lat - 35.0) / 10.0)))
        u_shr = wnds[..., 0] - wnds[..., 2]
        v_shr = wnds[..., 1] - wnds[..., 3]
        U = G * 1.0 + 0.1 * u_shr * v / 15.0
        V = G * 1.0 + 0.1 * v_shr * v / 15.0
        mag = jnp.sqrt(U ** 2 + V ** 2)
        return diagnostics._vmax_from_inc(v, mag).sum()

    timeit('  G/shear/inc only', jax.jit(inc_only), lat, v, wnds)

    def peak_only(v, alive):
        return jnp.max(jnp.where(alive, v, -jnp.inf), axis=0).sum()

    timeit('  peak reduction only', jax.jit(peak_only), v, alive)

    def fixup_only(lon, lat, last):
        take = lambda x, i: jnp.take_along_axis(
            x, jnp.clip(i, 0, x.shape[0] - 1)[None, :], axis=0)[0]
        L = last
        Lm1 = jnp.maximum(L - 1, 0)
        lon_L, lat_L = take(lon, L), take(lat, L)
        lon_P, lat_P = take(lon, Lm1), take(lat, Lm1)
        ut_L, vt_L = diagnostics._translation_tm(
            lon_L, lat_L, lon_P, lat_P, lon_L + (lon_L - lon_P),
            lat_L + (lat_L - lat_P), DT)
        at_L = jnp.arange(lon.shape[0])[:, None] == L[None, :]
        ut = jnp.where(at_L, ut_L[None, :], 0.0)
        return ut.sum() + vt_L.sum()

    timeit('  last-sample fix-up only', jax.jit(fixup_only), lon, lat, last)

    # ---- candidate column gathers: cost of narrowing first ----
    idx = jnp.asarray(np.sort(rng.choice(M, W_TC, replace=False)), jnp.int32)

    def col_gather(lon, lat, v, m_, wnds, alive, idx):
        g = lambda a: jnp.take(a, idx, axis=1)
        return tuple(g(a) for a in (lon, lat, v, m_, wnds,
                                    alive.astype(jnp.float32)))

    t_cols = timeit('column gather 9ch [T, w_tc] (take axis=1)',
                    jax.jit(lambda *a: tuple(
                        x.sum() for x in col_gather(*a, idx))),
                    lon, lat, v, m_, wnds, alive)

    def col_gather_tr(lon, lat, v, m_, wnds, alive, idx):
        # transpose-to-seed-major first, then contiguous row gathers
        g = lambda a: jnp.take(jnp.moveaxis(a, 1, 0), idx, axis=0)
        return tuple(g(a) for a in (lon, lat, v, m_, wnds,
                                    alive.astype(jnp.float32)))

    timeit('column gather via transpose+row-take',
           jax.jit(lambda *a: tuple(
               x.sum() for x in col_gather_tr(*a, idx))),
           lon, lat, v, m_, wnds, alive)

    # ---- the narrow vmax pass itself ----
    g = lambda a: jnp.take(a, idx, axis=1)
    lon_c, lat_c, v_c, wnds_c = g(lon), g(lat), g(v), jnp.take(wnds, idx,
                                                               axis=1)
    alive_c, last_c = g(alive), jnp.take(last, idx)
    full_c = jax.jit(lambda lon, lat, v, wnds, alive, last: tuple(
        x.sum() for x in diagnostics.axi_to_max_wind_raw(
            lon, lat, DT, v, wnds, alive, last)))
    t_narrow = timeit('axi_to_max_wind_raw [T, w_tc]', full_c,
                      lon_c, lat_c, v_c, wnds_c, alive_c, last_c)

    # ---- fused: gather + narrow vmax in one program ----
    def fused(lon, lat, v, wnds, alive, last, idx):
        g = lambda a: jnp.take(a, idx, axis=1)
        vm, pk = diagnostics.axi_to_max_wind_raw(
            g(lon), g(lat), DT, g(v), jnp.take(wnds, idx, axis=1),
            g(alive), jnp.take(last, idx))
        return vm.sum() + pk.sum()

    t_fused = timeit('fused gather+narrow vmax', jax.jit(fused),
                     lon, lat, v, wnds, alive, last, idx)

    base = t_full - t_relay
    alt = t_fused - t_relay
    print(f'\nestimated saving per launch segment-equivalent: '
          f'{(base - alt) * 1e3:.2f} ms '
          f'(full {base * 1e3:.2f} -> candidate path {alt * 1e3:.2f})',
          flush=True)


if __name__ == '__main__':
    main()
