"""Directly time the per-launch fixed-cost components on the chip:
relay round-trip floor, seeding, genesis gates, compaction.  Each stage is
jitted alone and timed around a host fetch (block_until_ready through this
image's TPU relay returns at enqueue)."""
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
from tropical_cyclone_risk_tpu.models import fields as fields_mod
from tropical_cyclone_risk_tpu.models import diagnostics, fast, seeding
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.ops import fourier

N = 131072
cfg = Namelist().replace(seed_batch=N)
pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181, nlon=360,
                                     seed=0))


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    fetch = jax.tree_util.tree_leaves(out)[0]
    np.asarray(fetch)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f'{name}: {dt * 1e3:.1f} ms', flush=True)
    return dt


# 0. relay round-trip floor: trivial program
trivial = jax.jit(lambda x: x + 1)
x8 = jnp.zeros(8)
timeit('relay round-trip (x+1 on [8])', trivial, x8)

# 1. seeding (16-round rejection gathers, corner-packed)
prop_fn = jax.jit(lambda k: seeding.propose_seeds(k, pack, cfg, 'GL', N,
                                                  jnp.int32(0)))
timeit('propose_seeds', prop_fn, jax.random.key(0))

# 2. fourier draw
four_fn = jax.jit(lambda k: fourier.draw_fourier(
    k, (N, cfg.n_wind_levels), cfg.T_fourier_s))
timeit('draw_fourier', four_fn, jax.random.key(1))

# 3. ventilation gate (one gather + coloring)
prop = prop_fn(jax.random.key(0))
fs = four_fn(jax.random.key(1))
params = fast.SeedParams(plane=prop.plane, h_bl=prop.h_bl, fourier=fs)
y0 = seeding.initial_state(prop)
stacks_fn = jax.jit(lambda p: fields_mod.build_stacks(p))


def vent(pack_):
    stacks = fields_mod.build_stacks(pack_)
    return fast.ventilation_index_reject(stacks, cfg, y0, params)


timeit('ventilation gate', jax.jit(vent), pack)

# 4. compaction argsort on a keep mask
keep = jax.random.bernoulli(jax.random.key(2), 0.02, (N,))


def compact(kp):
    slot = jnp.arange(N)
    order = jnp.argsort(jnp.where(kp, slot, slot + N))[:64]
    return order


timeit('compaction argsort', jax.jit(compact), keep)

# 5. epilogue math on fake [T, N] buffers: tc filters + vmax
T = cfg.n_steps_output
key = jax.random.key(3)
lon = jnp.cumsum(jnp.ones((T, N)) * 0.01, axis=0) + 200.0
lat = jnp.ones((T, N)) * 20.0
v = jnp.ones((T, N)) * 20.0
wnds = jnp.zeros((T, N, 4))
alive = jnp.ones((T, N), bool)
last = jnp.full((N,), T - 1, jnp.int32)


def epi(lon, lat, v, wnds, alive, last):
    vmax, peak = diagnostics.axi_to_max_wind_raw(
        lon, lat, 3600.0, v, wnds, alive, last, cfg)
    return peak


timeit('vmax epilogue [361, 131072]', jax.jit(epi), lon, lat, v, wnds,
       alive, last)
