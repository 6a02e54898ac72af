"""Decompose the per-step cost on the real chip: gather vs dynamics.

Times three scans of n_steps iterations over the batch: (a) field gather
only, (b) dynamics only (frozen field sample), (c) full step.  Identifies
whether the XLA gather is the ceiling before attempting a Pallas kernel.
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
from tropical_cyclone_risk_tpu.models import fast, fields
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.ops import fourier

N = 32768
STEPS = 1444   # 361 output steps x 4 RK stages equivalent
cfg = Namelist()
pack = jax.device_put(synthetic_pack(cfg, n_planes=12, nlat=181, nlon=360))
stacks = fields.build_stacks(pack)

key = jax.random.key(0)
fs = fourier.draw_fourier(key, (N, 4), cfg.T_fourier_s)
params = fast.SeedParams(plane=jnp.zeros(N, jnp.int32),
                         h_bl=jnp.full(N, 1400.0), fourier=fs)
lon0 = jax.random.uniform(key, (N,), minval=120.0, maxval=250.0)
lat0 = jax.random.uniform(key, (N,), minval=5.0, maxval=30.0)
y0 = fast.State(lon0, lat0, jnp.full(N, 15.0), jnp.full(N, 0.5))


@jax.jit
def gather_only(y0):
    def step(y, k):
        smp = fast.sample_fields(stacks, y.lon, y.lat, params.plane)
        # fold the sample back into position so the loop isn't DCE'd
        y2 = fast.State(y.lon + 1e-6 * smp.env[:, 0], y.lat + 1e-6 * smp.land,
                        y.v, y.m)
        return y2, None
    y, _ = jax.lax.scan(step, y0, jnp.arange(STEPS))
    return y.lon


@jax.jit
def dynamics_only(y0):
    smp0 = fast.sample_fields(stacks, y0.lon, y0.lat, params.plane)
    def step(y, k):
        d, _ = fast.rhs_from_sample(cfg, k.astype(jnp.float32) * 900.0, y,
                                    params, smp0)
        return fast.State(*(a + 900.0 * b for a, b in zip(y, d))), None
    y, _ = jax.lax.scan(step, y0, jnp.arange(STEPS))
    return y.lon


@jax.jit
def full_step(y0):
    def step(y, k):
        smp = fast.sample_fields(stacks, y.lon, y.lat, params.plane)
        d, _ = fast.rhs_from_sample(cfg, k.astype(jnp.float32) * 900.0, y,
                                    params, smp)
        return fast.State(*(a + 900.0 * b for a, b in zip(y, d))), None
    y, _ = jax.lax.scan(step, y0, jnp.arange(STEPS))
    return y.lon


for name, fn in (('gather_only', gather_only),
                 ('dynamics_only', dynamics_only),
                 ('full_step', full_step)):
    np.asarray(fn(y0))
    t0 = time.perf_counter()
    for _ in range(3):
        r = np.asarray(fn(y0))
    dt = (time.perf_counter() - t0) / 3
    print(f'{name}: {dt:.3f}s for {STEPS} steps x {N} seeds '
          f'({dt / STEPS * 1e6:.1f} us/step)', flush=True)
