"""Pure XLA gather rate on the chip: rows/s vs row width and dtype."""
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

R = 782000          # 12 planes x 181 x 360
B = 131072
STEPS = 361

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, B), jnp.int32)

for C, dtype in ((76, jnp.float32), (76, jnp.bfloat16), (8, jnp.float32),
                 (152, jnp.float32)):
    table = jnp.asarray(rng.normal(size=(R, C)), dtype)

    @jax.jit
    def many_gathers(table, idx):
        def step(carry, _):
            i = (idx + carry) % R
            g = jnp.take(table, i, axis=0)
            return carry + jnp.max(g).astype(jnp.int32) % 7 + 1, None
        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=STEPS)
        return c

    int(many_gathers(table, idx))   # warm
    t0 = time.perf_counter()
    int(many_gathers(table, idx))
    dt = time.perf_counter() - t0
    rows = B * STEPS
    print(f'C={C} {jnp.dtype(dtype).name}: {dt:.3f}s, '
          f'{dt / rows * 1e9:.1f} ns/row, '
          f'{rows * C * jnp.dtype(dtype).itemsize / dt / 1e9:.1f} GB/s',
          flush=True)
