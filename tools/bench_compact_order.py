"""Micro-bench: slot-stable compaction order on TPU.

The launch computes ~10 compaction orders per batch (seeding retries,
integrate-compaction, every boundary, survivor gather) as
``argsort(where(mask, slot, slot + n))[:w]`` — an O(n log^2 n) bitonic
sort.  The same order is a prefix-sum + scatter (O(n)):

    rank  = where(mask, cumsum(mask)-1, n_true + slot - cumsum(mask))
    order = zeros(n).at[rank].set(iota)      # rank is a permutation

Both are timed here (plus the take that consumes the order) to decide
whether the sorts are worth replacing.  Run on a quiet host.
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

N = 131072
W = 40960


def order_argsort(mask):
    slot = jnp.arange(N)
    return jnp.argsort(jnp.where(mask, slot, slot + N))[:W]


def order_scatter(mask):
    c = jnp.cumsum(mask.astype(jnp.int32))          # inclusive
    slot = jnp.arange(N, dtype=jnp.int32)
    rank = jnp.where(mask, c - 1, c[-1] + slot - c)
    return (jnp.zeros((N,), jnp.int32)
            .at[rank].set(slot, unique_indices=True))[:W]


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f'{name}: {dt * 1e3:.2f} ms', flush=True)


mask = jax.random.bernoulli(jax.random.key(0), 0.3, (N,))
a = np.asarray(jax.jit(order_argsort)(mask))
b = np.asarray(jax.jit(order_scatter)(mask))
print('identical:', np.array_equal(a, b), flush=True)

timeit('argsort order [131072]', jax.jit(order_argsort), mask)
timeit('scatter order [131072]', jax.jit(order_scatter), mask)

# the consuming gather (order -> take of a [N, 8] payload), for scale
pay = jax.random.normal(jax.random.key(1), (N, 8))
timeit('take [40960, 8]', jax.jit(lambda o: jnp.take(pay, o, axis=0)),
       jnp.asarray(a))
