"""Floor-amortized micro-bench of the compaction-order idioms.

bench_compact_order.py timed each variant as its OWN program, so anything
under the ~25 ms relay floor read as "free" — but bench_stage_a.py shows
the argsort + order gathers cost ~10 ms inside the launch.  Here each
variant runs K times inside ONE program (lax.scan over fresh masks), so
per-iteration resolution is ~floor/K ~ 0.5 ms.
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
K = 64


def order_argsort(mask, n=N, w=W):
    slot = jnp.arange(n)
    return jnp.argsort(jnp.where(mask, slot, slot + n))[:w]


def order_scatter(mask, n=N, w=W):
    c = jnp.cumsum(mask.astype(jnp.int32))
    slot = jnp.arange(n, dtype=jnp.int32)
    rank = jnp.where(mask, c - 1, c[-1] + slot - c)
    return (jnp.zeros((n,), jnp.int32)
            .at[rank].set(slot, unique_indices=True))[:w]


def loop(body):
    """Scan body over K fresh uint32 seeds; returns a scalar."""
    def step(acc, s):
        mask = jax.random.bernoulli(jax.random.wrap_key_data(
            jnp.array([0, s], jnp.uint32).view(jnp.uint32)), 0.3, (N,))
        return acc + body(mask).astype(jnp.float32), None
    def run(seeds):
        acc, _ = jax.lax.scan(step, jnp.float32(0), seeds)
        return acc
    return run


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f'{name}: {dt * 1e3:.1f} ms total', flush=True)
    return dt


def main():
    seeds = jnp.arange(K, dtype=jnp.uint32)
    t_floor = timeit('floor: mask only',
                     jax.jit(loop(lambda m: m.sum(dtype=jnp.float32))),
                     seeds)

    t_sort = timeit('argsort order x64',
                    jax.jit(loop(lambda m: order_argsort(m).sum())), seeds)
    t_scat = timeit('scatter order x64',
                    jax.jit(loop(lambda m: order_scatter(m).sum())), seeds)
    print(f'  per-iter: argsort {(t_sort - t_floor) / K * 1e3:.2f} ms, '
          f'scatter {(t_scat - t_floor) / K * 1e3:.2f} ms', flush=True)

    # the fourier-coefficient order gather: [131072, 4, 15] x2 -> [40960,...]
    A = jax.random.normal(jax.random.key(1), (N, 4, 15))
    B = jax.random.normal(jax.random.key(2), (N, 4, 15))
    def gather_body(m):
        o = order_scatter(m)
        return jnp.take(A, o, axis=0).sum() + jnp.take(B, o, axis=0).sum()
    t_g = timeit('scatter order + A/B gathers x64',
                 jax.jit(loop(gather_body)), seeds)
    print(f'  per-iter gathers: {(t_g - t_scat) / K * 1e3:.2f} ms',
          flush=True)

    # small-width order (the quota-prefix production case)
    t_sort_q = timeit('argsort order W=1280 x64',
                      jax.jit(loop(lambda m: order_argsort(m, w=1280).sum())),
                      seeds)
    t_scat_q = timeit('scatter order W=1280 x64',
                      jax.jit(loop(lambda m: order_scatter(m, w=1280).sum())),
                      seeds)
    print(f'  per-iter: argsort {(t_sort_q - t_floor) / K * 1e3:.2f} ms, '
          f'scatter {(t_scat_q - t_floor) / K * 1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
