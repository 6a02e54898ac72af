"""How does jnp.take row rate depend on the payload layout?

bench_order_micro measured the launch's Fourier-coefficient gathers
(take of [131072, 4, 15] f32 rows) at ~94 ns/row — ~8x the field-gather
row rate.  Times take([N, ...] , order[W]) for layouts of equal or
similar byte width, K iterations per program to amortize the relay floor.
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


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    # a fixed ascending slot-stable order (the launch's real index pattern)
    mask = np.random.default_rng(0).random(N) < 0.33
    order = jnp.asarray(np.flatnonzero(mask)[:W].astype(np.int32))
    pad = W - order.shape[0]
    if pad > 0:
        order = jnp.concatenate([order, jnp.full((pad,), N - 1, jnp.int32)])

    def loop(pay):
        def step(acc, j):
            o = order + j  # defeat CSE; stays in range for small j
            return acc + jnp.take(pay, o % N, axis=0).sum(), None
        def run(js):
            acc, _ = jax.lax.scan(step, jnp.float32(0), js)
            return acc
        return jax.jit(run)

    js = jnp.arange(K, dtype=jnp.int32)
    base = jax.random.normal(jax.random.key(1), (N, 128))

    t_floor = timeit('floor', loop(base[:, :1] * 0 + 1), js)  # [N,1] take
    print(f'[N, 1] take (floor-ish): {t_floor * 1e3:.1f} ms total',
          flush=True)

    for name, pay in [
        ('[N, 4, 15]', base[:, :60].reshape(N, 4, 15)),
        ('[N, 60]', base[:, :60]),
        ('[N, 64]', base[:, :64]),
        ('[N, 128]', base),
        ('[N, 8]', base[:, :8]),
        ('[N, 2, 64]', base.reshape(N, 2, 64)),
    ]:
        t = timeit(name, loop(pay), js)
        print(f'{name}: {t * 1e3:.1f} ms total, '
              f'{(t - t_floor) / K / W * 1e9:.1f} ns/row over floor',
              flush=True)


if __name__ == '__main__':
    main()
