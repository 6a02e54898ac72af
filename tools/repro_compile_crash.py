"""Standalone repro for the XLA-CPU in-process compile-crash flake.

Observed 2026-08-18/19 (CLAUDE.md "KNOWN FLAKE"): pytest processes that
compile many hundreds of distinct programs crash nondeterministically —
SIGSEGV inside `backend_compile_and_load`, or SIGABRT in the compile-cache
executable serialize — a DIFFERENT victim test each time, every victim
green standalone, reproduced with and without the persistent compile
cache.  The canonical test lane (tools/run_tests.sh) fences it by splitting
the suite into processes and erroring when a process crosses
TC_COMPILE_BUDGET backend compiles (tests/conftest.py).

This script is the fence's evidence base: it performs N distinct compiles
(mixing plain jit, shard_map over an 8-virtual-device mesh, and donated
buffers — the suite's program mix) in ONE process and reports either
survival or the crash point.  Run it when re-calibrating the budget:

    python tools/repro_compile_crash.py [N=1500]

A clean exit prints `survived N compiles`; the flake manifests as a
non-zero wait status (segfault/abort) with the last progress line showing
how far it got.  Because the crash is nondeterministic, several runs (or a
larger N) may be needed — treat "survived" as weak evidence only.

Results log:
  2026-08-19  survived 1500 (tanh/psum/donate mix) and 400 (scan-in-
              shard_map mix) — the flake did not reproduce on demand the
              day the fence went in; it remains a ~1-in-several-hundred-
              compile-process event by the 2026-08-18/19 pytest
              observations (7 crashes across two days of heavy runs).
"""
import os
import sys

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# real compiles every time: the point is compiler stress, not cache hits
jax.config.update('jax_compilation_cache_dir', None)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402


def main(n_total: int = 1500) -> None:
    mesh = Mesh(np.asarray(jax.devices()), ('seed',))
    x = jnp.arange(1024.0, dtype=jnp.float32)

    for i in range(n_total):
        kind = i % 3
        if kind == 0:               # plain jit, unique constant -> unique HLO
            f = jax.jit(lambda a, c=float(i): jnp.tanh(a * c).sum())
            out = f(x)
        elif kind == 1:             # sharded scan (the suite's heavy mix)
            def body(a, c=float(i)):
                def step(carry, _):
                    carry = jnp.tanh(carry * 1.01 + c)
                    return carry, carry.sum()
                carry, ys = jax.lax.scan(step, a, None, length=8)
                return jax.lax.psum(ys.sum() + carry.sum(), 'seed')
            f = jax.jit(shard_map(body, mesh=mesh, in_specs=P('seed'),
                                  out_specs=P()))
            out = f(x)
        else:                       # donated buffer (serialize-path variant)
            f = jax.jit(lambda a, c=float(i): a * c + 1.0,
                        donate_argnums=0)
            out = f(x + 0.0)
        np.asarray(out)
        if (i + 1) % 50 == 0:
            print(f'{i + 1} compiles ok', flush=True)

    print(f'survived {n_total} compiles')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
