"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (SURVEY.md section 4e).

This image's sitecustomize force-registers a remote-TPU PJRT plugin and
overrides the JAX_PLATFORMS env var, so env vars alone do NOT select the CPU
backend — the jax.config update below is the authoritative switch (it takes
precedence over the hijacked env as long as it runs before the first jax op).
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)
# persistent compile cache: the expensive programs (the fused launches,
# 15-60 s each on CPU) recompile in EVERY pytest process otherwise —
# warm-cache suite reruns drop by minutes, and fewer in-process compiles
# also dodge the XLA CPU compiler's segfault flake (CLAUDE.md), which
# strikes after ~100-150 compiles in one process.  Keys include platform
# + HLO, so sharing the TPU tools' cache dir is safe.
jax.config.update('jax_compilation_cache_dir', '/root/.jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

assert len(jax.devices()) == 8, (
    'expected 8 virtual CPU devices; backend hijack not defeated: '
    f'{jax.devices()}')

# ---------------------------------------------------------------------------
# XLA-CPU compile-crash fence (VERDICT r4 item 6).  The XLA CPU compiler in
# this image segfaults nondeterministically after ~100s of in-process
# compiles (CLAUDE.md "KNOWN FLAKE"; tools/repro_compile_crash.py).
# tools/run_tests.sh splits the suite so no process crosses the trigger, but
# the split is group-membership-sensitive: adding compiles to a group would
# silently re-arm the crash.  This counter keeps the fence honest: every
# real backend compile (cache hits excluded — the monitoring event fires
# inside backend_compile only) is counted, and when TC_COMPILE_BUDGET is set
# (run_tests.sh sets it) the test that crosses the budget ERRORS loudly with
# the fix spelled out, instead of the group sliding toward the segfault.
# ---------------------------------------------------------------------------
_BACKEND_COMPILES = [0]


def _count_backend_compile(event, duration, **kw):
    if event == '/jax/core/compile/backend_compile_duration':
        _BACKEND_COMPILES[0] += 1


jax.monitoring.register_event_duration_secs_listener(_count_backend_compile)

import pytest  # noqa: E402

_COMPILE_BUDGET = int(os.environ.get('TC_COMPILE_BUDGET', '0'))
_budget_tripped = [False]


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_teardown(item):
    yield
    n = _BACKEND_COMPILES[0]
    if _COMPILE_BUDGET and n > _COMPILE_BUDGET and not _budget_tripped[0]:
        _budget_tripped[0] = True       # error once, not on every later test
        raise RuntimeError(
            f'compile-crash fence: this pytest process has performed {n} '
            f'backend compiles, over the TC_COMPILE_BUDGET={_COMPILE_BUDGET} '
            f'guard (the XLA-CPU segfault flake strikes nondeterministically '
            f'in processes with many hundreds of compiles — CLAUDE.md / '
            f'tools/repro_compile_crash.py; 2026-08-19 group maxima: 683). '
            f'Split this group in tools/run_tests.sh (move '
            f'{item.nodeid.split("::")[0]} or a compile-heavy sibling to its '
            f'own process) instead of raising the budget.')


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    n = _BACKEND_COMPILES[0]
    if n:
        terminalreporter.write_line(
            f'[compile fence] {n} backend compiles in this process'
            + (f' (budget {_COMPILE_BUDGET})' if _COMPILE_BUDGET else
               ' (no TC_COMPILE_BUDGET set; the XLA-CPU compiler flake '
               'strikes at many hundreds of in-process compiles — use '
               'tools/run_tests.sh for full-suite runs)'))


def pytest_addoption(parser):
    parser.addoption(
        '--slow', action='store_true', default=False,
        help='include tests marked slow (the full lane: large-sample '
             'parity fixtures, notebook execution, multi-process runs)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: multi-minute test, excluded from the default '
        'lane; run with --slow (or TC_FULL_SUITE=1)')


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r3 item 7): `pytest -q` is the fast inner
    loop; `pytest -q --slow` (or TC_FULL_SUITE=1, for CI / round gates)
    runs everything."""
    if config.getoption('--slow') or os.environ.get('TC_FULL_SUITE'):
        return
    skip = pytest.mark.skip(
        reason='slow lane: pass --slow or set TC_FULL_SUITE=1')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
