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

import pytest  # noqa: E402


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
