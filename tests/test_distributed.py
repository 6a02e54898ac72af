"""Two-process jax.distributed integration test (VERDICT round 1, item 5).

Spawns two coordinated CPU processes (4 virtual devices each -> a global
8-device seed mesh over gloo collectives) running the real sharded pipeline,
then asserts:

  - the key broadcast and global mesh assemble (worker-side asserts),
  - both processes compute identical replicated survivor populations,
  - both agree on the output path but only the primary writes it.

The reference has no distributed backend at all (SURVEY.md section 5); this
covers the repo's own multi-host commitment (parallel/distributed.py), which
otherwise only ever ran single-process.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
WORKER = Path(__file__).parent / 'distributed_worker.py'
REPO = Path(__file__).parent.parent


def test_two_process_distributed(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = f"{REPO}{os.pathsep}" + env.get('PYTHONPATH', '')
    port = '29731'
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(i), str(tmp_path), port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f'worker {i} failed:\n{outs[i][-4000:]}'

    r0 = np.load(tmp_path / 'proc0.npz')
    r1 = np.load(tmp_path / 'proc1.npz')
    assert int(r0['n_global_devices']) == 8
    assert int(r0['process_index']) == 0 and int(r1['process_index']) == 1

    # same output path on both hosts; written exactly once, by the primary
    assert str(r0['fn']) == str(r1['fn'])
    assert os.path.exists(str(r0['fn']))
    assert int(r0['writes']) == 1, 'primary must write'
    assert int(r1['writes']) == 0, 'non-primary must not write'

    # replicated survivor populations agree bit-for-bit across processes
    np.testing.assert_array_equal(r0['month'], r1['month'])
    np.testing.assert_array_equal(r0['n_seeds'], r1['n_seeds'])
    np.testing.assert_array_equal(r0['vmax'], r1['vmax'])
    np.testing.assert_array_equal(r0['lon'], r1['lon'])
    assert r0['month'].shape[0] == 2          # quota filled
