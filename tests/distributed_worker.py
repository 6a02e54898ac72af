"""Worker program for the two-process jax.distributed test (spawned by
tests/test_distributed.py).  Runs the real sharded pipeline over the global
8-device (2 process x 4 local CPU device) seed mesh and records what this
process observed, so the parent test can assert cross-process agreement and
the primary-only write contract.

Usage: python distributed_worker.py PROC_ID TMPDIR PORT
"""

import os
import sys

proc_id = int(sys.argv[1])
tmpdir = sys.argv[2]
port = sys.argv[3]

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

import numpy as np  # noqa: E402

from tropical_cyclone_risk_tpu import runtime  # noqa: E402
from tropical_cyclone_risk_tpu.config import Namelist  # noqa: E402
from tropical_cyclone_risk_tpu.models import pipeline  # noqa: E402
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack  # noqa: E402
from tropical_cyclone_risk_tpu.parallel import distributed, sharding  # noqa: E402


def main():
    distributed.initialize(f'localhost:{port}', 2, proc_id)
    assert jax.process_count() == 2, jax.process_count()
    mesh = distributed.global_seed_mesh()
    assert mesh.devices.size == 8, mesh

    cfg = Namelist(seed_batch=512, tracks_per_year=2,
                   start_year=2016, end_year=2016,
                   output_directory=tmpdir, exp_name='dist')
    pack = synthetic_pack(cfg, n_planes=12, nlat=46, nlon=90, seed=0)
    pack = sharding.replicate_pack(pack, mesh)

    # count local output writes (only the primary may write)
    writes = {'n': 0}
    orig_write = runtime.write_tracks_nc

    def counting_write(path, out, cfg_):
        writes['n'] += 1
        return orig_write(path, out, cfg_)
    runtime.write_tracks_nc = counting_write

    # key=None exercises the wall-clock broadcast path (all processes must
    # agree on the replicated key)
    fn = runtime.run_downscaling(cfg, 'GL', pack, key=None, mesh=mesh)

    # a second, deterministic-key pass through run_tracks_year records the
    # replicated survivor arrays for cross-process comparison
    yt = pipeline.run_tracks_year(jax.random.key(7), pack, cfg, 'GL', 0,
                                  mesh=mesh)

    np.savez(os.path.join(tmpdir, f'proc{proc_id}.npz'),
             fn=np.array(fn), writes=np.int32(writes['n']),
             process_index=np.int32(jax.process_index()),
             n_global_devices=np.int32(len(jax.devices())),
             month=yt.month, vmax=np.nan_to_num(yt.vmax),
             lon=np.nan_to_num(yt.lon), n_seeds=yt.n_seeds)
    print(f'worker {proc_id} done', flush=True)


if __name__ == '__main__':
    main()
