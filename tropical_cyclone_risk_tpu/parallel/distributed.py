"""Multi-host scaling over DCN.

The reference has no distributed backend at all (SURVEY.md section 5 —
dask 'processes' on one machine is its only parallelism).  Here multi-host
runs use jax.distributed: every host runs the same run_downscaling program,
the seed mesh spans all global devices, integration stays communication-free,
and the one compaction all-gather rides ICI within each slice / DCN across.
Host 0 writes the output file (tracks come back replicated).

Usage (same command on every host):

    from tropical_cyclone_risk_tpu.parallel import distributed, sharding
    distributed.initialize()             # env-driven, or pass explicit args
    mesh = distributed.global_seed_mesh()
    runtime.run_downscaling(cfg, basin, sharding.replicate_pack(pack, mesh),
                            mesh=mesh)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from tropical_cyclone_risk_tpu.parallel.sharding import SEED_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallback (JAX reads
    COORDINATOR_ADDRESS / cloud-TPU metadata when args are None).
    Idempotent: a repeat call and a bare single-host call (no coordinator
    configured anywhere) are both no-ops."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        # tolerated no-op cases: repeat initialization ('...should only be
        # called once.') or jax already running single-host ('must be called
        # before any JAX calls...')
        msg = str(e).lower()
        if not any(k in msg for k in ('once', 'already',
                                      'must be called before')):
            raise
    except ValueError as e:
        # single host without a coordinator address: nothing to set up
        if 'coordinator_address' not in str(e):
            raise


def global_seed_mesh() -> Mesh:
    """1-D seed mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (SEED_AXIS,))


def is_primary() -> bool:
    return jax.process_index() == 0
