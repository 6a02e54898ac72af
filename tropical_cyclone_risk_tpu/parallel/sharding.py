"""Multi-chip scaling: data parallelism over the seed axis.

The reference scales by forking one OS process per simulated year over a
16-worker dask pool (util/compute.py:223-230, namelist.py:34).  The TPU-native
equivalent is a 1-D device mesh over the *seed* axis: seeds are fully
independent until the final survivor compaction, so the integration scan runs
communication-free on every chip and only the tiny compaction step moves data
over ICI (one all-gather of the keep mask + a cross-device take of the few
surviving tracks).

Environmental field packs are small (1-degree global monthly stacks, tens of
MB) and are replicated into every chip's HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import diagnostics, fast, seeding, simulator
from tropical_cyclone_risk_tpu.models.fields import FieldPack
from tropical_cyclone_risk_tpu.ops import fourier

SEED_AXIS = 'seeds'


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over all (or the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f'requested {n_devices} devices, have {len(devs)}')
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (SEED_AXIS,))


def replicate_pack(pack: FieldPack, mesh: Mesh) -> FieldPack:
    """Place every field array replicated on the mesh (fields are small;
    the seed axis carries all the scale)."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), pack)


@functools.lru_cache(maxsize=32)
def _build_sharded_batch(mesh: Mesh, cfg: Namelist, basin_id: str,
                         n: int, k_max: int):
    """Compile the fused propose->integrate->filter launch SPMD over the mesh.

    Layout: every [n, ...] per-seed array is sharded on axis 0; the field
    pack and the PRNG key are replicated.  The integration is embarrassingly
    parallel; compaction after the shard_map does the only collectives.
    """
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f'seed batch {n} not divisible by {n_dev} devices')
    n_local = n // n_dev

    def local_shard(key, plane_offset, pack: FieldPack):
        # decorrelate shards: fold the device index into the key
        d = jax.lax.axis_index(SEED_AXIS)
        k_seed, k_fourier = jax.random.split(jax.random.fold_in(key, d))
        prop = seeding.propose_seeds(k_seed, pack, cfg, basin_id, n_local,
                                     plane_offset)
        fs = fourier.draw_fourier(k_fourier, (n_local, cfg.n_wind_levels),
                                  cfg.T_fourier_s)
        params = fast.SeedParams(plane=prop.plane, h_bl=prop.h_bl, fourier=fs)
        out = simulator.integrate(pack, cfg, basin_id,
                                  seeding.initial_state(prop), params,
                                  prop.integrate)
        is_tc, _ = simulator.tc_filters(cfg, out)
        vmax = diagnostics.axi_to_max_wind(out.lon, out.lat,
                                           float(cfg.output_interval_s),
                                           out.v, out.wnds)
        keep = is_tc & diagnostics.vmax_filter(cfg, vmax)
        return (keep, prop.counted, prop.basin_idx, prop.month,
                out.lon, out.lat, out.v, out.m, vmax, out.wnds)

    sharded = jax.shard_map(
        local_shard, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(SEED_AXIS),
        check_vma=False)

    def launch(key, plane_offset, pack: FieldPack):
        (keep, counted, basin_idx, month,
         lon, lat, v, m, vmax, wnds) = sharded(key, plane_offset, pack)
        # survivor compaction (slot order): the only cross-chip step
        slot = jnp.arange(n)
        order = jnp.argsort(jnp.where(keep, slot, slot + n))[:k_max]
        rep = NamedSharding(mesh, P())
        g = lambda a: jax.lax.with_sharding_constraint(
            jnp.take(a, order, axis=0), rep)
        tracks = {'lon': g(lon), 'lat': g(lat), 'v': g(v), 'm': g(m),
                  'vmax': g(vmax), 'wnds': g(wnds),
                  'month': g(month), 'basin_idx': g(basin_idx),
                  'valid': g(keep)}
        meta = {'keep': keep, 'counted': counted,
                'basin_idx': basin_idx, 'month': month}
        return tracks, meta

    rep = NamedSharding(mesh, P())
    return jax.jit(launch, in_shardings=(rep, rep, rep))


def simulate_batch_sharded(mesh: Mesh, key: jax.Array, pack: FieldPack,
                           cfg: Namelist, basin_id: str, n: int, k_max: int,
                           plane_offset) -> Tuple[dict, dict]:
    """SPMD equivalent of pipeline._simulate_batch over a seed mesh."""
    fn = _build_sharded_batch(mesh, cfg, basin_id, n, k_max)
    return fn(key, jnp.asarray(plane_offset, jnp.int32), pack)
