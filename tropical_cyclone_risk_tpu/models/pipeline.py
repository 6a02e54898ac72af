"""Downscaling pipeline: seeding -> integration -> filtering -> compaction.

Reference equivalent: ``run_tracks`` / ``run_downscaling``
(util/compute.py:64-270).  The reference integrates one seed at a time inside
a rejection loop, one process per year; here each device launch proposes and
integrates a whole batch of seeds, survivors are compacted on device (only
the few surviving tracks are ever pulled to the host), and the host loop
repeats until the per-year track quota fills.

Stopping-rule parity: the reference counts seeds only until the final quota
track survives.  Every batch slot carries a global sequence number, so after
the quota fills the seed counts are truncated at the exact slot of the final
survivor — statistically identical to the reference's interleaved loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import diagnostics, fast, seeding, simulator
from tropical_cyclone_risk_tpu.models.fields import FieldPack
from tropical_cyclone_risk_tpu.ops import fourier


@dataclasses.dataclass
class YearTracks:
    """Survivor tracks of one simulated year (reference run_tracks output,
    util/compute.py:210)."""
    lon: np.ndarray          # [n_tracks, n_steps]
    lat: np.ndarray
    v: np.ndarray
    m: np.ndarray
    vmax: np.ndarray
    wnds: np.ndarray         # [n_tracks, n_steps, W]
    month: np.ndarray        # [n_tracks]
    basin_idx: np.ndarray    # [n_tracks] index into basin_ids_sorted()
    n_seeds: np.ndarray      # [n_basins, 12]


def launch_width(cfg: Namelist, n: int) -> int:
    """Width m of the integration scan for an n-seed proposal batch:
    ceil(n * integrate_cap) rounded up to a 256 lane-tile multiple.
    integrate_cap=None (auto mode, resolved by the runtime through
    auto_integrate_cap) means uncapped for direct launches."""
    if cfg.integrate_cap is None or cfg.integrate_cap >= 1.0:
        return n
    m = int(-(-int(n * cfg.integrate_cap) // 256) * 256)
    return min(n, max(256, m))


# auto_integrate_cap chooses among these (coarse on purpose: every distinct
# width is a separate XLA program, and the remote-compile latency of this
# image is minutes — sixteenths balance gather savings vs compile reuse)
INTEGRATE_CAP_BUCKETS = tuple(i / 16.0 for i in range(2, 17))


def auto_integrate_cap(key, pack: FieldPack, cfg: Namelist, basin_id: str,
                       margin: float = 1.15) -> Namelist:
    """Resolve integrate_cap=None by measuring the environment.

    Runs one seeding pass (exactly year 0 / batch 0's proposal stream: the
    same key splits as launch_body), fetches the integrable fraction, and
    picks the smallest cap bucket covering it with `margin` headroom.  The
    fraction is a property of the environment (PI coverage x basin
    geometry), stable across batches — measured spreads are < 1% absolute
    — so one probe per run suffices; the uncapped-fallback in
    run_tracks_year covers any straggler batch.  Costs one extra seeding
    dispatch (~tens of ms) per run."""
    if cfg.integrate_cap is not None:
        return cfg
    from tropical_cyclone_risk_tpu.models import fields as fields_mod
    pack_y0 = fields_mod.slice_pack_year(pack, cfg, 0)
    k_seed, _ = jax.random.split(jax.random.fold_in(key, 0))
    prop = seeding.propose_seeds(k_seed, pack_y0, cfg, basin_id,
                                 cfg.seed_batch,
                                 jnp.int32(cfg.start_month - 1))
    frac = float(np.asarray(prop.integrate.mean(dtype=jnp.float32)))
    target = min(1.0, frac * margin + 1.0 / 64.0)
    cap = next(b for b in INTEGRATE_CAP_BUCKETS if b >= target)
    return cfg.replace(integrate_cap=cap)


def launch_body(key, pack: FieldPack, cfg: Namelist, basin_id: str, n: int,
                plane_offset):
    """Propose n seeds, integrate, filter — the per-seed work of one launch.
    Shared by the single-device and shard_map paths (parallel.sharding).

    Integrate-compaction: most slots fail the seeding gates at step 0
    (util/compute.py:160-169) but the scan's per-slot-per-step field gather
    is the entire launch cost, so the integrable slots are compacted (in
    slot order) to the front m = launch_width(cfg, n) positions and only
    those enter the scan.  The Fourier flow is still drawn at full batch
    width and gathered, so every slot keeps its exact per-slot RNG stream:
    survivor tracks are bit-identical to an uncapped launch.  'overflow'
    counts integrable seeds beyond the cap (the host falls back to an
    uncapped launch for that batch when it is nonzero).

    Returns {'seed': full-width [n] counting metadata,
             'trk': compacted [m] per-track metadata,
             'tm': time-major [T, m(, W)] track buffers,
             'overflow': [1] int32} — the scan-native layout, so no
    full-batch transpose or NaN-masking pass ever touches the [m, 361]
    buffers (compact_survivors does both on the few survivors instead)."""
    k_seed, k_fourier = jax.random.split(key)
    prop = seeding.propose_seeds(k_seed, pack, cfg, basin_id, n, plane_offset)
    fs = fourier.draw_fourier(k_fourier, (n, cfg.n_wind_levels),
                              cfg.T_fourier_s)
    m = launch_width(cfg, n)
    if m < n:
        slot = jnp.arange(n)
        # integrable slots first, each class in slot order (stable), so the
        # compacted axis preserves the reference's slot-sequential semantics
        order = jnp.argsort(jnp.where(prop.integrate, slot, slot + n))[:m]
        overflow = jnp.maximum(
            prop.integrate.sum(dtype=jnp.int32) - m, 0)[None]
        g = lambda a: jnp.take(a, order, axis=0)
    else:
        order = None
        overflow = jnp.zeros((1,), jnp.int32)
        g = lambda a: a
    params = fast.SeedParams(plane=g(prop.plane), h_bl=g(prop.h_bl),
                             fourier=fs._replace(A=g(fs.A), B=g(fs.B)))
    state = fast.State(g(prop.lon), g(prop.lat), g(prop.v_init),
                       g(prop.m_init))
    if cfg.m_init_mode == 'dvdt0':
        state = state._replace(m=fast.init_m_dvdt0(
            pack, cfg, state.lon, state.lat, state.v, params))
    raw = simulator.integrate_raw(pack, cfg, basin_id, state, params,
                                  g(prop.integrate))
    is_tc, _ = simulator.tc_filters_raw(cfg, raw)
    vmax, peak = diagnostics.axi_to_max_wind_raw(
        raw.lon, raw.lat, float(cfg.output_interval_s), raw.v, raw.wnds,
        raw.alive, raw.last_step, cfg)
    keep = is_tc & (peak >= cfg.seed_vmax_threshold_ms)
    # full-width keep (for the stopping rule's slot-sequential cumsum):
    # scatter the compacted verdicts back to their original slots
    keep_full = (keep if order is None else
                 jnp.zeros((n,), bool).at[order].set(keep))
    return {
        'seed': {'keep': keep_full, 'counted': prop.counted,
                 'month': prop.month, 'basin_idx': prop.basin_idx},
        'trk': {'keep': keep, 'month': g(prop.month),
                'basin_idx': g(prop.basin_idx)},
        'tm': {'lon': raw.lon, 'lat': raw.lat, 'v': raw.v, 'm': raw.m,
               'vmax': vmax, 'wnds': raw.wnds, 'alive': raw.alive},
        'overflow': overflow,
    }


def compact_survivors(body: dict, m: int, k_max: int,
                      constrain=lambda a: a):
    """Survivors first in slot order, truncated to k_max; returns the
    (tracks, meta) launch contract ([k_max, T] NaN-masked track buffers).
    m is the integration width (launch_width per device, summed over the
    mesh on the sharded path).  constrain: optional per-array sharding
    constraint applied to the gathered tracks."""
    seed, trk, tm = body['seed'], body['trk'], body['tm']
    keep = trk['keep']
    slot = jnp.arange(m)
    order = jnp.argsort(jnp.where(keep, slot, slot + m))[:k_max]
    g = lambda a: constrain(jnp.take(a, order, axis=0))
    # time-major gather: pick survivor columns, then transpose / NaN-mask
    # only the [T, k_max] result
    gt = lambda a: constrain(jnp.moveaxis(jnp.take(a, order, axis=1), 0, 1))
    alive_g = gt(tm['alive'])
    nan = jnp.float32(jnp.nan)
    mask = lambda x: jnp.where(alive_g if x.ndim == alive_g.ndim
                               else alive_g[..., None], x, nan)
    tracks = {
        'lon': mask(gt(tm['lon'])), 'lat': mask(gt(tm['lat'])),
        'v': mask(gt(tm['v'])), 'm': mask(gt(tm['m'])),
        'vmax': mask(gt(tm['vmax'])), 'wnds': mask(gt(tm['wnds'])),
        'month': g(trk['month']), 'basin_idx': g(trk['basin_idx']),
        'valid': g(keep),
    }
    # meta stays full batch width ([n] slot metadata for the stopping rule;
    # only scalars and a [basin, 12] table derived from it are ever fetched)
    meta = {'keep': constrain(seed['keep']),
            'counted': constrain(seed['counted']),
            'basin_idx': constrain(seed['basin_idx']),
            'month': constrain(seed['month']),
            'overflow': constrain(body['overflow'])}
    return tracks, meta


@functools.partial(jax.jit, static_argnames=('cfg', 'basin_id', 'n', 'k_max'))
def _simulate_batch(key, pack: FieldPack, cfg: Namelist, basin_id: str,
                    n: int, k_max: int, plane_offset):
    """One fused device launch: propose n seeds, integrate, filter, compact.

    Returns per-slot metadata plus the first k_max surviving tracks
    (slot-ordered).  This function is the throughput benchmark unit.
    """
    body = launch_body(key, pack, cfg, basin_id, n, plane_offset)
    return compact_survivors(body, launch_width(cfg, n), k_max)


@jax.jit
def _batch_scalars(meta):
    """(survivor count, integrate-cap overflow) as one tiny fetch."""
    return jnp.stack([meta['keep'].sum(dtype=jnp.int32),
                      meta['overflow'].sum(dtype=jnp.int32)])


@functools.partial(jax.jit, static_argnames=('n_basins',))
def _count_seeds_all(counted, basin_idx, month, n_basins: int):
    """seeds_per_month [n_basins, 12] of a whole batch, on device (avoids
    fetching the [N] per-slot metadata through the slow host relay)."""
    idx = basin_idx * 12 + (month - 1)
    return (jnp.zeros((n_basins * 12,), jnp.int32)
            .at[idx].add(counted.astype(jnp.int32))
            .reshape(n_basins, 12))


@functools.partial(jax.jit, static_argnames=('n_basins',))
def _count_seeds_upto(keep, counted, basin_idx, month, j, n_basins: int):
    """seeds_per_month over slots up to (and including) the (j+1)-th
    survivor's slot — the reference's stopping rule applied on device."""
    cs = jnp.cumsum(keep.astype(jnp.int32))
    cutoff = jnp.argmax(cs == (j + 1))        # first slot reaching j+1
    in_prefix = jnp.arange(keep.shape[0]) <= cutoff
    return _count_seeds_all(counted & in_prefix, basin_idx, month, n_basins)


def _dispatch_batch(bkey, pack_y: FieldPack, cfg: Namelist, basin_id: str,
                    N: int, k_max: int, plane_off, mesh):
    """Enqueue one launch (async under jax dispatch) on the year-sliced pack."""
    if mesh is not None:
        from tropical_cyclone_risk_tpu.parallel import sharding
        return sharding.simulate_batch_sharded(
            mesh, bkey, pack_y, cfg, basin_id, N, k_max, plane_off)
    return _simulate_batch(bkey, pack_y, cfg, basin_id, N, k_max, plane_off)


def prefetch_year_batch0(key: jax.Array, pack: FieldPack, cfg: Namelist,
                         basin_id: str, year_idx: int,
                         n_tracks: Optional[int] = None, mesh=None):
    """Dispatch (without blocking) a year's first seed batch; pass the
    result to run_tracks_year(first_batch=...).  The runtime year loop uses
    this to keep one launch in flight across year boundaries, hiding the
    host round-trip and dispatch latency behind device execution (in the
    common case one batch fills the whole year quota, so this pipelines the
    entire run)."""
    n_tracks = n_tracks or cfg.tracks_per_year
    from tropical_cyclone_risk_tpu.models import fields as fields_mod
    pack_y = fields_mod.slice_pack_year(pack, cfg, year_idx)
    return _dispatch_batch(jax.random.fold_in(key, 0), pack_y, cfg,
                           basin_id, cfg.seed_batch,
                           min(n_tracks, launch_width(cfg, cfg.seed_batch)),
                           jnp.int32(cfg.start_month - 1), mesh)


def run_tracks_year(key: jax.Array, pack: FieldPack, cfg: Namelist,
                    basin_id: str, year_idx: int,
                    n_tracks: Optional[int] = None,
                    max_batches: int = 200, mesh=None,
                    first_batch=None) -> YearTracks:
    """Generate the year's track quota (reference run_tracks,
    util/compute.py:64-210).

    mesh: optional jax.sharding.Mesh — shards each seed batch over the
    device mesh (parallel.sharding) instead of one-device launches.
    first_batch: optional already-dispatched batch 0 (prefetch_year_batch0
    with the same key/config)."""
    n_tracks = n_tracks or cfg.tracks_per_year
    n_basins = len(cfg.basin_ids_sorted())
    N = cfg.seed_batch
    k_max = min(n_tracks, launch_width(cfg, N))

    # one compiled launch shape for every year of every run: slice the pack
    # to this year's 12 calendar-month planes (fields.slice_pack_year)
    from tropical_cyclone_risk_tpu.models import fields as fields_mod
    pack = fields_mod.slice_pack_year(pack, cfg, year_idx)
    plane_off = jnp.int32(cfg.start_month - 1)

    rows: List[dict] = []
    # seed counting stays on device (the [N] per-slot metadata never crosses
    # the slow host relay): whole batches accumulate via _count_seeds_all;
    # the quota-filling batch is truncated at the final survivor's slot on
    # device (_count_seeds_upto) — the reference's stopping rule
    n_seeds = np.zeros((n_basins, 12))
    got = 0
    for b_i in range(max_batches):
        if b_i == 0 and first_batch is not None:
            tracks, meta = first_batch
        else:
            tracks, meta = _dispatch_batch(
                jax.random.fold_in(key, b_i), pack, cfg, basin_id, N,
                k_max, plane_off, mesh)
        n_new, n_over = (int(x) for x in np.asarray(_batch_scalars(meta)))
        if n_over > 0:
            # more integrable seeds than the compaction cap: redo this
            # batch uncapped (same key -> identical proposals, so nothing
            # is clipped).  Rare; costs one extra compile the first time.
            import logging
            logging.getLogger('tc_risk_tpu').warning(
                'integrate_cap=%.2f overflowed by %d seeds (batch %d); '
                'falling back to an uncapped launch',
                cfg.integrate_cap, n_over, b_i)
            cfg_full = cfg.replace(integrate_cap=1.0)
            tracks, meta = _dispatch_batch(
                jax.random.fold_in(key, b_i), pack, cfg_full, basin_id, N,
                min(n_tracks, N), plane_off, mesh)
            n_new = int(np.asarray(_batch_scalars(meta))[0])
        take = min(n_new, n_tracks - got)
        if take > 0:
            host = jax.device_get({k: v[:take] for k, v in tracks.items()})
            rows.append(host)
            got += take
        if got >= n_tracks:
            n_seeds += np.asarray(_count_seeds_upto(
                meta['keep'], meta['counted'], meta['basin_idx'],
                meta['month'], jnp.int32(take - 1), n_basins))
            break
        n_seeds += np.asarray(_count_seeds_all(
            meta['counted'], meta['basin_idx'], meta['month'], n_basins))
    else:
        raise RuntimeError(
            f'track quota not reached after {max_batches} batches '
            f'({got}/{n_tracks}); environment may not support genesis')

    cat = lambda k: np.concatenate([r[k] for r in rows], axis=0)[:n_tracks]
    return YearTracks(lon=cat('lon'), lat=cat('lat'), v=cat('v'), m=cat('m'),
                      vmax=cat('vmax'), wnds=cat('wnds'), month=cat('month'),
                      basin_idx=cat('basin_idx'), n_seeds=n_seeds)


def concat_years(years: List[YearTracks], cfg: Namelist):
    """Assemble the multi-year output arrays (reference run_downscaling
    concatenation, util/compute.py:233-247)."""
    out = {
        'lon': np.concatenate([y.lon for y in years]),
        'lat': np.concatenate([y.lat for y in years]),
        'v': np.concatenate([y.v for y in years]),
        'm': np.concatenate([y.m for y in years]),
        'vmax': np.concatenate([y.vmax for y in years]),
        'wnds': np.concatenate([y.wnds for y in years]),
        'month': np.concatenate([y.month for y in years]),
        'basin_idx': np.concatenate([y.basin_idx for y in years]),
        'n_seeds': np.stack([y.n_seeds for y in years]),
        'year': np.concatenate([
            np.full(y.lon.shape[0], cfg.start_year + i)
            for i, y in enumerate(years)]),
    }
    return out
