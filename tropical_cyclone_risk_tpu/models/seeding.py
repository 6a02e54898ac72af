"""Vectorized genesis seeding.

Reference equivalent: the nested rejection loops of util/compute.py:134-175.
The reference draws one candidate at a time per process: an area-weighted
first draw, uniform redraws until the candidate lands on the run-basin ocean
mask, then month / basin-assignment / equatorward-rejection / PI gates.  Here
each batch slot draws R proposal rounds up front (round 0 area-weighted,
retry rounds uniform over the full basin bounds — an exact replication of the
reference's redraw distribution) and selects the first passing round, so the
whole seeding pass is a fixed-shape program.

A slot "counts" as a seed (for the seeds_per_month frequency signal) iff its
max basin-mask value exceeds 1e-3 and it survives the equatorward rejection;
it is integrated iff additionally local reduced PI > 35 m/s
(util/compute.py:160-169).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import fields as F
from tropical_cyclone_risk_tpu.models.fast import State
from tropical_cyclone_risk_tpu.ops import compact as compact_ops
from tropical_cyclone_risk_tpu.ops import interp
from tropical_cyclone_risk_tpu.utils import basins

# Proposal rounds per slot.  A slot whose every round misses the ocean mask
# is dropped (neither counted nor integrated) — statistically neutral, since
# whether a slot's independent draws all miss is independent of the position
# it would eventually accept, so dropping is uniform thinning of the seed
# stream (the conditional acceptance distribution is untouched and Gamma =
# storms/seeds is unbiased).  Measured retry pass rates are >= 0.5 per basin
# (tools: /tmp passrate study, synthetic 1-deg env), so 16 rounds leave a
# drop probability < 5e-6 per slot (< 1 slot per 131072-seed launch).  The
# rejection gathers are the dominant per-launch fixed cost, so rounds are
# kept to the statistical minimum — and, when ``cfg.seed_retry_caps`` is
# set, the retry rounds additionally compact the still-unresolved slots
# (see propose_seeds) so the gather volume tracks the geometric decay of
# the unresolved population instead of paying full batch width each round.
N_RETRY_ROUNDS = 16


def _round256(w: float, lo: int, hi: int) -> int:
    w = int(-(-int(w) // 256) * 256)
    return min(hi, max(lo, w))


def _position_rounds(k_lon, k_lat0, k_latr, b, n):
    """The R rounds of position proposals ([R, n] lon/lat): round 0
    area-weighted over the genesis belt, retries uniform over the basin
    bounds — an exact replication of the reference's redraw distribution
    (util/compute.py:136-148).  Shared by propose_seeds and the
    retry-decay probe so the probe measures the real proposal stream."""
    R = N_RETRY_ROUNDS
    lon_r = jax.random.uniform(k_lon, (R, n), minval=b[0], maxval=b[2])
    # round 0: area-weighted latitude over the genesis belt
    # genesis belt [3, 45] per hemisphere (sign(0) >= 0 in the reference)
    lat_min = 3.0 if b[1] >= 0 else -45.0
    lat_max = 45.0 if b[3] >= 0 else -3.0
    y = jax.random.uniform(k_lat0, (n,),
                           minval=jnp.sin(jnp.deg2rad(lat_min)),
                           maxval=jnp.sin(jnp.deg2rad(lat_max)))
    lat0 = jnp.rad2deg(jnp.arcsin(y))
    # retry rounds: uniform over the full basin latitude bounds
    lat_r = jax.random.uniform(k_latr, (R, n), minval=b[1], maxval=b[3])
    lat_r = lat_r.at[0].set(lat0)
    return lon_r, lat_r


class SeedProposal(NamedTuple):
    lon: jnp.ndarray          # [N]
    lat: jnp.ndarray          # [N]
    month: jnp.ndarray        # [N] int32, 1..12
    basin_idx: jnp.ndarray    # [N] int32 into basin_ids_sorted()
    counted: jnp.ndarray      # [N] bool: contributes to seeds_per_month
    integrate: jnp.ndarray    # [N] bool: passes the PI gate
    dropped: jnp.ndarray      # [N] bool: every proposal round missed the
                              # ocean mask (uniform thinning; see
                              # N_RETRY_ROUNDS) — exported so production
                              # runs can OBSERVE the drop rate instead of
                              # trusting the synthetic-env measurement
    v_init: jnp.ndarray       # [N]
    m_init: jnp.ndarray       # [N]
    h_bl: jnp.ndarray         # [N]
    plane: jnp.ndarray        # [N] int32 field plane (year_idx*12 + month-start_month)


@functools.partial(jax.jit, static_argnames=('cfg', 'basin_id', 'n'))
def propose_seeds(key: jax.Array, pack: F.FieldPack, cfg: Namelist,
                  basin_id: str, n: int,
                  plane_offset: int | jnp.ndarray = 0) -> SeedProposal:
    b = basins.basin_bounds(cfg, basin_id)
    k_lon, k_lat0, k_latr, k_month, k_reject, k_vinit = \
        jax.random.split(key, 6)

    # --- position proposal rounds (util/compute.py:136-148) ---
    R = N_RETRY_ROUNDS
    lon_r, lat_r = _position_rounds(k_lon, k_lat0, k_latr, b, n)

    # corner-packed mask: ONE gather row per (round, slot) lookup instead of
    # four (the gather is row-rate-bound; this pack is a few-MB trace-time
    # constant folded out of the launch's hot cost)
    run_mask4 = interp.pack_corners(pack.run_mask[..., None])
    mval = lambda lo, la: interp.bilinear_packed(
        run_mask4, pack.mask_grid, lo, la)[..., 0]
    caps = cfg.seed_retry_caps
    if caps is None:
        mask_val = mval(lon_r.ravel(), lat_r.ravel()).reshape(R, n)
        passes = mask_val >= 1e-2
        first = jnp.argmax(passes, axis=0)             # first passing round
        any_pass = jnp.any(passes, axis=0)
    else:
        # --- retry-round compaction: the gather width tracks the decay of
        # the unresolved population.  Round 0 tests every slot; each retry
        # round r then compacts the still-unresolved slots (slot-stable,
        # the integrate-compaction idiom) to width ~ caps[r-1] * n and
        # gathers only those, so total mask-gather rows drop from R*n to
        # ~(1 + sum(caps)) * n (the unresolved population decays
        # geometrically at >= 2x/round; caps come from a measured decay
        # probe, pipeline.auto_seed_retry_caps).  When every unresolved
        # slot fits its round's width — the tuned steady state — the
        # result is BIT-IDENTICAL to the full-width path (same draws,
        # same tests, only dead-slot gathers skipped).  An unresolved slot
        # beyond a round's width leaves the active set permanently and
        # ends up dropped: statistically this is the same uniform thinning
        # as exhausting all R rounds (the drop depends only on the slot's
        # own earlier misses and its slot index, never on the position it
        # would have accepted), and it shows up in the exported drop
        # counter that production runs already observe.
        pass0 = mval(lon_r[0], lat_r[0]) >= 1e-2
        first = jnp.where(pass0, 0, R).astype(jnp.int32)
        ur = ~pass0                 # unresolved, on the current active axis
        a_idx = None                # active axis -> original slot
        cur_w = n
        for r in range(1, R):
            cap = float(caps[min(r - 1, len(caps) - 1)])
            w = _round256(n * cap, 256, cur_w)
            order = compact_ops.stable_partition_order(ur, w)
            a_idx = order if a_idx is None else jnp.take(a_idx, order)
            active = jnp.take(ur, order)
            val = mval(jnp.take(lon_r[r], a_idx), jnp.take(lat_r[r], a_idx))
            pass_c = active & (val >= 1e-2)
            first = first.at[a_idx].min(jnp.where(pass_c, r, R))
            ur = active & ~pass_c
            cur_w = w
        any_pass = first < R
    # dropped slots read their round-0 position (same as the argmax path's
    # argmax-of-all-False = 0), keeping the two paths bit-identical
    first_idx = jnp.where(any_pass, jnp.minimum(first, R - 1), 0)
    take = lambda a: jnp.take_along_axis(a, first_idx[None, :], axis=0)[0]
    lon = take(lon_r)
    lat = take(lat_r)

    # --- month and field plane (util/compute.py:151-152); the plane is the
    # (year, month) slot in the FieldPack.  Months outside the configured
    # data range behave like the reference's out-of-range time interp
    # (NaN -> vpot 0 -> PI gate rejects): clamped plane, integrate=False.
    month = jax.random.randint(k_month, (n,), 1, 13)
    plane_raw = plane_offset + month - cfg.start_month
    n_planes = pack.env.shape[0]
    plane_ok = (plane_raw >= 0) & (plane_raw < n_planes)
    plane = jnp.clip(plane_raw, 0, n_planes - 1)

    # --- basin assignment (util/compute.py:155-158) ---
    basin_vals = interp.bilinear_packed(
        interp.pack_corners(pack.basin_masks), pack.mask_grid, lon, lat)
    basin_idx = jnp.argmax(basin_vals, axis=1).astype(jnp.int32)
    basin_ok = jnp.max(basin_vals, axis=1) > 1e-3

    # --- equatorward rejection (util/compute.py:160-166) ---
    powers = jnp.asarray(cfg.lat_vort_power_by_basin(), jnp.float32)
    p_lat = jnp.clip((jnp.abs(lat) - cfg.lat_vort_fac) / 12.0, 0.0, 1.0) \
        ** powers[basin_idx]
    u = jax.random.uniform(k_reject, (n,))
    counted = any_pass & basin_ok & (u < p_lat)

    # --- PI gate (util/compute.py:162,168-169): raw vpot interpolant ---
    env = interp.bilinear_packed(interp.pack_corners(pack.env), pack.grid,
                                 lon, lat, plane)
    integrate = counted & plane_ok & (env[:, F.VPOT] > 35.0)

    # --- initial state (util/compute.py:172-175) ---
    v_init = cfg.seed_v_init_ms + jax.random.normal(k_vinit, (n,))
    rh = env[:, F.RH]
    m_init = jnp.maximum(0.0, cfg.m_init_amp / (
        1.0 + jnp.exp(-(rh - cfg.m_init_mid) * cfg.m_init_slope))
        + cfg.m_init_base)
    h_bls = jnp.asarray(cfg.h_bl_by_basin(), jnp.float32)
    h_bl = h_bls[basin_idx]

    return SeedProposal(lon.astype(jnp.float32), lat.astype(jnp.float32),
                        month.astype(jnp.int32), basin_idx, counted,
                        integrate, ~any_pass, v_init.astype(jnp.float32),
                        m_init.astype(jnp.float32), h_bl,
                        plane.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=('cfg', 'basin_id', 'n'))
def retry_unresolved_curve(key: jax.Array, pack: F.FieldPack, cfg: Namelist,
                           basin_id: str, n: int) -> jnp.ndarray:
    """[R] int32: slots still unresolved AFTER each proposal round of a
    full-width seeding pass — the decay curve auto_seed_retry_caps sizes
    the retry-compaction widths from.  Draws the exact proposal stream
    propose_seeds draws (same key splits), so the measured curve is the
    real one; the curve is a property of the (static) run mask x basin
    bounds, so one probe per run suffices."""
    b = basins.basin_bounds(cfg, basin_id)
    k_lon, k_lat0, k_latr, *_ = jax.random.split(key, 6)
    lon_r, lat_r = _position_rounds(k_lon, k_lat0, k_latr, b, n)
    run_mask4 = interp.pack_corners(pack.run_mask[..., None])
    mask_val = interp.bilinear_packed(run_mask4, pack.mask_grid,
                                      lon_r.ravel(), lat_r.ravel()
                                      )[..., 0].reshape(N_RETRY_ROUNDS, n)
    miss = (mask_val < 1e-2).astype(jnp.int32)
    return jnp.cumprod(miss, axis=0).sum(axis=1, dtype=jnp.int32)


def initial_state(prop: SeedProposal) -> State:
    return State(prop.lon, prop.lat, prop.v_init, prop.m_init)


def count_seeds_per_month(basin_idx, month, counted, n_basins: int,
                          upto: int | None = None):
    """seeds_per_month[basin, month] from per-slot metadata, optionally
    truncated at slot `upto` inclusive — reproducing the reference's
    stopping rule (counting halts once the track quota fills,
    util/compute.py:134-175).  Host-side numpy."""
    import numpy as np

    basin_idx = np.asarray(basin_idx)
    month = np.asarray(month)
    counted = np.asarray(counted)
    if upto is not None:
        sl = slice(0, upto + 1)
        basin_idx, month, counted = basin_idx[sl], month[sl], counted[sl]
    out = np.zeros((n_basins, 12))
    np.add.at(out, (basin_idx[counted], month[counted] - 1), 1)
    return out
