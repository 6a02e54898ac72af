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
# kept to the statistical minimum.
N_RETRY_ROUNDS = 16


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

    # corner-packed mask: ONE gather row per (round, slot) lookup instead of
    # four (the gather is row-rate-bound; this pack is a few-MB trace-time
    # constant folded out of the launch's hot cost)
    run_mask4 = interp.pack_corners(pack.run_mask[..., None])
    mask_val = interp.bilinear_packed(run_mask4, pack.mask_grid,
                                      lon_r.ravel(), lat_r.ravel()
                                      )[..., 0].reshape(R, n)
    passes = mask_val >= 1e-2
    first = jnp.argmax(passes, axis=0)                 # first passing round
    any_pass = jnp.any(passes, axis=0)
    take = lambda a: jnp.take_along_axis(a, first[None, :], axis=0)[0]
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
