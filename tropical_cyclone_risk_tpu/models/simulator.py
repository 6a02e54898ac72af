"""Batched fixed-step track integration under lax.scan.

Reference equivalent: scipy.solve_ivp RK45 with terminal events and hourly
t_eval, one call per storm (intensity/coupled_fast.py:264-267).  The dynamics
are smooth at hourly scale (the reference allows max_step=86400 s), so a
fixed-step RK4 at the output interval reproduces solve_ivp trajectories to
float32 accuracy (validated in tests/test_simulator.py) while letting XLA
compile the entire ensemble into one scan:

  state [N, 4]  x  361 steps, alive-mask termination instead of events.

Termination (coupled_fast.py:246-256): leaving the basin (1 deg margin),
|lat| <= 2, or v <= 4 m/s.  Dead storms freeze in place and their outputs are
NaN-masked, matching the reference's NaN-padded fixed-width output buffers
(util/compute.py:126-133).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models import fast
from tropical_cyclone_risk_tpu.models import fields as fields_mod
from tropical_cyclone_risk_tpu.models.fields import FieldPack
from tropical_cyclone_risk_tpu.utils import basins


class TrackOutput(NamedTuple):
    """Padded track buffers, [N, n_steps] (channel-last winds [N, n_steps, W]).
    NaN after storm death, mirroring the reference output contract."""
    lon: jnp.ndarray
    lat: jnp.ndarray
    v: jnp.ndarray
    m: jnp.ndarray
    wnds: jnp.ndarray
    alive: jnp.ndarray       # [N, n_steps] bool: sample validity
    last_step: jnp.ndarray   # [N] index of last valid sample


class DiagState(NamedTuple):
    """In-scan vmax diagnostic carry (Namelist.vmax_in_scan): the previous
    output sample's position (the centered difference's left neighbor) and
    the running alive-masked lifetime vmax maximum.  The running peak
    EXCLUDES each track's final valid sample — that one sample's vmax is
    re-derived with the reference's edge extrapolation afterwards
    (diagnostics.fix_last_sample) and max-combined by the caller."""
    prev_lon: jnp.ndarray    # [N]
    prev_lat: jnp.ndarray    # [N]
    peak: jnp.ndarray        # [N], -inf init


class RawTracks(NamedTuple):
    """Scan-native time-major buffers, [n_steps, N] (winds [n_steps, N, W]),
    UNMASKED: samples past a storm's death hold the frozen death state, not
    NaN.  The fused launch epilogue (pipeline.launch_body) works in this
    layout so full-batch transposes and NaN-masking passes over [N, 361]
    buffers happen only on the few compacted survivors."""
    lon: jnp.ndarray
    lat: jnp.ndarray
    v: jnp.ndarray
    m: jnp.ndarray
    wnds: jnp.ndarray
    alive: jnp.ndarray       # [n_steps, N] bool: sample validity
    last_step: jnp.ndarray   # [N] index of last valid sample


def _events_alive(cfg: Namelist, bounds, y: fast.State):
    """Continuation condition (coupled_fast.py:246-256)."""
    in_b = basins.in_basin(y.lon, y.lat, bounds, 1.0)
    return in_b & (jnp.abs(y.lat) > 2.0) & (y.v > 4.0)


def _rk4_step(rhs_fn, t, y: fast.State, dt):
    k1, wnds = rhs_fn(t, y)
    add = lambda a, ka, h: fast.State(*(x + h * dx for x, dx in zip(a, ka)))
    k2, _ = rhs_fn(t + dt / 2, add(y, k1, dt / 2))
    k3, _ = rhs_fn(t + dt / 2, add(y, k2, dt / 2))
    k4, _ = rhs_fn(t + dt, add(y, k3, dt))
    y1 = fast.State(*(x + dt / 6 * (a + 2 * b + 2 * c + d)
                      for x, a, b, c, d in zip(y, k1, k2, k3, k4)))
    return y1, wnds


def _rk4_step_frozen_fields(stacks, cfg, params, t, y: fast.State, dt,
                            f_t=None):
    """RK4 step with one field gather AND one wind coloring (Cholesky +
    Fourier synthesis) at the step start (the gather-bound default; see
    Namelist.rk_exact_stage_fields).  F(t) has a 20-day period, so its
    sub-hour variation is O(1e-3) of the wind amplitude; steering weights,
    ocean feedback and the FAST ODEs stay exact per RK stage.

    f_t: optional precomputed Fourier sample F(t) [N, W] (the scan streams
    these from one pre-launch matmul instead of contracting the A/B
    coefficient buffers every step)."""
    smp = fast.sample_fields_at_time(stacks, cfg, y.lon, y.lat,
                                     params.plane, t)
    drv = fast.derive_sample(cfg, smp)
    if f_t is None:
        f_t = params.fourier.evaluate(t)
    wnds = fast.color_winds_given_f(cfg, smp.wind_stats, f_t)
    rhs_fn = lambda tt, yy: fast.rhs_given_winds(cfg, tt, yy, params, smp,
                                                 wnds, drv)
    return _rk4_step(rhs_fn, t, y, dt)


def integrate_segment(stacks, cfg: Namelist, bounds, y0: fast.State,
                      alive0: jnp.ndarray, params: fast.SeedParams,
                      k0: int, n_steps: int, diag: DiagState = None,
                      t_last: int = -1):
    """Scan samples k0 .. k0+n_steps-1 from carry (y0, alive0).

    Returns (time-major outputs (lon, lat, v, m, wnds, alive), final carry
    (y_end, alive_end) = the state AT sample k0+n_steps).  Segmenting lets
    the launch re-compact the batch to the surviving storms mid-track
    (pipeline.launch_body): frozen-state semantics make the segments
    exactly composable — a storm dead at the boundary replays its frozen
    state either way.

    diag (Namelist.vmax_in_scan): an in-scan vmax carry.  The outputs gain
    a 7th leaf vmax [n_steps, N] (centered-difference translation from the
    carried previous position and the post-step next position — the exact
    neighbor values the standalone axi_to_max_wind_raw pass reads back from
    the frozen buffers) and the carry a 3rd element DiagState.  At the
    global first sample (k == 0) the left neighbor is the reference's
    start-edge extrapolation 2*pos[0] - pos[1]; diag.prev_* are ignored
    there.  t_last: global index of the run's final output sample — its
    alive rows are excluded from the running peak (they take the
    edge-extrapolation fix, diagnostics.fix_last_sample) — or -1 when this
    segment is not the final one."""
    dt_out = float(cfg.output_interval_s)
    sub = max(1, int(cfg.rk_substeps))
    dt = dt_out / sub
    stride = max(1, int(cfg.field_sample_stride))

    if not cfg.rk_exact_stage_fields and sub == 1 and stride > 1 \
            and n_steps >= stride:
        # strided path: one field gather per stride-step block
        # (cfg.field_sample_stride) — the remainder steps run through the
        # per-step scan below with carry handed over
        n_blocks, rem = divmod(n_steps, stride)
        outs_b, carry_b = _integrate_blocks(
            stacks, cfg, bounds, y0, alive0, params, k0, n_blocks, stride,
            diag=diag, t_last=t_last)
        if diag is None:
            y0, alive0 = carry_b
        else:
            y0, alive0, diag = carry_b
        if rem == 0:
            return outs_b, carry_b
        k0, n_steps = k0 + n_blocks * stride, rem
    else:
        outs_b = None

    if cfg.rk_exact_stage_fields:
        step_fn = lambda t, y, h, f=None: _rk4_step(
            lambda tt, yy: fast.rhs(stacks, cfg, tt, yy, params), t, y, h)
    else:
        step_fn = lambda t, y, h, f=None: _rk4_step_frozen_fields(
            stacks, cfg, params, t, y, h, f)

    # default path: evaluate the Fourier flow for all steps as one matmul
    # and stream per-step [N, W] slices through the scan (evaluate_grid)
    ks = k0 + jnp.arange(n_steps)
    if not cfg.rk_exact_stage_fields and sub == 1:
        f_all = params.fourier.evaluate_grid(ks.astype(jnp.float32) * dt_out)
        xs = (ks, f_all)
    else:
        xs = (ks, None)

    def step(carry, x):
        if diag is None:
            y, alive = carry
        else:
            y, alive, dstate = carry
        k, f_t = x
        t = k.astype(jnp.float32) * dt_out
        # record sample k, then advance to k+1
        y1 = y
        wnds0 = None
        for s in range(sub):
            y_next, wnds = step_fn(t + s * dt, y1, dt,
                                   f_t if s == 0 else None)
            if s == 0:
                wnds0 = wnds
            y1 = fast.State(*(jnp.where(alive, a, b)
                              for a, b in zip(y_next, y1)))
        alive1 = alive & _events_alive(cfg, bounds, y1)
        out = (y.lon, y.lat, y.v, y.m, wnds0, alive)
        if diag is None:
            return (y1, alive1), out
        vmax_k, dstate = _diag_step(cfg, dstate, y, y1, wnds0, alive,
                                    alive1, k, t_last, dt_out)
        return (y1, alive1, dstate), out + (vmax_k,)

    init = (y0, alive0) if diag is None else (y0, alive0, diag)
    carry_end, outs = jax.lax.scan(step, init, xs,
                                   unroll=max(1, int(cfg.scan_unroll)))
    if outs_b is not None:
        outs = tuple(jnp.concatenate([a, b], axis=0)
                     for a, b in zip(outs_b, outs))
    return outs, carry_end


def _diag_step(cfg, dstate: DiagState, y: fast.State, y1: fast.State,
               wnds0, alive, alive1, k, t_last: int, dt_out: float):
    """One in-scan vmax sample (see integrate_segment's diag contract):
    centered-difference translation between the carried previous position
    and the post-step next position (y1 — the value the output buffer will
    record at k+1, frozen for dead storms just like the buffer), then the
    closed-form vmax.  The running peak takes every valid sample EXCEPT a
    track's final one — a sample is final when its storm dies during this
    step (alive & ~alive1) or when it is the run's last output row
    (k == t_last); those rows are re-derived with the reference's edge
    extrapolation by diagnostics.fix_last_sample."""
    from tropical_cyclone_risk_tpu.models import diagnostics
    is0 = k == 0   # global start edge: left neighbor extrapolates
    p_lon = jnp.where(is0, 2.0 * y.lon - y1.lon, dstate.prev_lon)
    p_lat = jnp.where(is0, 2.0 * y.lat - y1.lat, dstate.prev_lat)
    ut, vt = diagnostics._translation_tm(y.lon, y.lat, p_lon, p_lat,
                                         y1.lon, y1.lat, dt_out)
    vmax_k = diagnostics.vmax_step(cfg, y.lat, y.v, wnds0, ut, vt)
    incl = alive & alive1 & (k != t_last)
    peak = jnp.maximum(dstate.peak, jnp.where(incl, vmax_k, -jnp.inf))
    return vmax_k, DiagState(y.lon, y.lat, peak)


def _integrate_blocks(stacks, cfg: Namelist, bounds, y0: fast.State,
                      alive0: jnp.ndarray, params: fast.SeedParams,
                      k0: int, n_blocks: int, stride: int,
                      diag: DiagState = None, t_last: int = -1):
    """Strided scan: samples k0 .. k0 + n_blocks*stride - 1, one field
    gather per block of `stride` output steps (cfg.field_sample_stride).

    Fields (and land/bathy) are gathered at the BLOCK-START position and
    reused for every step of the block — staleness grows from <= 1 output
    interval (the frozen-per-step default) to <= stride intervals.  The
    Fourier flow, wind coloring, steering weights, and alive-mask
    semantics remain per-step exact, identical to the unstrided body.

    diag/t_last: the in-scan vmax contract of integrate_segment."""
    dt_out = float(cfg.output_interval_s)
    n_steps = n_blocks * stride
    ks_all = k0 + jnp.arange(n_steps)
    f_all = params.fourier.evaluate_grid(ks_all.astype(jnp.float32) * dt_out)
    kb = k0 + stride * jnp.arange(n_blocks)
    # [n_blocks, stride, ...] per-step Fourier slices streamed per block
    f_blk = f_all.reshape((n_blocks, stride) + f_all.shape[1:])

    def block(carry, x):
        if diag is None:
            y, alive = carry
        else:
            y, alive, dstate = carry
        k, f_s = x
        t0 = k.astype(jnp.float32) * dt_out
        smp = fast.sample_fields_at_time(stacks, cfg, y.lon, y.lat,
                                         params.plane, t0)
        drv = fast.derive_sample(cfg, smp)
        outs = []
        for j in range(stride):
            t = t0 + j * dt_out
            wnds = fast.color_winds_given_f(cfg, smp.wind_stats, f_s[j])
            rhs_fn = lambda tt, yy, w=wnds: fast.rhs_given_winds(
                cfg, tt, yy, params, smp, w, drv)
            y_next, _ = _rk4_step(rhs_fn, t, y, dt_out)
            y_rec, alive_rec = y, alive
            y = fast.State(*(jnp.where(alive, a, b)
                             for a, b in zip(y_next, y)))
            alive = alive & _events_alive(cfg, bounds, y)
            out_j = (y_rec.lon, y_rec.lat, y_rec.v, y_rec.m, wnds,
                     alive_rec)
            if diag is not None:
                vmax_j, dstate = _diag_step(cfg, dstate, y_rec, y, wnds,
                                            alive_rec, alive, k + j,
                                            t_last, dt_out)
                out_j = out_j + (vmax_j,)
            outs.append(out_j)
        out = tuple(jnp.stack(ch) for ch in zip(*outs))
        carry = (y, alive) if diag is None else (y, alive, dstate)
        return carry, out

    init = (y0, alive0) if diag is None else (y0, alive0, diag)
    carry_end, outs = jax.lax.scan(block, init, (kb, f_blk),
                                   unroll=max(1, int(cfg.scan_unroll)))
    # [n_blocks, stride, ...] -> [n_steps, ...]
    outs = tuple(o.reshape((n_steps,) + o.shape[2:]) for o in outs)
    return outs, carry_end


def genesis_alive(pack: FieldPack, cfg: Namelist, y0: fast.State,
                  params: fast.SeedParams, integrate_mask: jnp.ndarray):
    """Step-0 alive mask: genesis gates evaluated with the track's own
    Fourier draws (coupled_fast.py:237-244)."""
    stacks = fields_mod.build_stacks(pack)
    keep = fast.ventilation_index_reject(stacks, cfg, y0, params)
    return integrate_mask & keep


def integrate_raw(pack: FieldPack, cfg: Namelist, basin_id: str,
                  y0: fast.State, params: fast.SeedParams,
                  integrate_mask: jnp.ndarray) -> RawTracks:
    """Integrate the batch for cfg.n_steps_output samples; time-major
    unmasked output (see RawTracks).

    integrate_mask: [N] seeds that passed all genesis gates; others produce
    dead (alive-nowhere) tracks at zero extra cost (lockstep SIMD).
    """
    bounds = basins.basin_bounds(cfg, basin_id)
    stacks = fields_mod.build_stacks(pack)
    alive0 = genesis_alive(pack, cfg, y0, params, integrate_mask)
    (lon, lat, v, m, wnds, alive), _ = integrate_segment(
        stacks, cfg, bounds, y0, alive0, params, 0, cfg.n_steps_output)
    last_step = jnp.maximum(jnp.sum(alive.astype(jnp.int32), axis=0) - 1, 0)
    return RawTracks(lon, lat, v, m, wnds, alive, last_step)


@functools.partial(jax.jit, static_argnames=('cfg', 'basin_id'))
def integrate(pack: FieldPack, cfg: Namelist, basin_id: str,
              y0: fast.State, params: fast.SeedParams,
              integrate_mask: jnp.ndarray) -> TrackOutput:
    """Seed-major NaN-masked view of integrate_raw (the reference output
    contract: [N, n_steps] buffers, NaN past each storm's death,
    util/compute.py:126-133).  One-shot callers and tests use this; the
    fused launch stays in the raw time-major layout."""
    raw = integrate_raw(pack, cfg, basin_id, y0, params, integrate_mask)
    tr = lambda x: jnp.swapaxes(x, 0, 1)
    lon, lat, v, m, alive = map(tr, (raw.lon, raw.lat, raw.v, raw.m,
                                     raw.alive))
    wnds = jnp.swapaxes(raw.wnds, 0, 1)
    nan = jnp.float32(jnp.nan)
    mask = lambda x: jnp.where(alive, x, nan)
    return TrackOutput(mask(lon), mask(lat), mask(v), mask(m),
                       jnp.where(alive[..., None], wnds, nan),
                       alive, raw.last_step)


def tc_filters(cfg: Namelist, out: TrackOutput) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Post-integration TC identification (util/compute.py:185-189).

    is_tc: reached seed_v_threshold at some point AND v at 2 days (or at
    death, whichever is earlier — np.interp clamps to the last sample) >=
    the 2-day threshold.  Returns (is_tc [N], v_2d [N]).
    """
    steps_2d = int(2 * 24 * 3600 / cfg.output_interval_s)
    idx_2d = jnp.minimum(out.last_step, steps_2d)
    v_2d = jnp.take_along_axis(jnp.nan_to_num(out.v), idx_2d[:, None],
                               axis=1)[:, 0]
    reached = jnp.any(jnp.nan_to_num(out.v) >= cfg.seed_v_threshold_ms,
                      axis=1)
    is_tc = reached & (v_2d >= cfg.seed_v_2d_threshold_ms) & out.alive[:, 0]
    return is_tc, v_2d


def tc_filters_raw(cfg: Namelist, raw: RawTracks) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tc_filters on the time-major unmasked buffers: identical verdicts
    (v at idx_2d <= last_step is always a valid sample; alive gates the
    reached-threshold reduction exactly like the NaN mask + nan_to_num)."""
    steps_2d = int(2 * 24 * 3600 / cfg.output_interval_s)
    idx_2d = jnp.minimum(raw.last_step, steps_2d)
    v_2d = jnp.take_along_axis(raw.v, idx_2d[None, :], axis=0)[0]
    reached = jnp.any(jnp.where(raw.alive, raw.v, 0.0)
                      >= cfg.seed_v_threshold_ms, axis=0)
    is_tc = reached & (v_2d >= cfg.seed_v_2d_threshold_ms) & raw.alive[0]
    return is_tc, v_2d
