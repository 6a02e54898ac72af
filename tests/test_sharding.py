"""Multi-device correctness: the seed-sharded launch on an 8-device CPU mesh
(SURVEY.md section 4e — sharding is validated on virtual host devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu.models import pipeline
from tropical_cyclone_risk_tpu.parallel import sharding

CFG = Namelist(seed_batch=256)


def _run(mesh, key, n=256, k_max=8):
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    pack = sharding.replicate_pack(pack, mesh)
    return sharding.simulate_batch_sharded(mesh, key, pack, CFG, 'GL',
                                           n=n, k_max=k_max, plane_offset=0)


def test_sharded_launch_8dev():
    mesh = sharding.make_mesh(8)
    tracks, meta = _run(mesh, jax.random.key(0))
    assert meta['keep'].shape == (256,)
    assert tracks['lon'].shape == (8, CFG.n_steps_output)
    counted = np.asarray(meta['counted'])
    assert counted.sum() > 0
    # compaction: valid slots lead, and each valid track is finite at t=0
    valid = np.asarray(tracks['valid'])
    if valid.any():
        k = int(valid.sum())
        assert valid[:k].all() and not valid[k:].any()
        assert np.all(np.isfinite(np.asarray(tracks['lon'])[:k, 0]))


def test_sharded_deterministic():
    mesh = sharding.make_mesh(8)
    _, m1 = _run(mesh, jax.random.key(7))
    _, m2 = _run(mesh, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(m1['keep']),
                                  np.asarray(m2['keep']))
    np.testing.assert_array_equal(np.asarray(m1['counted']),
                                  np.asarray(m2['counted']))


def test_device_counts_decorrelated():
    # different devices must produce different seed streams
    mesh = sharding.make_mesh(8)
    _, meta = _run(mesh, jax.random.key(3))
    months = np.asarray(meta['month']).reshape(8, -1)
    assert not all(np.array_equal(months[0], months[d]) for d in range(1, 8))


def test_mesh_size_validation():
    import pytest
    with pytest.raises(ValueError, match='devices'):
        sharding.make_mesh(1024)
    mesh = sharding.make_mesh(8)
    with pytest.raises(ValueError, match='divisible'):
        sharding._build_sharded_batch(mesh, CFG, 'GL', 255, 4)


def test_run_tracks_year_on_mesh():
    """The production quota loop on a device mesh (pipeline mesh path)."""
    from tropical_cyclone_risk_tpu.models import pipeline
    mesh = sharding.make_mesh(8)
    cfg = CFG.replace(seed_batch=512, tracks_per_year=2)
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0)
    pack = sharding.replicate_pack(pack, mesh)
    yt = pipeline.run_tracks_year(jax.random.key(5), pack, cfg, 'GL', 0,
                                  mesh=mesh)
    assert yt.lon.shape[0] == 2
    assert yt.n_seeds.sum() > 0
    assert np.all(np.isfinite(yt.lon[:, 0]))


def test_sharded_fused_years_identical():
    """run_tracks_years_fused on a mesh (sharding._build_sharded_years:
    batch 0 of K years scanned inside one SPMD program) matches the
    sharded per-year run_tracks_year loop: tracks exact, the vmax/wnds
    diagnostics to fusion-noise atol, seed accounting identical."""
    mesh = sharding.make_mesh(8)
    cfg = CFG.replace(seed_batch=4096, tracks_per_year=3, end_year=2017,
                      integrate_cap=0.5, recompact_schedule=((120, 0.5),))
    pack = synthetic_pack(cfg, n_planes=24, nlat=91, nlon=180, seed=0)
    pack = sharding.replicate_pack(pack, mesh)
    key = jax.random.key(13)
    years = list(cfg.years())
    ref = [pipeline.run_tracks_year(jax.random.fold_in(key, yr), pack, cfg,
                                    'GL', yi, mesh=mesh)
           for yi, yr in enumerate(years)]
    fused = pipeline.run_tracks_years_fused(key, pack, cfg, 'GL', years,
                                            k_fuse=2, mesh=mesh)
    for r, f in zip(ref, fused):
        for name in ('lon', 'lat', 'v', 'm', 'month', 'basin_idx'):
            np.testing.assert_array_equal(getattr(r, name),
                                          getattr(f, name), err_msg=name)
        for name in ('vmax', 'wnds'):
            a, b = getattr(r, name), getattr(f, name)
            np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                          err_msg=name)
            np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b),
                                       atol=1e-4, err_msg=name)
        np.testing.assert_array_equal(r.n_seeds, f.n_seeds)
        assert r.n_dropped == f.n_dropped
        assert r.n_proposed == f.n_proposed


def test_distributed_initialize_single_host_noop():
    from tropical_cyclone_risk_tpu.parallel import distributed
    # no coordinator configured anywhere: must be a clean no-op
    distributed.initialize()
    distributed.initialize()        # and idempotent
    assert distributed.is_primary()
    mesh = distributed.global_seed_mesh()
    assert mesh.devices.size == 8


def test_run_downscaling_trace_dir(tmp_path):
    import os
    from tropical_cyclone_risk_tpu import runtime
    cfg = CFG.replace(seed_batch=256, tracks_per_year=1,
                      start_year=2016, end_year=2016,
                      output_directory=str(tmp_path), exp_name='tr')
    pack = synthetic_pack(cfg, n_planes=12, nlat=46, nlon=90, seed=0)
    trace = str(tmp_path / 'trace')
    fn = runtime.run_downscaling(cfg, 'GL', pack, key=jax.random.key(2),
                                 n_years=1, trace_dir=trace)
    assert os.path.exists(fn)
    # profiler wrote something under the trace dir
    found = [f for _, _, fs in os.walk(trace) for f in fs]
    assert found, 'no profiler artifacts written'


def test_sharded_recompaction_identical():
    """The two-segment (mid-track re-compaction) launch on a mesh matches
    the unsegmented sharded launch: exact everywhere, vmax to float32 ULP
    noise (see test_pipeline_stats.test_recompaction_identical)."""
    mesh = sharding.make_mesh(8)
    n = 8192                      # 1024/shard -> m=512, m2=256: seg active
    cfg_seg = CFG.replace(seed_batch=n, integrate_cap=0.5,
                          recompact_step=120, recompact_cap=0.5)
    cfg_one = CFG.replace(seed_batch=n, integrate_cap=0.5)
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    pack = sharding.replicate_pack(pack, mesh)
    key = jax.random.key(3)
    t_s, m_s = sharding.simulate_batch_sharded(mesh, key, pack, cfg_seg,
                                               'GL', n=n, k_max=16,
                                               plane_offset=0)
    t_o, m_o = sharding.simulate_batch_sharded(mesh, key, pack, cfg_one,
                                               'GL', n=n, k_max=16,
                                               plane_offset=0)
    assert int(np.asarray(m_s['overflow']).sum()) == 0
    np.testing.assert_array_equal(np.asarray(m_s['keep']),
                                  np.asarray(m_o['keep']))
    valid = np.asarray(t_o['valid'])
    np.testing.assert_array_equal(np.asarray(t_s['valid']), valid)
    kv = int(valid.sum())
    assert kv >= 3
    for k in ('lon', 'lat', 'v', 'm', 'month', 'basin_idx'):
        np.testing.assert_array_equal(np.asarray(t_s[k])[:kv],
                                      np.asarray(t_o[k])[:kv], err_msg=k)
    # the recorded wnds OUTPUT COPY picks up width-dependent XLA fusion
    # noise at some strides (in-chain values are exact: v/m above are
    # bit-equal) — same ULP category as the vmax diagnostic below
    ws, wo = np.asarray(t_s['wnds'])[:kv], np.asarray(t_o['wnds'])[:kv]
    wfin = np.isfinite(ws) | np.isfinite(wo)
    np.testing.assert_allclose(ws[wfin], wo[wfin], rtol=0, atol=1e-4)
    a, b = np.asarray(t_s['vmax'])[:kv], np.asarray(t_o['vmax'])[:kv]
    fin = np.isfinite(a) | np.isfinite(b)
    np.testing.assert_allclose(a[fin], b[fin], rtol=0, atol=1e-4)


def test_sharded_multi_segment_identical():
    """The round-3 multi-boundary schedule on a mesh matches the
    unsegmented sharded launch (per-segment global column indexing via
    shard_index offsets)."""
    mesh = sharding.make_mesh(8)
    n = 12288       # 1536/shard -> m_local=768; boundary widths 512, 256
    cfg_seg = CFG.replace(
        seed_batch=n, integrate_cap=0.5,
        recompact_schedule=((90, 0.6), (200, 0.33)))
    cfg_one = CFG.replace(seed_batch=n, integrate_cap=0.5)
    pack = synthetic_pack(CFG, n_planes=12, nlat=91, nlon=180, seed=0)
    pack = sharding.replicate_pack(pack, mesh)
    # the 256-lane floor must leave BOTH boundaries active per shard, or
    # this test silently degrades to the single-boundary r2 coverage
    m_local = pipeline.launch_width(cfg_seg, n // 8)
    assert [w for _, w in pipeline.seg_schedule(cfg_seg, m_local)] \
        == [512, 256]
    key = jax.random.key(3)
    t_s, m_s = sharding.simulate_batch_sharded(mesh, key, pack, cfg_seg,
                                               'GL', n=n, k_max=16,
                                               plane_offset=0)
    t_o, m_o = sharding.simulate_batch_sharded(mesh, key, pack, cfg_one,
                                               'GL', n=n, k_max=16,
                                               plane_offset=0)
    assert int(np.asarray(m_s['overflow']).sum()) == 0
    np.testing.assert_array_equal(np.asarray(m_s['keep']),
                                  np.asarray(m_o['keep']))
    valid = np.asarray(t_o['valid'])
    np.testing.assert_array_equal(np.asarray(t_s['valid']), valid)
    kv = int(valid.sum())
    assert kv >= 3
    for k in ('lon', 'lat', 'v', 'm', 'month', 'basin_idx'):
        np.testing.assert_array_equal(np.asarray(t_s[k])[:kv],
                                      np.asarray(t_o[k])[:kv], err_msg=k)
    # the recorded wnds OUTPUT COPY picks up width-dependent XLA fusion
    # noise at some strides (in-chain values are exact: v/m above are
    # bit-equal) — same ULP category as the vmax diagnostic below
    ws, wo = np.asarray(t_s['wnds'])[:kv], np.asarray(t_o['wnds'])[:kv]
    wfin = np.isfinite(ws) | np.isfinite(wo)
    np.testing.assert_allclose(ws[wfin], wo[wfin], rtol=0, atol=1e-4)
    a, b = np.asarray(t_s['vmax'])[:kv], np.asarray(t_o['vmax'])[:kv]
    fin = np.isfinite(a) | np.isfinite(b)
    np.testing.assert_allclose(a[fin], b[fin], rtol=0, atol=1e-4)


def test_sharded_quota_prefix_identical():
    """The speculative quota prefix on a device mesh: validity keys off the
    LEADING shard's prefix survivor count (the compacted track axis is
    shard-major slot-ordered), so the sharded quota year must match the
    sharded full-width year bit-exactly."""
    from tropical_cyclone_risk_tpu.models import pipeline
    mesh = sharding.make_mesh(8)
    cfg = CFG.replace(seed_batch=8192, tracks_per_year=2)
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0)
    cfg = pipeline.auto_integrate_cap(jax.random.key(23), pack, cfg, 'GL')
    assert cfg.survivors_per_slot is not None
    # at CPU-test scales the per-shard tuned width is already near the
    # 256-lane floor, so the auto-derived prefix cannot shrink it; pin an
    # optimistic rate to force the 256-slot prefix (the environment's real
    # ~7% survivor rate still fills the 2-track quota from shard 0's
    # prefix, so the VALID quota path — not the fallback — is exercised)
    cfg = cfg.replace(survivors_per_slot=0.5)
    cq = pipeline.quota_cfg(cfg, cfg.tracks_per_year, cfg.seed_batch, 8)
    assert cq is not None, 'quota prefix must engage on the tuned cfg'
    assert pipeline.launch_width(cq, cfg.seed_batch // 8) == 256
    pack = sharding.replicate_pack(pack, mesh)
    key = jax.random.key(29)
    yt_q = pipeline.run_tracks_year(key, pack, cfg, 'GL', 0, mesh=mesh)
    yt_f = pipeline.run_tracks_year(
        key, pack, cfg.replace(quota_prefix=False), 'GL', 0, mesh=mesh)
    for name in ('lon', 'lat', 'v', 'm', 'month', 'basin_idx'):
        np.testing.assert_array_equal(getattr(yt_f, name),
                                      getattr(yt_q, name), err_msg=name)
    for name in ('vmax', 'wnds'):
        a, b = getattr(yt_f, name), getattr(yt_q, name)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                      err_msg=name)
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b),
                                   atol=1e-4, err_msg=name)
    np.testing.assert_array_equal(yt_f.n_seeds, yt_q.n_seeds)
    assert yt_q.lon.shape[0] == cfg.tracks_per_year
