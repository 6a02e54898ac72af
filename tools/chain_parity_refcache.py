"""Chunked, resumable builder for the chain-parity reference cache.

Runs the sequential solve_ivp reference chain (tests/reference_chain.py)
in chunks of counted seeds, each chunk with an independent RNG stream,
accumulating the per-track aggregates that tools/chain_parity_report.py
consumes via --ref-cache.  The cache file is rewritten atomically after
every chunk, so the build can be paused (SIGSTOP), killed, and resumed
at any point — on a single-core host a 210k-seed build takes ~35 min
and this is the only way to interleave it with timing-sensitive work.

Usage:
    JAX_PLATFORMS=cpu python tools/chain_parity_refcache.py \
        --cache /tmp/ref_chain_210k.npz --target-seeds 210000
    # then
    python tools/chain_parity_report.py --ref-seeds 210000 \
        --ref-cache /tmp/ref_chain_210k.npz ...

Chunks use rng seed = --seed0 + chunk_index, so a cache built to N
seeds and later extended to M > N is identical to one built straight
to M with the same chunk size (modulo the final partial chunk).
"""

import argparse
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, 'tests'))

from chain_parity_report import ref_aggregates  # noqa: E402


def _save_atomic(path, payload):
    tmp = path + '.tmp.npz'
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--cache', required=True)
    ap.add_argument('--target-seeds', type=int, default=210000)
    ap.add_argument('--chunk', type=int, default=15000)
    ap.add_argument('--seed0', type=int, default=1000,
                    help='rng seed of chunk 0 (chunk i uses seed0 + i)')
    args = ap.parse_args(argv)

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from tropical_cyclone_risk_tpu.config import Namelist
    from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
    from reference_chain import ReferenceChain

    cfg = Namelist(seed_batch=8192)
    pack = synthetic_pack(cfg, n_planes=12, nlat=91, nlon=180, seed=0)
    rc = ReferenceChain(pack, cfg, 'GL')
    dt_s = float(cfg.output_interval_s)

    acc = None
    n_chunks = 0
    if os.path.exists(args.cache):
        c = np.load(args.cache)
        if 'chunk_size' in c and int(c['chunk_size']) != args.chunk:
            raise SystemExit(f'cache {args.cache} was built with --chunk '
                             f'{int(c["chunk_size"])}, got {args.chunk}')
        acc = {k: c[k] for k in ('lmi', 'lat0', 'month', 'pos', 'pdi',
                                 'lf', 'spm', 'n_counted')}
        n_chunks = int(c['n_chunks']) if 'n_chunks' in c else 0
        print(f'resuming: {int(c["ref_seeds"])} seeds / '
              f'{acc["lmi"].size} tracks in {n_chunks} chunks', flush=True)

    while acc is None or int(acc['n_counted']) < args.target_seeds:
        done = 0 if acc is None else int(acc['n_counted'])
        want = min(args.chunk, args.target_seeds - done)
        t0 = time.time()
        rng = np.random.default_rng(args.seed0 + n_chunks)
        tracks, n_counted, _ = rc.run(rng, want)
        agg = ref_aggregates(rc, tracks, n_counted, dt_s)
        if acc is None:
            acc = agg
        else:
            for k in ('lmi', 'lat0', 'month', 'pos', 'pdi', 'lf'):
                acc[k] = np.concatenate([acc[k], agg[k]])
            acc['spm'] = acc['spm'] + agg['spm']
            acc['n_counted'] = int(acc['n_counted']) + n_counted
        n_chunks += 1
        _save_atomic(args.cache, dict(acc, ref_seeds=int(acc['n_counted']),
                                      n_chunks=n_chunks,
                                      chunk_size=args.chunk))
        print(f'chunk {n_chunks}: +{n_counted} seeds '
              f'({len(tracks)} tracks) in {time.time() - t0:.0f} s -> '
              f'{int(acc["n_counted"])}/{args.target_seeds} total, '
              f'{acc["lmi"].size} tracks', flush=True)

    print(f'done: {int(acc["n_counted"])} counted seeds, '
          f'{acc["lmi"].size} tracks, {acc["lf"].size} landfalls '
          f'-> {args.cache}', flush=True)


if __name__ == '__main__':
    main()
