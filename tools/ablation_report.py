"""Intensity-dependent steering ablation at scale (reference
namelist.py:73-74 ``coupled_track``; the Lin et al. 2023 headline
configuration).  Compares two full runs of the same workspace — one with
intensity-dependent steering weights, one with the constant (0.2, 0.8)
weights — and writes a JSON summary + a figure.

Two layers of statistics:

1. Population stats (always): zonal displacement, recurvature fraction,
   track-density overlap for each configuration.
2. Paired stats (when both runs used the same --seed): seeds and synthetic
   Fourier flows are then identical draw-for-draw, so tracks sharing a
   genesis point differ ONLY through the steering weights.  The paired
   zonal-displacement difference, binned by mean track |latitude|, exposes
   the alpha(v) effect at ~10-15 sigma where population histograms drown
   it in stochastic track spread — and shows the physically-required sign
   crossover at the latitude where the u250-u850 contrast of the
   environment reverses.

Usage:
  python tools/ablation_report.py 'ON_GLOB' 'OFF_GLOB' \
      --json docs/steering_ablation.json \
      --fig docs/figures/steering_ablation.png
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tropical_cyclone_risk_tpu import analysis               # noqa: E402


def _final_lon(ens: analysis.TrackEnsemble):
    """Last finite longitude of each track, all members flattened."""
    lon = ens.lon.reshape(-1, ens.lon.shape[-1])
    valid = np.isfinite(lon)
    last = np.maximum(valid.sum(axis=-1) - 1, 0)
    return np.take_along_axis(np.where(valid, lon, 0.0), last[:, None],
                              axis=-1)[:, 0]


def zonal_disp(ens: analysis.TrackEnsemble):
    """Genesis-to-decay zonal displacement (deg east) per track."""
    lon0 = ens.lon.reshape(-1, ens.lon.shape[-1])[:, 0]
    return (_final_lon(ens) - lon0 + 180.0) % 360.0 - 180.0


def track_stats(ens: analysis.TrackEnsemble):
    lon = ens.lon.reshape(-1, ens.lon.shape[-1])
    disp = zonal_disp(ens)
    valid = np.isfinite(lon)
    lon_w = np.where(valid, lon, np.inf).min(axis=-1)
    recovery = np.where(np.isfinite(lon_w), _final_lon(ens) - lon_w, 0.0)
    return {
        'n_tracks': int(lon.shape[0]),
        'zonal_disp_deg_mean': round(float(disp.mean()), 3),
        'zonal_disp_deg_p10': round(float(np.percentile(disp, 10)), 3),
        'zonal_disp_deg_p90': round(float(np.percentile(disp, 90)), 3),
        'recurve_fraction': round(float((recovery >= 2.0).mean()), 4),
        'east_recovery_deg_mean': round(float(recovery.mean()), 3),
    }


def paired_stats(ens_on, ens_off, lat_edges=(0.0, 22.0, 30.0, 90.0)):
    """Match tracks by genesis point (valid when the two runs shared a
    PRNG seed) and bin the paired displacement difference by |lat|."""
    flat = lambda a: a.reshape(-1, a.shape[-1])
    g = lambda e: np.stack([flat(e.lon)[:, 0], flat(e.lat)[:, 0]], 1)
    same = np.all(np.isclose(g(ens_on), g(ens_off), atol=1e-3), axis=1)
    if same.sum() < 10:
        return None
    dd = zonal_disp(ens_on) - zonal_disp(ens_off)
    lat_on = flat(ens_on.lat)
    mlat = np.abs(np.nanmean(np.where(np.isfinite(lat_on), lat_on, np.nan),
                             axis=1))
    bins = []
    for lo, hi in zip(lat_edges[:-1], lat_edges[1:]):
        m = same & (mlat >= lo) & (mlat < hi)
        n = int(m.sum())
        if n == 0:
            continue
        bins.append({
            'lat_band': [lo, hi], 'n_pairs': n,
            'disp_diff_deg_mean': round(float(dd[m].mean()), 3),
            'disp_diff_deg_se': round(float(dd[m].std()
                                            / np.sqrt(n)), 3),
        })
    return {'n_pairs_total': int(same.sum()),
            'disp_diff_deg_mean': round(float(dd[same].mean()), 3),
            'disp_diff_deg_se': round(float(dd[same].std()
                                            / np.sqrt(same.sum())), 3),
            'by_lat_band': bins}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('on_glob', help='tracks files of the coupled_track run')
    ap.add_argument('off_glob', help='tracks files of the constant-weight run')
    ap.add_argument('--json', default=None)
    ap.add_argument('--fig', default=None)
    args = ap.parse_args(argv)

    ens_on = analysis.open_tracks(sorted(glob.glob(args.on_glob)))
    ens_off = analysis.open_tracks(sorted(glob.glob(args.off_glob)))

    report = {
        'coupled_on': track_stats(ens_on),
        'coupled_off': track_stats(ens_off),
    }
    d_on, _, _ = analysis.track_density(ens_on, res_deg=2.0)
    d_off, _, _ = analysis.track_density(ens_off, res_deg=2.0)
    p, q = d_on / d_on.sum(), d_off / d_off.sum()
    report['density_overlap'] = round(float(np.minimum(p, q).sum()), 4)
    paired = paired_stats(ens_on, ens_off)
    report['paired'] = paired

    out = json.dumps(report, indent=1)
    if args.json:
        with open(args.json, 'w') as f:
            f.write(out + '\n')
    print(out)

    if args.fig and paired:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.2), dpi=150)
        fig.patch.set_facecolor('#fcfcfb')
        ax.set_facecolor('#fcfcfb')
        bands = paired['by_lat_band']
        x = np.arange(len(bands))
        y = [b['disp_diff_deg_mean'] for b in bands]
        se = [b['disp_diff_deg_se'] for b in bands]
        ax.axhline(0.0, color='#c3c2b7', lw=1)
        ax.errorbar(x, y, yerr=se, fmt='o', color='#2a78d6', ms=7,
                    capsize=4, lw=2)
        for xi, b in zip(x, bands):
            ax.annotate(f"n={b['n_pairs']}", (xi, b['disp_diff_deg_mean']),
                        textcoords='offset points', xytext=(10, -4),
                        fontsize=8, color='#52514e')
        ax.set_xticks(x)
        ax.set_xticklabels([f"{b['lat_band'][0]:.0f}-"
                            f"{min(b['lat_band'][1], 60):.0f}"
                            for b in bands])
        ax.set_xlabel('Mean track |latitude| band (deg)', color='#0b0b0b')
        ax.set_ylabel('Paired zonal-displacement difference\n'
                      '(coupled - constant, deg east)', color='#0b0b0b')
        ax.set_title('Intensity-dependent steering: paired effect by '
                     'latitude', color='#0b0b0b', fontsize=11)
        ax.grid(True, axis='y', color='#e6e5e1', lw=0.7)
        for s in ax.spines.values():
            s.set_color('#c3c2b7')
        ax.tick_params(colors='#52514e')
        fig.tight_layout()
        fig.savefig(args.fig)
        print('figure:', args.fig)


if __name__ == '__main__':
    main()
