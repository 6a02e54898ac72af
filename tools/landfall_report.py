"""Landfall return-period ensemble report (BASELINE.json config 5;
reference notebook cells 13-17 applied at the 100k-storm scale the
reference's own notebook says is needed for robust return periods).

Loads every member of a tracks_*.nc ensemble, computes point-of-interest
and landfall-intensity return-period curves through the tested analysis
library, and writes a JSON summary + a figure.

Usage:
  python tools/landfall_report.py 'OUTDIR/tracks_GL_*.nc' LAND_NC \
      --poi-lon 312 --poi-lat 25 --json docs/landfall_ensemble.json \
      --fig docs/figures/landfall_return_periods.png
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tropical_cyclone_risk_tpu import analysis               # noqa: E402
from tropical_cyclone_risk_tpu.preprocess import static      # noqa: E402

MS_TO_KTS = analysis.MS_TO_KTS


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('tracks_glob')
    ap.add_argument('land_nc')
    ap.add_argument('--poi-lon', type=float, default=312.0)
    ap.add_argument('--poi-lat', type=float, default=25.0)
    ap.add_argument('--region', type=float, nargs=4, default=None,
                    metavar=('LON0', 'LON1', 'LAT0', 'LAT1'),
                    help='coastline box for a regional landfall curve')
    ap.add_argument('--json', default=None)
    ap.add_argument('--fig', default=None)
    args = ap.parse_args(argv)

    paths = sorted(glob.glob(args.tracks_glob))
    ens = analysis.open_tracks(paths)
    land, land_lon, land_lat = static.load_land(args.land_nc)
    total_years = ens.year.size * ens.n_ensemble
    n_tracks = int(ens.lon.shape[0] * ens.lon.shape[1])

    lf = analysis.landfalls(ens, land, land_lon, land_lat)
    made_lf = lf['index'] >= 0
    lf_vmax = lf['vmax'][made_lf]

    bins, rp_poi, poi_lo, poi_hi = analysis.return_period_ci(
        ens, args.poi_lon, args.poi_lat)
    _, rp_lf, lf_lo, lf_hi = analysis.landfall_return_period_ci(
        ens, land, land_lon, land_lat, vmax_bins=bins)
    rp_reg = None
    if args.region:
        _, rp_reg = analysis.landfall_return_periods(
            ens, land, land_lon, land_lat, vmax_bins=bins,
            region=tuple(args.region))

    fin = lambda a: [None if not np.isfinite(x) else round(float(x), 3)
                     for x in a]
    report = {
        'n_members': int(ens.n_ensemble),
        'n_tracks_total': n_tracks,
        'simulated_years': int(total_years),
        'landfall_fraction': round(float(made_lf.mean()), 4),
        'landfall_count': int(made_lf.sum()),
        'landfall_vmax_ms': ({
            'mean': round(float(lf_vmax.mean()), 2),
            'p50': round(float(np.percentile(lf_vmax, 50)), 2),
            'p95': round(float(np.percentile(lf_vmax, 95)), 2),
            'p99': round(float(np.percentile(lf_vmax, 99)), 2),
            'max': round(float(lf_vmax.max()), 2),
        } if lf_vmax.size else None),
        'poi': {'lon': args.poi_lon, 'lat': args.poi_lat,
                'radius_km': 100.0},
        'vmax_bins_ms': [float(b) for b in bins],
        'return_period_years_poi': fin(rp_poi),
        'return_period_years_poi_ci90': [fin(poi_lo), fin(poi_hi)],
        'return_period_years_landfall': fin(rp_lf),
        'return_period_years_landfall_ci90': [fin(lf_lo), fin(lf_hi)],
        'return_period_years_landfall_region': (
            fin(rp_reg) if rp_reg is not None else None),
        'region': list(args.region) if args.region else None,
        'members': [os.path.basename(p) for p in paths],
    }
    out = json.dumps(report, indent=1)
    if args.json:
        with open(args.json, 'w') as f:
            f.write(out + '\n')
    print(out)

    if args.fig:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.5), dpi=150)
        fig.patch.set_facecolor('#fcfcfb')
        ax.set_facecolor('#fcfcfb')
        series = [('Landfall (anywhere)', rp_lf, (lf_lo, lf_hi), '#2a78d6'),
                  (f'POI ({args.poi_lon:.0f}E, {args.poi_lat:.0f}N, '
                   '100 km)', rp_poi, (poi_lo, poi_hi), '#eb6834')]
        if rp_reg is not None:
            series.append(('Landfall (region box)', rp_reg, None,
                           '#1baf7a'))
        for name, rp, band, color in series:
            m = np.isfinite(rp) & (rp > 0)
            ax.plot(bins[m] * MS_TO_KTS, rp[m], color=color, lw=2,
                    label=name)
            if band is not None:
                lo, hi = band
                mb = m & np.isfinite(lo) & np.isfinite(hi)
                ax.fill_between(bins[mb] * MS_TO_KTS, lo[mb], hi[mb],
                                color=color, alpha=0.18, lw=0)
        ax.set_yscale('log')
        ax.set_yticks([0.05, 0.1, 0.2, 0.5, 1, 2, 5, 10, 20, 50, 100,
                       200, 500])
        ax.get_yaxis().set_major_formatter('{x:g}')
        ax.yaxis.set_minor_locator(matplotlib.ticker.NullLocator())
        ax.set_xlabel('Intensity (kt)', color='#0b0b0b')
        ax.set_ylabel('Return period (years)', color='#0b0b0b')
        ax.set_title(f'Return periods — {n_tracks:,} storms, '
                     f'{total_years} simulated years',
                     color='#0b0b0b', fontsize=11)
        ax.grid(True, color='#e6e5e1', lw=0.7)
        for s in ax.spines.values():
            s.set_color('#c3c2b7')
        ax.tick_params(colors='#52514e')
        ax.legend(frameon=False, fontsize=9, labelcolor='#0b0b0b')
        fig.tight_layout()
        fig.savefig(args.fig)
        print('figure:', args.fig)


if __name__ == '__main__':
    main()
