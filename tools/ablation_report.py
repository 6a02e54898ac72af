"""Intensity-dependent steering ablation at scale (reference
namelist.py:73-74 ``coupled_track``; the Lin et al. 2023 headline
configuration).  Compares two full runs of the same workspace — one with
intensity-dependent steering weights, one with the constant (0.2, 0.8)
weights — on track-displacement / recurvature / density statistics, and
writes a JSON summary + a figure.

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


def track_stats(ens: analysis.TrackEnsemble, lmi_min=0.0):
    """Zonal-displacement and recurvature statistics per track.

    Recurvature = the track's eastward (positive) zonal motion after its
    point of westernmost longitude, i.e. it turned back east."""
    lon, lat, vmax = ens.lon, ens.lat, ens.vmax
    with np.errstate(all='ignore'):
        lmi = np.nanmax(np.where(np.isfinite(vmax), vmax, -np.inf), axis=-1)
    sel = np.isfinite(lmi) & (lmi >= lmi_min)
    lon, lat = lon[sel], lat[sel]
    valid = np.isfinite(lon)
    n_valid = valid.sum(axis=-1)
    last = np.maximum(n_valid - 1, 0)
    take = lambda a, i: np.take_along_axis(a, i[:, None], axis=-1)[:, 0]
    lon0 = lon[:, 0]
    lon_end = take(np.where(valid, lon, 0.0), last)
    # unwrap displacement to (-180, 180]
    disp = (lon_end - lon0 + 180.0) % 360.0 - 180.0
    # westernmost point, then any eastward recovery >= 2 deg afterwards
    lon_w = np.where(valid, lon, np.inf).min(axis=-1)
    recovery = np.where(np.isfinite(lon_w), lon_end - lon_w, 0.0)
    recurved = recovery >= 2.0
    return {
        'n_tracks': int(sel.sum()),
        'zonal_disp_deg_mean': float(disp.mean()),
        'zonal_disp_deg_p10': float(np.percentile(disp, 10)),
        'zonal_disp_deg_p90': float(np.percentile(disp, 90)),
        'recurve_fraction': float(recurved.mean()),
        'east_recovery_deg_mean': float(recovery.mean()),
        '_disp': disp,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('on_glob', help='tracks files of the coupled_track run')
    ap.add_argument('off_glob', help='tracks files of the constant-weight run')
    ap.add_argument('--lmi-min', type=float, default=40.0,
                    help='intensity threshold for the "intense" subset')
    ap.add_argument('--json', default=None)
    ap.add_argument('--fig', default=None)
    args = ap.parse_args(argv)

    ens_on = analysis.open_tracks(sorted(glob.glob(args.on_glob)))
    ens_off = analysis.open_tracks(sorted(glob.glob(args.off_glob)))

    report = {'lmi_min_ms': args.lmi_min}
    disps = {}
    for name, ens in (('coupled_on', ens_on), ('coupled_off', ens_off)):
        all_s = track_stats(ens)
        int_s = track_stats(ens, lmi_min=args.lmi_min)
        disps[name] = int_s.pop('_disp')
        all_s.pop('_disp')
        report[name] = {'all': all_s, 'intense': int_s}

    # track-density overlap between the two configurations
    d_on, lon_e, lat_e = analysis.track_density(ens_on, res_deg=2.0)
    d_off, _, _ = analysis.track_density(ens_off, res_deg=2.0)
    p, q = d_on / d_on.sum(), d_off / d_off.sum()
    report['density_overlap'] = float(np.minimum(p, q).sum())
    on_i, off_i = report['coupled_on']['intense'], \
        report['coupled_off']['intense']
    report['intense_disp_shift_deg'] = round(
        on_i['zonal_disp_deg_mean'] - off_i['zonal_disp_deg_mean'], 3)
    report['intense_recurve_shift'] = round(
        on_i['recurve_fraction'] - off_i['recurve_fraction'], 4)

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
        bins = np.arange(-60, 41, 4.0)
        for name, color in (('coupled_on', '#2a78d6'),
                            ('coupled_off', '#eb6834')):
            h, edges = np.histogram(disps[name], bins=bins, density=True)
            c = 0.5 * (edges[:-1] + edges[1:])
            ax.plot(c, h, color=color, lw=2,
                    label='intensity-dependent steering' if
                    name == 'coupled_on' else 'constant (0.2, 0.8) weights')
        ax.set_xlabel('Zonal displacement of intense tracks (deg east)',
                      color='#0b0b0b')
        ax.set_ylabel('Density', color='#0b0b0b')
        ax.set_title(f'Steering ablation — LMI >= {args.lmi_min:.0f} m/s '
                     f'tracks', color='#0b0b0b', fontsize=11)
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
