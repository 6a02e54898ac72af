"""Produce a JSON parity report (LMI distribution, seasonal cycle, genesis
latitudes, track density summary) from one or more tracks files.

Usage: python tools/parity_report.py tracks_A.nc [tracks_B.nc ...]

With two or more files, also prints KS statistics between the first file
and each other — the regression harness for integrator/optimization changes
(BASELINE.json parity metrics)."""
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402

from tropical_cyclone_risk_tpu import analysis  # noqa: E402


def report(ens):
    lmi = np.nanmax(np.where(np.isfinite(ens.vmax), ens.vmax, -np.inf),
                    axis=-1).ravel()
    lmi = lmi[np.isfinite(lmi)]
    lat0 = ens.lat[..., 0].ravel()
    lat0 = lat0[np.isfinite(lat0)]
    months = ens.tc_month.ravel().astype(int)
    h, lon_e, lat_e = analysis.track_density(ens, res_deg=5.0)
    return {
        'n_tracks': int(np.isfinite(ens.lon[..., 0]).sum()),
        'lmi_mean': round(float(lmi.mean()), 2),
        'lmi_p50': round(float(np.median(lmi)), 2),
        'lmi_p95': round(float(np.percentile(lmi, 95)), 2),
        'genesis_lat_mean_abs': round(float(np.abs(lat0).mean()), 2),
        'month_hist': np.bincount(months, minlength=13)[1:].tolist(),
        'density_nonzero_cells': int((h > 0).sum()),
        'seeds_total': float(ens.seeds_per_month.sum()),
    }, lmi, lat0


def main():
    paths = sys.argv[1:]
    if not paths:
        sys.exit(__doc__)
    base = None
    for p in paths:
        ens = analysis.open_tracks([p])
        rep, lmi, lat0 = report(ens)
        print(json.dumps({'file': os.path.basename(p), **rep}))
        if base is None:
            base = (lmi, lat0)
        else:
            from scipy.stats import ks_2samp
            print(json.dumps({
                'file': os.path.basename(p),
                'ks_lmi_vs_first': round(
                    float(ks_2samp(base[0], lmi).statistic), 4),
                'ks_genesis_lat_vs_first': round(
                    float(ks_2samp(base[1], lat0).statistic), 4),
            }))


if __name__ == '__main__':
    main()
