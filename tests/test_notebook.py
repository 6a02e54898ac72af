"""Execute the ported analysis notebook end-to-end against a freshly
generated two-member ensemble — the L6 surface exactly as a reference user
consumes it (reference notebooks/sample_analysis.ipynb, SURVEY.md C20).
Only the two configuration cells are rewritten (ensemble paths, land-mask
path); every analysis cell runs verbatim."""

import json
import os

os.environ.setdefault('MPLBACKEND', 'Agg')

import jax
import numpy as np

from tropical_cyclone_risk_tpu.config import Namelist
from tropical_cyclone_risk_tpu.io import netcdf
from tropical_cyclone_risk_tpu.models.fields import synthetic_pack
from tropical_cyclone_risk_tpu import runtime
import pytest

pytestmark = pytest.mark.slow  # end-to-end notebook execution on a freshly generated ensemble (~2 min)


NB = os.path.join(os.path.dirname(__file__), '..', 'notebooks',
                  'sample_analysis.ipynb')


def test_notebook_executes(tmp_path):
    cfg = Namelist().replace(output_directory=str(tmp_path), exp_name='nb',
                             start_year=2016, end_year=2017,
                             tracks_per_year=8, seed_batch=1024)
    pack = synthetic_pack(cfg, n_planes=24, nlat=91, nlon=180, seed=3)
    fn1 = runtime.run_downscaling(cfg, 'GL', pack, key=jax.random.key(7))
    fn2 = runtime.run_downscaling(cfg, 'GL', pack, key=jax.random.key(8))
    assert fn2.endswith('_e0.nc')

    # a coarse land file for the landfall cells (same convention as
    # preprocess.static.load_land: land [lat, lon] with 0-360 lon)
    lat = np.linspace(-90.0, 90.0, 91)
    lon = np.arange(0.0, 360.0, 2.0)
    llon, llat = np.meshgrid(lon, lat)
    land = (((llon > 240) & (llon < 300) & (llat > 15) & (llat < 60))
            | (llat < -75)).astype(np.float32)
    fn_land = str(tmp_path / 'land.nc')
    netcdf.write(fn_land, {'land': (('lat', 'lon'), land)},
                 coords={'lat': lat, 'lon': lon})

    nb = json.load(open(NB))
    code = [(i, ''.join(c['source'])) for i, c in enumerate(nb['cells'])
            if c['cell_type'] == 'code']
    assert len(code) >= 9
    ns: dict = {}
    ran = []
    for i, src in code:
        src = src.replace(
            "'data/era5/test/tracks_NA_era5_201601_202112.nc',",
            f"'{fn1}',\n    '{fn2}',")
        src = src.replace('path/to/land.nc', fn_land)
        exec(compile(src, f'sample_analysis-cell{i}', 'exec'), ns)
        ran.append(i)
        import matplotlib.pyplot as plt
        plt.close('all')

    assert len(ran) == len(code)
    ens = ns['ens']
    assert ens.n_ensemble == 2
    # the notebook's analysis quantities came out populated
    assert np.isfinite(ns['freq']).all() and ns['c'] > 0
    assert ns['h'].sum() > 0                      # track density counts
    assert np.isfinite(ns['dens']).all()          # LMI density
