"""CMIP6 (GCM) data acquisition via ESGF search.

Reference equivalent: scripts/download_cmip6.py + scripts/GFDL-CM4/wget_*.sh —
the reference bundles pre-generated ESGF wget scripts for six GFDL-CM4
ssp585 variables (ua/va day; hus/psl/ta Amon; tos Omon).  This module
constructs the equivalent ESGF search URLs programmatically (testable
offline) and downloads with urllib when the network is available.
"""

from __future__ import annotations

import os
import urllib.parse
import urllib.request
from typing import Dict, List

from tropical_cyclone_risk_tpu.config import Namelist

ESGF_SEARCH = 'https://esgf-node.llnl.gov/esg-search/search'

# variable -> table mapping of the reference's bundled wget scripts
# (scripts/GFDL-CM4/wget_{ua,va,hus,psl,ta,tos}*.sh)
DEFAULT_VARIABLES: Dict[str, str] = {
    'ua': 'day', 'va': 'day',
    'hus': 'Amon', 'psl': 'Amon', 'ta': 'Amon',
    'tos': 'Omon',
}


def search_url(variable: str, table: str, source_id: str = 'GFDL-CM4',
               experiment_id: str = 'ssp585', member: str = 'r1i1p1f1',
               limit: int = 500) -> str:
    """ESGF RESTful search URL for one variable's file listing."""
    q = {
        'type': 'File', 'project': 'CMIP6', 'source_id': source_id,
        'experiment_id': experiment_id, 'variant_label': member,
        'variable_id': variable, 'table_id': table,
        'format': 'application/solr+json', 'limit': str(limit),
    }
    return ESGF_SEARCH + '?' + urllib.parse.urlencode(q)


def list_file_urls(variable: str, table: str, **kw) -> List[str]:
    """Query ESGF for HTTPServer download URLs (requires network)."""
    import json
    with urllib.request.urlopen(search_url(variable, table, **kw),
                                timeout=60) as r:
        docs = json.load(r)['response']['docs']
    urls = []
    for d in docs:
        for u in d.get('url', []):
            href, _, kind = u.partition('|')
            if 'HTTPServer' in u:
                urls.append(href.split('|')[0])
    return sorted(set(urls))


def download_all(cfg: Namelist, variables: Dict[str, str] = None,
                 source_id: str = 'GFDL-CM4',
                 experiment_id: str = 'ssp585') -> List[str]:
    """Download every file of every variable into cfg.base_directory
    (idempotent, like the reference's wget -c loops)."""
    variables = variables or DEFAULT_VARIABLES
    os.makedirs(cfg.base_directory, exist_ok=True)
    out = []
    for var, table in variables.items():
        for url in list_file_urls(var, table, source_id=source_id,
                                  experiment_id=experiment_id):
            path = os.path.join(cfg.base_directory, os.path.basename(url))
            out.append(path)
            if os.path.exists(path):
                continue
            tmp = path + '.part'
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, path)
    return out
