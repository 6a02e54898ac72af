#!/usr/bin/env python3
"""Drop-in equivalent of the reference's ``python3 run.py BASIN``."""
import sys

from tropical_cyclone_risk_tpu import cli

if __name__ == '__main__':
    sys.exit(cli.main())
