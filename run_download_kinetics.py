#!/usr/bin/env python
"""Entry shim (reference run_download_kinetics.py)."""
from vince_tpu.scrape.download_kinetics import main

if __name__ == "__main__":
    main()
