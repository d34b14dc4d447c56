"""Path-parity shim for reference download_scripts/download_r2v2.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from vince_tpu.scrape.download_r2v2 import main

if __name__ == "__main__":
    main()
