"""Path-parity shim for reference download_scripts/recreate_r2v2_dataset.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from vince_tpu.scrape.recreate_r2v2_dataset import main

if __name__ == "__main__":
    main()
