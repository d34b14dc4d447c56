#!/usr/bin/env python
"""Entry shim (reference run_cache_video_dataset.py)."""
from vince_tpu.scrape.cache_video_dataset import main

if __name__ == "__main__":
    main()
