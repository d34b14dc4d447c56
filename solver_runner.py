#!/usr/bin/env python
"""Repo-root shim keeping the reference's CLI entry path:
``python solver_runner.py --solver VinceSolver --dataset R2V2Dataset ...``"""

from vince_tpu.solver_runner import main

if __name__ == "__main__":
    main()
