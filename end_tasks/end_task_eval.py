"""Path-parity shim for reference end_tasks/end_task_eval.py (the root
run_end_task_eval.py wraps the same main)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from run_end_task_eval import main

if __name__ == "__main__":
    main()
