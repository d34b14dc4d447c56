#!/usr/bin/env python
"""End-task evaluation entry (reference run_end_task_eval.py +
end_tasks/end_task_eval.py): parse args, build the solver with no loggers,
call run_eval()."""
from vince_tpu import arg_parser
from vince_tpu.solver_runner import get_solver_class


def main():
    args = arg_parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    solver = get_solver_class(args.solver or "EndTaskImagenetSolver")(args)
    try:
        solver.run_eval()
    finally:
        solver.end()


if __name__ == "__main__":
    main()
