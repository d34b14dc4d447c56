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
        res = solver.run_eval()
        if res:
            # machine-readable line for tools/first_networked_host.py's
            # ±0.005 parity check against the reference README table
            import json

            print("EVAL_RESULT " + json.dumps(
                {k: float(v) for k, v in res.items()}, sort_keys=True
            ))
    finally:
        solver.end()


if __name__ == "__main__":
    main()
