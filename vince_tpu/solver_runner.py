"""Training entry point — parity with reference ``solver_runner.py``:
build loggers (skipped under ``--debug``), instantiate the solver by registry
name, optional ``--test-first`` val, epoch loop (LR warmup lives inside the
jitted schedule), crash-save in ``finally`` (``solver_runner.py:49-54``)."""

import os
import traceback

from vince_tpu import arg_parser
from vince_tpu.utils.logger import Logger


def get_solver_class(name: str):
    from vince_tpu.solvers.vince_solver import VinceSolver

    registry = {"VinceSolver": VinceSolver}
    try:
        from vince_tpu.solvers.end_task_solvers import (
            EndTaskImagenetSolver,
            EndTaskKinetics400Solver,
            EndTaskSunSceneSolver,
            EndTaskTrackingSolver,
        )

        registry.update(
            EndTaskImagenetSolver=EndTaskImagenetSolver,
            EndTaskSunSceneSolver=EndTaskSunSceneSolver,
            EndTaskTrackingSolver=EndTaskTrackingSolver,
            EndTaskKinetics400Solver=EndTaskKinetics400Solver,
        )
    except ImportError as e:
        # tolerated only for genuinely optional deps; say what failed so a
        # real import bug doesn't surface later as a bare KeyError for a
        # valid solver name
        print(f"end-task solvers unavailable ({e}); registry has: "
              f"{sorted(registry)}")
    return registry[name]


def main(argv=None):
    args = arg_parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from vince_tpu.parallel import multihost

    multihost.initialize(args)  # no-op unless --distributed

    train_logger = val_logger = None
    if not args.debug and multihost.is_primary():
        # multi-controller runs: tensorboard (like all host-side
        # observability) is process 0's job; metrics are pmean'd across the
        # mesh so every process computes identical values anyway
        train_logger = Logger(os.path.join(args.tensorboard_dir, "train"))
        val_logger = Logger(os.path.join(args.tensorboard_dir, "val"))

    solver = get_solver_class(args.solver or "VinceSolver")(args, train_logger, val_logger)

    failed = True  # KeyboardInterrupt/SystemExit skip the except/else below
    try:
        if args.test_first:
            print("Running initial Val")
            solver.reset_epoch()
            solver.run_val()

        while solver.epoch < args.epochs:
            solver.reset_epoch()
            print("Running Train epoch", solver.epoch)
            for _ in range(solver.iterations_per_epoch):
                solver.run_train_iteration()
            print("Running Val")
            solver.run_val()
            solver.epoch += 1
    except Exception:
        traceback.print_exc()
        failed = True
    else:
        failed = False
    finally:
        # crash-save parity (solver_runner.py:49-54) — save BEFORE shutdown.
        # Under --distributed a crash-save is a collective the surviving
        # peers (stuck inside the step's collectives) can never join — skip
        # it and exit; the jax.distributed heartbeat tears the peers down
        # and recovery restarts from the last periodic checkpoint.
        if args.save and not (failed and multihost.is_multiprocess()):
            print("Saving models")
            solver.save()
        elif failed and multihost.is_multiprocess():
            print("crash under --distributed: skipping the (collective) "
                  "crash-save; resume from the last periodic checkpoint")
        solver.end()
        # flush buffered tensorboard events (short runs never hit the
        # writer's auto-flush threshold and would leave empty event files)
        for logger in (train_logger, val_logger):
            if logger is not None:
                logger.close()
    if failed:
        # the reference swallows the exception after the crash-save (exit 0
        # even on failure); shell drivers and sweeps need the truth
        raise SystemExit(1)


if __name__ == "__main__":
    main()
