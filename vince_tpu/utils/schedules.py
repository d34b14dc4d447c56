"""Learning-rate schedules.

Parity with the reference's epoch-level decay (``base_solver.py:107-129``):
cosine ``lr·0.5(1+cos(π·epoch/epochs))`` or step ``lr·0.1^(#milestones ≤
epoch)``, combined with the runner's linear warmup over the first 500
*iterations* (``solver_runner.py:36-43``). Expressed as a single optax-style
``schedule(step) -> lr`` on the global iteration count (epoch = step //
iterations_per_epoch), so it lives inside the jitted update — no host-side
param-group mutation."""

from typing import Sequence

import jax.numpy as jnp

WARMUP_ITERATIONS = 500  # reference solver_runner.py:37


def vince_lr_schedule(
    base_lr: float,
    epochs: int,
    iterations_per_epoch: int,
    decay_type: str = "cos",
    step_schedule: Sequence[int] = (120, 160),
    use_warmup: bool = True,
    warmup_iterations: int = WARMUP_ITERATIONS,
):
    step_schedule = tuple(step_schedule)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / iterations_per_epoch)
        if decay_type == "cos":
            lr = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))
        elif decay_type == "step":
            factor = jnp.ones(())
            for m in step_schedule:
                factor = factor * jnp.where(epoch >= m, 0.1, 1.0)
            lr = base_lr * factor
        else:
            raise ValueError(f"unknown lr decay type {decay_type!r}")
        if use_warmup:
            # reference warms up from iteration 1: scale = min(1, it/500)
            scale = jnp.minimum(1.0, (step + 1.0) / warmup_iterations)
            lr = lr * scale
        return lr

    return schedule
