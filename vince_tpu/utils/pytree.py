"""Pytree / array reshape helpers.

Replaces the ``dg_util.pytorch_util`` surface the reference leans on
(SURVEY.md §2.9): ``split_dim`` / ``remove_dim`` / ``expand_new_dim`` reshape
helpers (used throughout e.g. reference ``models/vince_model.py:148-170``),
``stack_dicts_in_list`` (reference ``solvers/vince_solver.py:365,430-432``),
``to_numpy`` / ``from_numpy``. All helpers are pure and jit-safe.
"""

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def split_dim(x: jax.Array, axis: int, *sizes: int) -> jax.Array:
    """Split ``axis`` into ``sizes`` (one entry may be -1)."""
    shape = list(x.shape)
    axis = axis % x.ndim
    new = list(sizes)
    if -1 in new:
        known = int(np.prod([s for s in new if s != -1]))
        new[new.index(-1)] = shape[axis] // known
    assert int(np.prod(new)) == shape[axis], (shape, axis, sizes)
    return x.reshape(shape[:axis] + new + shape[axis + 1 :])


def remove_dim(x: jax.Array, axis: int) -> jax.Array:
    """Merge ``axis`` into the preceding dimension (inverse of split_dim)."""
    shape = list(x.shape)
    axis = axis % x.ndim
    assert axis >= 1, "cannot merge axis 0 into its predecessor"
    return x.reshape(shape[: axis - 1] + [shape[axis - 1] * shape[axis]] + shape[axis + 1 :])


def expand_new_dim(x: jax.Array, axis: int, size: int) -> jax.Array:
    """Insert a new axis of ``size`` by broadcasting."""
    x = jnp.expand_dims(x, axis)
    reps = [1] * x.ndim
    reps[axis] = size
    return jnp.tile(x, reps)


def stack_dicts_in_list(dicts: Sequence[Dict[str, Any]], axis: int = 0) -> Dict[str, Any]:
    """Stack a list of dicts-of-arrays into one dict of stacked arrays.

    Keys missing from some dicts are dropped (matches the tolerant behavior the
    reference relies on when aggregating per-source metric dicts).
    """
    if not dicts:
        return {}
    keys = set(dicts[0].keys())
    for d in dicts[1:]:
        keys &= set(d.keys())
    out = {}
    for k in keys:
        vals = [d[k] for d in dicts]
        if isinstance(vals[0], (np.ndarray, jnp.ndarray)) and getattr(vals[0], "ndim", 0) > 0:
            out[k] = jnp.concatenate([jnp.asarray(v) for v in vals], axis=axis)
        else:
            out[k] = jnp.stack([jnp.asarray(v) for v in vals], axis=axis)
    return out


def to_numpy(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def from_numpy(x) -> jax.Array:
    return jnp.asarray(x)


def tree_size(tree) -> int:
    """Total number of parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def tree_norm(tree) -> jax.Array:
    """Global L2 norm of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def flatten_dict(d: Dict[str, Any], prefix: str = "", sep: str = "/") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out
