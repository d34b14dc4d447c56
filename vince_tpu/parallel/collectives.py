"""Cross-device collective helpers used inside the shard_map'ped train step.

These are the TPU-native replacements for what the reference got "for free"
from single-process ``nn.DataParallel`` (SURVEY.md §2.10, §5.8):

  - ``cross_device_shuffle`` / ``cross_device_unshuffle``: sample-level global
    batch shuffle for shuffled-BN (MoCo's BN-leakage control; reference does an
    in-process randperm before the DataParallel scatter,
    ``vince_model.py:137-142,184-192`` — here it is an all_gather + shared
    permutation + local slice over the ``data`` mesh axis).
  - ``gather_global_batch``: the MoCo-DDP ``concat_all_gather`` — every chip
    sees the global key batch before scoring/enqueue (SURVEY.md §5.8).
"""

import jax
import jax.numpy as jnp
from jax import lax

from vince_tpu.parallel.mesh import DATA_AXIS


def gather_global_batch(x_local: jax.Array, axis: str = DATA_AXIS) -> jax.Array:
    """[b, ...] per-device → [B_global, ...] on every device (tiled gather)."""
    return lax.all_gather(x_local, axis, tiled=True)


def make_shuffle_perm(rng: jax.Array, global_batch: int) -> jax.Array:
    """Shared random permutation (identical on all devices — rng is replicated)."""
    return jax.random.permutation(rng, global_batch)


def cross_device_shuffle(x_local: jax.Array, perm: jax.Array, axis: str = DATA_AXIS):
    """Each device ends up with rows perm[d*b:(d+1)*b] of the global batch."""
    xg = gather_global_batch(x_local, axis)[perm]
    d = lax.axis_index(axis)
    b = x_local.shape[0]
    return lax.dynamic_slice_in_dim(xg, d * b, b, axis=0)


def cross_device_unshuffle(y_local: jax.Array, perm: jax.Array, axis: str = DATA_AXIS):
    """Inverse of cross_device_shuffle, returning the *global* un-shuffled
    array (callers typically need all keys anyway for inter-batch scoring)."""
    yg = gather_global_batch(y_local, axis)
    return yg[jnp.argsort(perm)]
