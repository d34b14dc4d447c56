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


def make_balanced_shuffle_perm(rng: jax.Array, global_batch: int, num_devices: int):
    """Block-balanced global permutation realizable by an ``all_to_all``.

    ``cross_device_shuffle`` moves the whole global batch to every device
    (an all_gather: each chip receives (d-1)·b rows to keep b). A
    permutation in which every destination device receives *exactly* b/d
    rows from every source device can instead be executed as
    local-perm → balanced all_to_all → local-perm, moving only (d-1)/d·b
    rows per chip — 1/d of the gather's traffic. The restriction to
    block-balanced permutations is immaterial for shuffled-BN's purpose
    (decorrelating each device's BN statistics from its own query batch,
    reference ``vince_model.py:137-142``): each destination keeps exactly
    b/d of its own rows every step — the full uniform shuffle's
    *expected* self-retention, here fixed by construction — and the
    remaining rows are a random balanced draw from the other devices.

    Returns ``(perm, sigma, tau)``:
      - ``perm``  [B]     the composite global permutation — device i's
        shuffled rows are ``x_global[perm][i*b:(i+1)*b]``; feed it to
        ``cross_device_unshuffle`` unchanged.
      - ``sigma`` [d, b]  stage-1 local perms (source side, rows ordered by
        destination chunk).
      - ``tau``   [d, b]  stage-2 local perms (destination side).

    Requires ``b % d == 0`` (each (source, dest) pair exchanges b/d rows).
    """
    assert global_batch % num_devices == 0
    b = global_batch // num_devices
    assert b % num_devices == 0, (
        f"balanced a2a shuffle needs per-device batch {b} divisible by "
        f"device count {num_devices}"
    )
    c = b // num_devices
    keys = jax.random.split(rng, 2 * num_devices)
    # vmap over the split keys: one permutation op in the trace regardless of
    # device count (a Python loop would unroll O(d) ops at pod scale)
    perm_b = jax.vmap(lambda k: jax.random.permutation(k, b))
    sigma = perm_b(keys[:num_devices])
    tau = perm_b(keys[num_devices:])
    # Composite: on dest i, received row m (pre-tau) came from source j = m//c,
    # within-chunk slot r = m%c, i.e. global row j*b + sigma[j, i*c + r].
    i_idx = jnp.arange(num_devices)[:, None]  # dest block
    j = tau // c
    r = tau % c
    perm = (j * b + sigma[j, i_idx * c + r]).reshape(global_batch)
    return perm, sigma, tau


def cross_device_shuffle_a2a(
    x_local: jax.Array, sigma: jax.Array, tau: jax.Array, axis: str = DATA_AXIS
):
    """Execute the balanced permutation from ``make_balanced_shuffle_perm``
    with an ``all_to_all`` (1/d the all_gather's interconnect traffic).
    Exactly equal to ``gather_global_batch(x)[perm]``'s local slice."""
    d_idx = lax.axis_index(axis)
    x_sorted = x_local[sigma[d_idx]]  # rows ordered by destination chunk
    x_recv = lax.all_to_all(x_sorted, axis, split_axis=0, concat_axis=0, tiled=True)
    return x_recv[tau[d_idx]]
