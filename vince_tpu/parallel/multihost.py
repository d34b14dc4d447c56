"""Multi-host (multi-process / multi-controller) runtime support.

The reference is a single-host program (``nn.DataParallel`` over one
machine's GPUs — SURVEY.md §5.8); scaling it further meant rewriting around
NCCL/DDP. Here the jitted step is already a global SPMD program over a
``jax.sharding.Mesh``, so pod-scale (multi-host, DCN-connected) training is
the *same program* run by N controller processes. What multi-controller
execution changes is only the host side, and this module owns all of it:

  - ``initialize``     — ``jax.distributed.initialize`` bootstrap (TPU pods
                         auto-detect; explicit coordinator flags otherwise;
                         CPU test clusters use gloo collectives).
  - ``stage``          — per-process host batches → one global ``jax.Array``
                         (``make_array_from_process_local_data``): each host
                         feeds only its own devices' rows.
  - ``global_from_full_host`` — a host value every process holds in full
                         (e.g. the broadcast queue prefill bank) → a global
                         sharded array via ``make_array_from_callback``.
  - ``broadcast_host`` — process 0's host pytree to all processes (queue
                         prefill must be identical everywhere: queue shards
                         are replicated across the data axis).
  - ``fetch``          — global array → full host numpy on every process
                         (``process_allgather`` when shards are remote).

In single-process runs every helper degrades to the plain JAX call it
replaces, so solvers call these unconditionally.
"""

import numpy as np

import jax

_initialized = False


def initialize(args) -> None:
    """Bootstrap the JAX distributed runtime when ``--distributed`` is set.

    Must run before the first device query. Idempotent. On TPU pods all
    coordinator arguments auto-detect (pass none); for manual clusters (and
    the CPU test harness) supply ``--coordinator-address``,
    ``--num-processes`` and ``--process-id``.
    """
    global _initialized
    if not getattr(args, "distributed", False) or _initialized:
        return
    if getattr(args, "platform", "") == "cpu":
        # multi-process CPU clusters (offline pod simulation) need a
        # cross-process collective transport; gloo ships with jaxlib
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    coord = getattr(args, "coordinator_address", "") or None
    nproc = getattr(args, "num_processes", 0) or 0
    pid = getattr(args, "process_id", -1)
    if coord or nproc or pid >= 0:
        # manual cluster: partial flags silently auto-detect (or come up as
        # a 1-process "cluster" training on a slice of every batch) — demand
        # all three explicitly
        if not (coord and nproc and pid >= 0):
            raise ValueError(
                "manual clusters need all three of --coordinator-address, "
                f"--num-processes, --process-id (got {coord!r}, {nproc}, {pid})"
            )
        kwargs = dict(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    print(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns logging/visualization side effects."""
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def stage(sharding, value):
    """Host rows → global array on ``sharding`` (leaf or pytree).

    Single-process: a plain ``device_put`` (the perf-measured staging path).
    Multi-process: ``value`` holds only this process's rows of the global
    batch dimension; every process contributes its slice.
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(sharding, np.asarray(v)),
        value,
    )


def global_from_full_host(sharding, full_value):
    """A full host array (identical on every process) → global sharded array.

    Used where the host computes the complete value of a *sharded* global
    array (queue prefill bank): each process places the slices its own
    devices own. Identity across processes is the caller's contract —
    ``broadcast_host`` establishes it.
    """
    full_value = np.asarray(full_value)
    if jax.process_count() == 1:
        return jax.device_put(full_value, sharding)
    return jax.make_array_from_callback(
        full_value.shape, sharding, lambda idx: full_value[idx]
    )


def place(shardings, tree):
    """Host state pytree (identical on every process) → global arrays.

    Single-process: ``device_put`` (unchanged fast path). Multi-process:
    per-leaf ``make_array_from_callback``; leaves that are already global
    (non-fully-addressable) arrays — e.g. restored checkpoints — pass
    through untouched. The identical-on-every-process contract comes from
    deterministic same-seed init or an explicit ``broadcast_host``.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def _place_leaf(x, s):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return global_from_full_host(s, x)

    return jax.tree_util.tree_map(_place_leaf, tree, shardings)


def broadcast_host(tree):
    """Process 0's host pytree → every process (numpy leaves out).

    No-op (identity) in single-process runs.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def fetch(x) -> np.ndarray:
    """Global array → complete host value, on every process.

    Fully-addressable arrays (replicated outputs, single-process runs) are a
    plain ``device_get``; cross-process sharded arrays (the queue bank at
    mq>1 on a pod) are gathered with ``process_allgather``.
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def local_view(x) -> np.ndarray:
    """This process's rows of a batch-dim-sharded global array, in the order
    the process fed them (``stage``'s inverse). Fully-addressable arrays
    (single-process) return the whole value."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    shards = sorted(
        x.addressable_shards, key=lambda s: (s.index[0].start or 0)
    )
    parts, seen = [], set()
    for s in shards:  # skip replicas (a sharding replicated over some axis)
        key = s.index[0].start or 0
        if key in seen:
            continue
        seen.add(key)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts)


def host_allsum(values):
    """Sum a flat list/array of host floats across processes (identity
    single-process). Used to combine per-process partial metric sums.

    Precision note: the gather rides a jitted collective, which canonicalizes
    to float32 with x64 off — each PARTIAL crosses the wire as float32 (one
    rounding, ~1e-7 relative), but the final sum over processes happens in
    float64 on the host. Exact for sample counts below 2**24 per process.
    """
    arr = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(arr))
    return gathered.astype(np.float64).sum(axis=0)


def sync(name: str = "sync") -> None:
    """Cross-process barrier (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
