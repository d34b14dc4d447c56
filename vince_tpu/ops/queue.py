"""HBM-resident negative memory bank as a pure-functional ring buffer.

Capability parity with the reference ``utils/storage_queue.py`` (StorageQueue):
  - init: random L2-normalized vectors (``storage_queue.py:10-12``)
  - enqueue with wraparound (``storage_queue.py:31-49`` — the recursive split
    becomes a single modular scatter, which XLA turns into one on-device
    dynamic-update; no host round trip)
  - dequeue returns the full detached bank (``storage_queue.py:51-56``)

Deliberate improvements over the reference (SURVEY.md §5.4): the queue lives in
the jitted train-state pytree, so it is donated/aliased across steps (zero
HBM traffic beyond the B-row insert) and can be checkpointed (the reference
refills the queue from scratch on resume instead).

The reference's parallel ``image_queue`` / ``data_source_queue`` lists (CPU
images for visualization) are host-side state: sources are tracked on-device as
an int32 tag array; images live in ``HostImageRing`` (no device transfer).
"""

from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class QueueState:
    """[K, D] bank + scalar ring pointer + monotone fill counter."""

    vectors: jax.Array  # [K, D] float32, L2-normalized rows
    sources: jax.Array  # [K] int32 data-source tags (-1 = virgin random init)
    tail: jax.Array  # scalar int32 — next insert position
    # fill counter, SATURATED at the global K by the enqueue ops (its only
    # consumers are `full` and the solver's restored-bank gate `total > 0`;
    # a raw lifetime count would overflow int32 after ~2.1e9 inserts and flip
    # both answers)
    total: jax.Array

    @property
    def maxsize(self) -> int:
        return self.vectors.shape[0]

    @property
    def full(self) -> jax.Array:
        """Valid on an UNSHARDED state only: a shard state's vectors hold
        K/num_shards rows while ``total`` counts global inserts."""
        return self.total >= self.maxsize


def init_queue(rng: jax.Array, maxsize: int, feat_size: int, dtype=jnp.float32) -> QueueState:
    v = jax.random.normal(rng, (maxsize, feat_size), dtype=jnp.float32)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return QueueState(
        vectors=v.astype(dtype),
        sources=jnp.full((maxsize,), -1, dtype=jnp.int32),
        tail=jnp.zeros((), jnp.int32),
        total=jnp.zeros((), jnp.int32),
    )


def enqueue(state: QueueState, items: jax.Array, source: Optional[jax.Array] = None) -> QueueState:
    """Insert ``items`` [B, D] at the tail with modular wraparound.

    Equivalent to the recursive two-part copy at ``storage_queue.py:35-49`` for
    any B <= K; expressed as one scatter so it stays a single fused XLA op.
    """
    k = state.maxsize
    b = items.shape[0]
    assert b <= k, f"enqueue batch {b} larger than queue {k}"
    idx = (state.tail + jnp.arange(b, dtype=jnp.int32)) % k
    vectors = state.vectors.at[idx].set(items.astype(state.vectors.dtype))
    if source is None:
        source = jnp.zeros((b,), jnp.int32)
    else:
        source = jnp.broadcast_to(jnp.asarray(source, jnp.int32), (b,))
    sources = state.sources.at[idx].set(source)
    return state.replace(
        vectors=vectors,
        sources=sources,
        tail=(state.tail + b) % k,
        total=jnp.minimum(state.total + b, k),
    )


def enqueue_sharded(
    state: QueueState,
    items: jax.Array,
    source: Optional[jax.Array] = None,
    *,
    shard_index: jax.Array = 0,
    num_shards: int = 1,
) -> QueueState:
    """Sharded-bank enqueue for use inside shard_map: ``state.vectors`` is this
    device's row shard [K/num_shards, D] of a global-K ring; ``tail``/``total``
    are replicated global counters. Every device computes the same global
    insert positions; rows landing outside its shard are dropped via the
    out-of-bounds scatter mode (single fused scatter, no host logic).

    ``num_shards=1`` reduces exactly to ``enqueue``.
    """
    shard_size = state.vectors.shape[0]
    k_global = shard_size * num_shards
    b = items.shape[0]
    assert b <= k_global, f"enqueue batch {b} larger than queue {k_global}"
    global_idx = (state.tail + jnp.arange(b, dtype=jnp.int32)) % k_global
    local_pos = global_idx - jnp.asarray(shard_index, jnp.int32) * shard_size
    # rows not owned by this shard → index shard_size (OOB) → dropped
    local_pos = jnp.where(
        (local_pos >= 0) & (local_pos < shard_size), local_pos, shard_size
    )
    vectors = state.vectors.at[local_pos].set(
        items.astype(state.vectors.dtype), mode="drop"
    )
    if source is None:
        source = jnp.zeros((b,), jnp.int32)
    else:
        source = jnp.broadcast_to(jnp.asarray(source, jnp.int32), (b,))
    sources = state.sources.at[local_pos].set(source, mode="drop")
    return state.replace(
        vectors=vectors,
        sources=sources,
        tail=(state.tail + b) % k_global,
        total=jnp.minimum(state.total + b, k_global),
    )


def dequeue(state: QueueState) -> Dict[str, jax.Array]:
    """The full bank, reference ``storage_queue.py:51-56`` (detach is implicit:
    callers use it under ``stop_gradient`` / outside grad tracing)."""
    return {
        "queue_vectors": jax.lax.stop_gradient(state.vectors),
        "queue_data_sources": state.sources,
    }


class HostImageRing:
    """Host-side ring of uint8 thumbnails that positionally mirrors the device
    queue: same capacity, same tail arithmetic, enqueued every step in the
    same order the jitted step inserts keys — so NN-panel "queue" rows show
    the actual scored negatives (reference ``storage_queue.py:13-14`` keeps
    full CPU images in exact parallel; we keep thumbnails). After a
    checkpoint restore the device bank is repopulated but host images are
    gone; ``clear(tail)`` re-syncs the pointer and leaves unknown entries
    None (panels render them black)."""

    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self.images = [None] * maxsize
        self.sources = [None] * maxsize
        self.tail = 0

    def enqueue(self, images, source: str):
        for im in images:
            self.images[self.tail] = np.asarray(im)
            self.sources[self.tail] = source
            self.tail = (self.tail + 1) % self.maxsize

    def fill_repeat(self, images, sources):
        """Mirror ``fill_queue``/``fill_queue_repeat``: tile the given
        thumbnails over the whole ring and reset the tail to 0."""
        n = len(images)
        for i in range(self.maxsize):
            self.images[i] = np.asarray(images[i % n])
            self.sources[i] = sources[i % n]
        self.tail = 0

    def clear(self, tail: int = 0):
        self.images = [None] * self.maxsize
        self.sources = [None] * self.maxsize
        self.tail = tail % self.maxsize
