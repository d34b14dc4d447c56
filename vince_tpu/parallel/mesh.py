"""Device-mesh bootstrap.

The TPU analog of the reference's GPU-id remapping (``arg_parser.py:223-232``):
instead of CUDA_VISIBLE_DEVICES lists, runs pick a 2-axis logical mesh

  - ``data``  — batch (data-parallel) axis; gradients are psum'd over it.
  - ``queue`` — negative-set sharding axis: the InfoNCE memory bank (the
    65,536-entry StorageQueue, reference ``utils/storage_queue.py``) is sharded
    over this axis and scored blockwise with a streaming softmax combine
    (SURVEY.md §5.7 — the "sequence-parallel analog" for contrastive scoring).

``queue_axis_size=1`` degenerates to plain data parallelism with a replicated
queue (the right choice up to q=65,536 at D=128: 32 MB of HBM).
"""

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
QUEUE_AXIS = "queue"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data_axis_size: int
    queue_axis_size: int = 1

    @property
    def num_devices(self) -> int:
        return self.data_axis_size * self.queue_axis_size


def make_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2D (data, queue) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data_axis_size=len(devices), queue_axis_size=1)
    n = spec.num_devices
    if n > len(devices):
        raise ValueError(f"mesh spec {spec} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(spec.data_axis_size, spec.queue_axis_size)
    return Mesh(grid, (DATA_AXIS, QUEUE_AXIS))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    d = mesh.shape[DATA_AXIS]
    if global_batch % d:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {d}")
    return global_batch // d
