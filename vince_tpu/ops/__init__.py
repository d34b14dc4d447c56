from vince_tpu.ops.queue import QueueState, init_queue, enqueue, dequeue  # noqa: F401
from vince_tpu.ops.ema import ema_update  # noqa: F401
from vince_tpu.ops.infonce import (  # noqa: F401
    multi_pair_infonce,
    multi_frame_mask,
    moco_mask,
    nce_accuracy,
)
