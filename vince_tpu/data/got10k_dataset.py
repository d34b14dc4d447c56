"""GOT-10k SiamFC pair dataset (registry entry ``GOT10kDataset``).

Parity with reference ``datasets/got10k_dataset.py``: GOT-10k sequence reader
+ SiamFCTransforms pair crops; the normalize step moves on-device. The label
geometry comes from the tracker cfg (``end_task_tracking_solver.py:13-46``):
response_sz=17, positive_label_width=5, exemplar 120 / instance 255.
"""

from vince_tpu.data.pair_dataset import PairDataset
from vince_tpu.tracking.sequences import GOT10kSequences, SyntheticSequences
from vince_tpu.tracking.siamfc_transforms import SiamFCTransforms

TRACKER_CFG = {
    # reference end_task_tracking_solver.py:13-46 (defaults used everywhere)
    "out_scale": 0.001,
    "exemplar_sz": 120,
    "instance_sz": 255,
    "context": 0.5,
    "scale_num": 3,
    "scale_step": 1.0375,
    "scale_lr": 0.59,
    "scale_penalty": 0.9745,
    "window_influence": 0.176,
    "response_sz": 17,
    "response_up": 16,
    "positive_label_width": 5,
    "total_stride": 8,
    "epoch_num": 50,
    "batch_size": 8,
    "initial_lr": 1e-2,
    "ultimate_lr": 1e-5,
    "weight_decay": 5e-4,
    "momentum": 0.9,
    "r_pos": 16,
    "r_neg": 0,
}


def make_pair_transform(cfg=None) -> SiamFCTransforms:
    cfg = cfg or TRACKER_CFG
    return SiamFCTransforms(
        exemplar_sz=cfg["exemplar_sz"],
        instance_sz=cfg["instance_sz"],
        context=cfg["context"],
        label_size=cfg["response_sz"],
        positive_label_width=cfg["positive_label_width"],
    )


class GOT10kDataset(PairDataset):
    def __init__(self, args, data_subset: str = "train", pairs_per_seq: int = 25):
        if getattr(args, "data_path", None):
            seqs = GOT10kSequences(args.data_path, "train" if data_subset == "train" else "val")
        elif getattr(args, "synthetic_texture", False):
            from vince_tpu.tracking.sequences import TextureSequences

            seqs = TextureSequences(num_seqs=8)
        else:
            seqs = SyntheticSequences(num_seqs=8)
        super().__init__(
            args, seqs, data_subset,
            pair_transform=make_pair_transform(),
            pairs_per_seq=pairs_per_seq,
        )
