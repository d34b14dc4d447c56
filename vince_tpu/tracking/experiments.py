"""Tracking evaluation harnesses.

Replaces the ``got10k.experiments`` dependency (reference
``end_task_tracking_solver.py:100-116`` runs ``ExperimentOTB`` then reports).
Implements the standard OTB metrics:

  - precision: fraction of frames whose predicted center is within a pixel
    threshold of ground truth; the headline number uses 20px.
  - success: IoU success curve over thresholds [0, 1]; headline = AUC.

Works against any sequence reader exposing ``seq_names`` + ``__getitem__ →
(img_files, anno)`` (OTBSequences, GOT10kSequences, SyntheticSequences).
"""

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from vince_tpu.tracking.ops import iou_xyxy, xywh_to_xyxy
from vince_tpu.tracking.sequences import OTBSequences, SyntheticSequences


def center_error(pred_xywh, gt_xywh) -> float:
    p = pred_xywh[:2] + pred_xywh[2:] / 2
    g = gt_xywh[:2] + gt_xywh[2:] / 2
    return float(np.linalg.norm(p - g))


def compute_metrics(pred_boxes: np.ndarray, gt_boxes: np.ndarray) -> Dict[str, np.ndarray]:
    n = min(len(pred_boxes), len(gt_boxes))
    ious = np.array(
        [iou_xyxy(xywh_to_xyxy(pred_boxes[i]), xywh_to_xyxy(gt_boxes[i])) for i in range(n)]
    )
    errors = np.array([center_error(pred_boxes[i], gt_boxes[i]) for i in range(n)])
    return {"ious": ious, "center_errors": errors}


class ExperimentOTB:
    """OTB-2015 protocol: one-pass evaluation (OPE)."""

    def __init__(self, root: Optional[str], result_dir: str = "results/OTB2015",
                 sequences=None, texture: bool = False):
        if sequences is not None:
            self.sequences = sequences
        elif root and os.path.isdir(root):
            self.sequences = OTBSequences(root)
        elif texture:
            # non-color-separable smoke eval: grating target over grating
            # background (tracking.sequences.TextureSequences)
            from vince_tpu.tracking.sequences import TextureSequences

            print("OTB data not found; using TEXTURE sequences for smoke eval")
            self.sequences = TextureSequences(num_seqs=3, num_frames=12)
        else:
            print("OTB data not found; using synthetic sequences for smoke eval")
            self.sequences = SyntheticSequences(num_seqs=3, num_frames=12)
        self.result_dir = result_dir
        self.nbins_iou = 21
        self.nbins_ce = 51

    def run(self, tracker) -> Dict[str, float]:
        """One-pass evaluation. A tracker exposing ``track_all`` (the batched
        lockstep tracker) is driven over all sequences in one call — same
        metrics, minutes instead of hours on a real benchmark."""
        per_seq = {}
        os.makedirs(self.result_dir, exist_ok=True)
        if hasattr(tracker, "track_all"):
            seqs = [self.sequences[i] for i in range(len(self.sequences))]
            t0 = time.time()
            tracked = tracker.track_all([(f, a[0]) for f, a in seqs])
            wall = time.time() - t0
            total_frames = sum(len(f) for f, _ in seqs)
            print(f"  batched: {len(seqs)} sequences / {total_frames} frames "
                  f"in {wall:.1f}s = {total_frames / wall:.1f} aggregate fps")
            per_frame = [(boxes, times) for boxes, times in tracked]
        else:
            per_frame = None
        for i in range(len(self.sequences)):
            img_files, anno = self.sequences[i]
            name = self.sequences.seq_names[i]
            if per_frame is not None:
                boxes, times = per_frame[i]
            else:
                boxes, times = tracker.track(img_files, anno[0])
            m = compute_metrics(boxes, anno)
            fps = len(img_files) / max(times.sum(), 1e-9)
            per_seq[name] = {
                "success_auc": float(self._success_auc(m["ious"])),
                "precision_20px": float(np.mean(m["center_errors"] <= 20)),
                "fps": float(fps),
            }
            print(f"  [{i + 1}/{len(self.sequences)}] {name}: "
                  f"prec={per_seq[name]['precision_20px']:.3f} "
                  f"succ={per_seq[name]['success_auc']:.3f} fps={fps:.1f}")
        results = {
            # OTB convention: average per-sequence scores
            "precision": float(np.mean([s["precision_20px"] for s in per_seq.values()])),
            "success": float(np.mean([s["success_auc"] for s in per_seq.values()])),
            "speed_fps": float(np.mean([s["fps"] for s in per_seq.values()])),
        }
        if isinstance(self.sequences, SyntheticSequences):
            # the smoke fallback must never be mistaken for a real OTB score
            # downstream (logs, reports): tag it loudly.
            results["synthetic"] = True
            results["num_sequences"] = len(self.sequences)
        with open(os.path.join(self.result_dir, f"{tracker.name}.json"), "w") as f:
            json.dump({"overall": results, "per_sequence": per_seq}, f, indent=2)
        return results

    def _success_auc(self, ious: np.ndarray) -> float:
        thresholds = np.linspace(0, 1, self.nbins_iou)
        curve = [(ious > t).mean() for t in thresholds]
        return float(np.mean(curve))
