"""SiamFC tracking head.

Parity with reference ``models/end_task_tracking_model.py``: 1×1 conv
projections (256ch) for exemplar & search features (:24-25), batched
cross-correlation scaled by ``out_scale=1e-3`` (:43-53 → ``ops/xcorr.py``),
FocalLoss (:22), metrics incl. response distance / center distance / IoU of
the argmax box (:65-102).
"""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from vince_tpu.ops.xcorr import fast_xcorr
from vince_tpu.tracking import losses as track_losses


class SiamFCTrackingModel(nn.Module):
    proj_channels: int = 256
    out_scale: float = 1e-3

    def setup(self):
        self.exemplar_decoder = nn.Conv(self.proj_channels, (1, 1), name="exemplar_decoder")
        self.search_patch_decoder = nn.Conv(self.proj_channels, (1, 1), name="search_patch_decoder")

    def __call__(self, exemplar_features: jax.Array, search_features: jax.Array) -> jax.Array:
        """NHWC spatial features → response logits [B, hy, wy, 1]."""
        z = self.exemplar_decoder(exemplar_features)
        x = self.search_patch_decoder(search_features)
        return fast_xcorr(z, x, out_scale=self.out_scale)

    def project(self, exemplar_features=None, search_features=None):
        """Individual projections for the tracker inference loop (exemplar
        kernel computed once at init, reference tracker.py:73-77)."""
        out = {}
        if exemplar_features is not None:
            out["z"] = self.exemplar_decoder(exemplar_features)
        if search_features is not None:
            out["x"] = self.search_patch_decoder(search_features)
        return out


def prediction_to_box(responses: jax.Array) -> jax.Array:
    """Argmax of each response map → normalized [cx, cy, 0.5, 0.5] boxes
    (reference :88-102)."""
    b = responses.shape[0]
    flat = responses.reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1)
    h, w = responses.shape[1], responses.shape[2]
    row = (idx // w).astype(jnp.float32) + 0.5
    col = (idx % w).astype(jnp.float32) + 0.5
    return jnp.stack([col / w, row / h, jnp.full((b,), 0.5), jnp.full((b,), 0.5)], axis=0)


def _xywh_to_xyxy(box):
    cx, cy, w, h = box[0], box[1], box[2], box[3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=0)


def tracking_losses(
    responses: jax.Array, labels: jax.Array, reduce: bool = True
) -> Dict[str, jax.Array]:
    """loss + metrics dict (reference :55-86). ``reduce=False`` → per-sample
    ``[B]`` arrays (focal renorm per sample — see losses.focal_loss)."""
    labels = labels.astype(jnp.float32)
    loss = track_losses.focal_loss(responses, labels, reduce=reduce)
    sig = jax.nn.sigmoid(responses)
    map_axes = tuple(range(1, sig.ndim))
    dist = jnp.abs(sig - labels).mean() if reduce else jnp.abs(sig - labels).mean(map_axes)
    pred_boxes = prediction_to_box(responses[..., 0] if responses.ndim == 4 else responses)
    center_dist = (
        jnp.abs(pred_boxes[:2] - 0.5).mean()
        if reduce
        else jnp.abs(pred_boxes[:2] - 0.5).mean(axis=0)
    )
    gt = _xywh_to_xyxy(jnp.asarray([0.5, 0.5, 0.5, 0.5]))
    pred = _xywh_to_xyxy(pred_boxes)
    ix1 = jnp.maximum(pred[0], gt[0])
    iy1 = jnp.maximum(pred[1], gt[1])
    ix2 = jnp.minimum(pred[2], gt[2])
    iy2 = jnp.minimum(pred[3], gt[3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_p = (pred[2] - pred[0]) * (pred[3] - pred[1])
    area_g = (gt[2] - gt[0]) * (gt[3] - gt[1])
    iou = inter / jnp.maximum(area_p + area_g - inter, 1e-12)
    return {
        "loss/siam_tracking_loss": loss,
        "dist": dist,
        "center_dist": center_dist,
        "mean_iou": iou.mean() if reduce else iou,
    }
