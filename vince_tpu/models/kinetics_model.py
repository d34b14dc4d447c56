"""Kinetics-400 action-recognition decoder.

Parity with reference ``models/end_task_kinetics_400_model.py``: a 1-layer
LSTM(hidden 512) over per-frame encoder features, last hidden state → linear to
400 classes (:14-28); CE loss (:30-34); accuracy (:36-43). Realized with
``flax.linen.RNN`` over an ``LSTMCell`` — ``lax.scan`` under the hood, so the
≤10-step unroll compiles to one fused loop on the TPU.
"""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class Kinetics400Model(nn.Module):
    num_classes: int = 400
    hidden_size: int = 512

    @nn.compact
    def __call__(self, frame_features: jax.Array) -> jax.Array:
        """frame_features: [B, T, F] → logits [B, num_classes]."""
        rnn = nn.RNN(nn.LSTMCell(self.hidden_size), name="lstm")
        hidden_seq = rnn(frame_features)  # [B, T, H]
        last = hidden_seq[:, -1]  # last hidden state, reference :26
        return nn.Dense(self.num_classes, name="fc")(last)


def kinetics_losses(
    logits: jax.Array, labels: jax.Array, reduce: bool = True
) -> Dict[str, jax.Array]:
    ce = optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), labels)
    acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    return {
        "loss/classifier_loss_0": ce.mean() if reduce else ce,
        "classifier_accuracy_0": acc.mean() if reduce else acc,
    }
