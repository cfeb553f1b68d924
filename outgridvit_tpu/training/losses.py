"""Losses, always computed in fp32 (reference `one_epoch_train.py:92-96`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_target_cross_entropy(logits: jnp.ndarray, targets_soft: jnp.ndarray):
    """-(t * log_softmax(logits)).sum(-1).mean() (reference
    `cutmix_mixup_aug.py:11-13`)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(targets_soft.astype(jnp.float32) * logp).sum(axis=-1).mean()


def cross_entropy_smoothed(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
):
    """torch-equivalent ``F.cross_entropy(logits, labels, label_smoothing=s)``:
    (1-s) * NLL + s * mean over classes of -log p."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll
    return loss.mean()
