"""Label-smoothing KL loss (reference: ``funasr/losses/label_smoothing_loss.py:14``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(logits, targets, ignore_id: int = -1,
                         smoothing: float = 0.1, vocab_size: int | None = None,
                         normalize_length: bool = False):
    """KL(true_dist || softmax(logits)) with uniform smoothing, padding ignored.

    logits: (B, T, V); targets: (B, T) int with ``ignore_id`` padding.
    Normalizes by batch size (reference default) or token count.
    """
    v = vocab_size or logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    # KL(td||p) = sum td*log(td) - sum td*logp ; the entropy term is constant but the
    # reference includes it (torch KLDivLoss on a constructed true_dist), so keep it.
    true_entropy = -(confidence * jnp.log(confidence + 1e-30)
                     + (v - 1) * low * jnp.log(low + 1e-30))
    cross = confidence * jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    cross = cross + low * (jnp.sum(logp, axis=-1)
                           - jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0])
    kl = (-true_entropy - cross) * valid
    denom = jnp.sum(valid) if normalize_length else targets.shape[0]
    return jnp.sum(kl) / denom


def th_accuracy(logits, targets, ignore_id: int = -1):
    """Token accuracy over non-ignored positions (reference ``compute_acc.py:4``)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)
