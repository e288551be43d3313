"""Consistency-regularized CTC (counterpart of FunASR ``funasr/losses/cr_ctc.py``):
two augmented views of the same utterance, CTC on both plus a symmetric KL
consistency term between their frame posteriors."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cr_ctc_loss(logits_a, logits_b, logit_lengths, labels, label_lengths,
                blank_id: int = 0, cr_weight: float = 0.2):
    """logits_{a,b}: (B, T, V) from two augmentations -> scalar loss."""
    t = logits_a.shape[1]
    logit_pad = (jnp.arange(t)[None] >= logit_lengths[:, None]).astype(jnp.float32)
    l = labels.shape[1]
    label_pad = (jnp.arange(l)[None] >= label_lengths[:, None]).astype(jnp.float32)
    labels_clean = jnp.where(label_pad > 0, 0, labels)

    ctc_a = jnp.mean(optax.ctc_loss(logits_a.astype(jnp.float32), logit_pad,
                                    labels_clean, label_pad, blank_id=blank_id))
    ctc_b = jnp.mean(optax.ctc_loss(logits_b.astype(jnp.float32), logit_pad,
                                    labels_clean, label_pad, blank_id=blank_id))

    logp_a = jax.nn.log_softmax(logits_a.astype(jnp.float32), -1)
    logp_b = jax.nn.log_softmax(logits_b.astype(jnp.float32), -1)
    p_a, p_b = jnp.exp(logp_a), jnp.exp(logp_b)
    valid = (1.0 - logit_pad)[..., None]
    kl_ab = jnp.sum(p_a * (logp_a - logp_b) * valid)
    kl_ba = jnp.sum(p_b * (logp_b - logp_a) * valid)
    n = jnp.maximum(jnp.sum(1.0 - logit_pad), 1.0)
    consistency = (kl_ab + kl_ba) / (2.0 * n)
    return 0.5 * (ctc_a + ctc_b) + cr_weight * consistency
