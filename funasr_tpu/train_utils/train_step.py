"""Sharded training step builder.

One GSPMD program replaces the reference's DDP/FSDP/DeepSpeed branches (FunASR
``funasr/bin/train.py:80-170``, ``train_utils/trainer.py:367-490``): batch sharded over
the "data" mesh axis, params replicated (DDP), FSDP-sharded, or TP-sharded
(``funasr_tpu.parallel.sharding``); XLA inserts the gradient psum.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def make_train_step(model, tx: optax.GradientTransformation,
                    clip_grad_norm: Optional[float] = None) -> Callable:
    """Returns step(params, opt_state, batch, rng) -> (params, opt_state, stats).

    ``batch``: dict with speech/speech_lengths/text/text_lengths. Weighted-loss
    normalization across data shards happens implicitly: the loss is already a mean
    over the global (sharded) batch. Non-finite grad norm skips the update (reference
    ``trainer.py:472-477`` behavior).
    """

    def loss_fn(params, batch, rng):
        loss, stats, weight = model.forward_jit(
            params, batch["speech"], batch["speech_lengths"], batch["text"],
            batch["text_lengths"], rng)
        return loss, stats

    def step(params, opt_state, batch, rng):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        gnorm = optax.global_norm(grads)
        stats = dict(stats)
        stats["grad_norm"] = gnorm
        if clip_grad_norm is not None:
            scale = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # skip non-finite updates
        ok = jnp.isfinite(gnorm)
        params_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        opt_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old) if new.shape == old.shape else new,
            new_opt_state, opt_state)
        return params_out, opt_out, stats

    return step
