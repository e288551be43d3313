"""Continuous Integrate-and-Fire (CIF), TPU-native.

The reference's vectorized ``cif_v1`` (FunASR ``funasr/models/paraformer/cif_predictor.py:
853-908``: f64 cumsum + floor-difference fire detection + prefix-sum segment extraction)
maps naturally onto XLA, but its dynamic-length outputs don't. This implementation keeps
everything static-shape:

* fires:  ``csum = cumsum(alphas)``; frame t fires when ``floor(csum[t])`` increases.
  Since ``alphas = sigmoid(..) <= 1`` and threshold 1.0, at most one fire per frame.
* weights: a firing frame splits its alpha between the completing token
  (``floor(csum[t]) - csum[t-1]``) and the next token (``csum[t] - floor(csum[t])``).
* token embeddings: one einsum ``(B,T,K) x (B,T,D) -> (B,K,D)`` against the weight
  matrix — an MXU matmul instead of scatter ops.

``max_tokens`` is a static bucket; tokens beyond a row's fire count are zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cif_fires(alphas):
    """alphas: (B, T) fp32 -> (fires (B,T), fire_mask (B,T) bool, csum).

    ``fires`` matches the reference convention: 1 + leftover fraction at firing frames,
    integrate value elsewhere (used by timestamp prediction). Cumsum runs in fp32; for
    VAD-bounded segments (<= ~2k frames, alpha sums ~ hundreds) this is exact enough —
    the reference's f64 cumsum guards multi-minute unsegmented audio only.
    """
    csum = jnp.cumsum(alphas.astype(jnp.float32), axis=1)
    floor = jnp.floor(csum)
    prev_floor = jnp.concatenate([jnp.zeros_like(floor[:, :1]), floor[:, :-1]], axis=1)
    fire_mask = floor > prev_floor
    fires = fire_mask.astype(jnp.float32) + csum - floor
    return fires, fire_mask, csum


def cif(hidden, alphas, max_tokens: int, threshold: float = 1.0):
    """hidden (B,T,D), alphas (B,T) -> (frames (B,max_tokens,D), fires (B,T)).

    ``threshold`` must be 1.0 (the only value the reference ships; the floor-diff
    formulation assumes unit threshold).
    """
    assert threshold == 1.0, "CIF floor-difference form requires threshold == 1.0"
    b, t, d = hidden.shape
    fires, fire_mask, csum = cif_fires(alphas)
    floor = jnp.floor(csum)
    prev_csum = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum[:, :-1]], axis=1)
    prev_floor = jnp.concatenate([jnp.zeros_like(floor[:, :1]), floor[:, :-1]], axis=1)

    alphas_f = alphas.astype(jnp.float32)
    w_cur = jnp.where(fire_mask, floor - prev_csum, alphas_f)  # weight to current token
    w_next = jnp.where(fire_mask, csum - floor, 0.0)  # leftover to next token

    tok = prev_floor.astype(jnp.int32)  # token being built at frame t (0-based)
    k = max_tokens
    onehot_cur = jax.nn.one_hot(tok, k, dtype=jnp.float32)
    onehot_next = jax.nn.one_hot(tok + 1, k, dtype=jnp.float32)
    w = w_cur[..., None] * onehot_cur + w_next[..., None] * onehot_next  # (B,T,K)

    frames = jnp.einsum(
        "btk,btd->bkd", w, hidden.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    # Only completed tokens (index < per-row fire count) are real.
    n_fires = jnp.sum(fire_mask, axis=1).astype(jnp.int32)
    valid = jnp.arange(k)[None, :] < n_fires[:, None]
    frames = jnp.where(valid[..., None], frames, 0.0)
    return frames.astype(hidden.dtype), fires


def cif_wo_hidden(alphas):
    """fires only (streaming decode helper; reference ``cif_wo_hidden_v1``)."""
    return cif_fires(alphas)[0]


def cif_scan_step(carry, alpha_hidden, threshold: float = 1.0):
    """One streaming CIF integration step for ``jax.lax.scan``.

    carry: (integrate (B,), frame (B,D)). Returns updated carry plus per-step
    (fire_mask, fired_frame) — the chunked predictor uses this to emit tokens with the
    reference's sequential semantics (``cif_predictor.py:768-815``).
    """
    integrate, frame = carry
    alpha, hidden = alpha_hidden
    dist_completion = threshold - integrate
    integrate = integrate + alpha
    fire = integrate >= threshold
    cur = jnp.where(fire, dist_completion, alpha)
    remains = alpha - cur
    fired_frame = frame + cur[:, None] * hidden
    new_frame = jnp.where(fire[:, None], remains[:, None] * hidden, fired_frame)
    new_integrate = jnp.where(fire, integrate - threshold, integrate)
    return (new_integrate, new_frame), (fire, fired_frame)
