"""RNN-T (transducer) loss as an XLA lattice scan.

The reference uses warp-rnnt/torchaudio CUDA kernels (FunASR
``funasr/models/transducer/model.py``); here the forward algorithm runs as a
``lax.scan`` over time with an inner scan over the label axis — static (T, U+1)
lattice, batched, differentiable through JAX autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def rnnt_loss(logits, targets, logit_lengths, target_lengths, blank_id: int = 0):
    """logits: (B, T, U+1, V) joint log-probs (pre-softmax ok); targets: (B, U).

    Returns per-sequence negative log-likelihood (B,).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    b, t_max, u1, v = logp.shape
    u_max = u1 - 1

    blank_lp = logp[..., blank_id]  # (B, T, U+1)
    tgt = jnp.where(jnp.arange(u_max)[None] < target_lengths[:, None], targets, 0)
    emit_lp = jnp.take_along_axis(
        logp[:, :, :u_max, :], tgt[:, None, :, None].repeat(t_max, 1), axis=-1
    )[..., 0]  # (B, T, U) log p(y_{u+1} | t, u)

    u_idx = jnp.arange(u1)

    def time_step(alpha_prev, xs):
        blank_t, emit_t = xs  # (B, U+1), (B, U)

        # horizontal (time) move into row t: alpha_prev + blank at (t-1, u)
        from_blank = alpha_prev + blank_t

        # vertical (label) moves within row t: sequential in u -> inner scan
        def label_step(carry, inputs):
            fb_u, em_prev = inputs  # from_blank[:, u], emit_t at u-1
            val = jnp.logaddexp(fb_u, carry + em_prev)
            return val, val

        init = from_blank[:, 0]
        _, rest = jax.lax.scan(
            label_step, init,
            (from_blank[:, 1:].swapaxes(0, 1), emit_t.swapaxes(0, 1)))
        alpha = jnp.concatenate([init[:, None], rest.swapaxes(0, 1)], axis=1)
        return alpha, None

    # alpha at t=0: alpha[0,0]=0; alpha[0,u] = sum emit[0, :u]
    emit0 = emit_lp[:, 0]
    alpha0 = jnp.concatenate(
        [jnp.zeros((b, 1)), jnp.cumsum(emit0, axis=1)], axis=1)
    # mask out invalid label positions (u > target_len)
    valid_u = u_idx[None] <= target_lengths[:, None]
    alpha0 = jnp.where(valid_u, alpha0, NEG_INF)

    def scan_body(alpha, xs):
        blank_t, emit_t, t = xs
        new_alpha, _ = time_step(alpha, (blank_t, emit_t))
        new_alpha = jnp.where(valid_u, new_alpha, NEG_INF)
        # freeze rows past each sequence's length
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    ts = jnp.arange(1, t_max)
    # blank transition into row t consumes the blank at (t-1, u); emit moves stay in row t
    alpha_final, _ = jax.lax.scan(
        scan_body, alpha0,
        (blank_lp[:, :-1].swapaxes(0, 1), emit_lp[:, 1:].swapaxes(0, 1), ts))

    # total log prob: alpha[T-1, U] + blank(T-1, U)
    last_alpha = jnp.take_along_axis(alpha_final, target_lengths[:, None], 1)[:, 0]
    last_blank = blank_lp[jnp.arange(b), logit_lengths - 1, target_lengths]
    return -(last_alpha + last_blank)
