"""PIF (parallel integrate-and-fire) predictor for E-Paraformer.

TPU-native rebuild of FunASR ``funasr/models/e_paraformer/pif_predictor.py:17-131``
(E-Paraformer, Interspeech 2024): alphas come from a depthwise conv + residual head
like CIF, but instead of the sequential integrate-and-fire, each output token k
attends to encoder frames with a per-head Gaussian kernel centered where the alpha
cumsum crosses k+0.5:

    score[b,h,k,t] = -((k+0.5 - cumsum(alpha)[b,t]) * sigma[h])^2 + bias[h]
    weights = softmax_t(score);  emb[b,k] = concat_h(weights @ hidden_h)

This is one einsum over (K, T) — fully parallel, no scan — which maps directly onto
the MXU and is strictly friendlier to TPUs than sequential CIF.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    depthwise_conv1d_apply,
    depthwise_conv1d_init,
    linear_apply,
    linear_init,
)
from funasr_tpu.register import tables


class PifConfig(NamedTuple):
    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    sigma: float = 0.5
    bias: float = 0.0
    sigma_heads: int = 4


@tables.register("predictor_classes", "PifPredictor")
class PifPredictor:
    """Same call contract as CifPredictorV2: ``(params, hidden, mask, max_tokens,
    target_length=None) -> (acoustic_embeds, token_num, alphas, fires=None)``."""

    def __init__(self, idim: int, l_order: int = 1, r_order: int = 1,
                 threshold: float = 1.0, smooth_factor: float = 1.0,
                 noise_threshold: float = 0.0, sigma: float = 0.5,
                 bias: float = 0.0, sigma_heads: int = 4, **kwargs):
        self.cfg = PifConfig(idim, l_order, r_order, threshold, smooth_factor,
                             noise_threshold, sigma, bias, sigma_heads)

    def init(self, rng):
        c = self.cfg
        k1, k2 = jax.random.split(rng)
        return {
            "cif_conv1d": depthwise_conv1d_init(k1, c.idim,
                                                c.l_order + c.r_order + 1, bias=True),
            "cif_output": linear_init(k2, c.idim, 1),
            "sigma": jnp.full((c.sigma_heads,), c.sigma, jnp.float32),
            "bias": jnp.full((c.sigma_heads,), c.bias, jnp.float32),
        }

    def alphas(self, params, hidden, mask):
        """hidden: (B, T, D) -> per-frame alphas (B, T) fp32 (reference
        ``forward:84-100``: depthwise conv + residual -> relu -> linear -> sigmoid)."""
        c = self.cfg
        mem = depthwise_conv1d_apply(params["cif_conv1d"], hidden,
                                     left_pad=c.l_order, right_pad=c.r_order)
        h = jax.nn.relu(mem + hidden)
        a = jax.nn.sigmoid(
            linear_apply(params["cif_output"], h)[..., 0].astype(jnp.float32))
        a = jax.nn.relu(a * c.smooth_factor - c.noise_threshold)
        if mask is not None:
            a = a * mask.astype(jnp.float32)
        return a

    def __call__(self, params, hidden, mask, max_tokens: int, target_length=None):
        c = self.cfg
        b, t, d = hidden.shape
        hh = c.sigma_heads
        a = self.alphas(params, hidden, mask)
        token_num = jnp.sum(a, axis=1)

        if target_length is not None:
            tgt = target_length.astype(jnp.float32)
        else:
            tgt = jnp.round(token_num)
        a = a * (tgt / jnp.maximum(token_num, 1e-9))[:, None]

        alignment = jnp.cumsum(a, axis=-1)  # (B, T)
        fire_pos = jnp.arange(max_tokens, dtype=jnp.float32) + 0.5  # (K,)
        sigma = params["sigma"].astype(jnp.float32)
        bias = params["bias"].astype(jnp.float32)
        # (B, H, K, T)
        delta = fire_pos[None, None, :, None] - alignment[:, None, None, :]
        scores = -(delta * sigma[None, :, None, None]) ** 2 \
            + bias[None, :, None, None]
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=-1)
        n_hidden = hidden.reshape(b, t, hh, d // hh).transpose(0, 2, 1, 3)
        emb = jnp.einsum("bhkt,bhtd->bhkd", weights,
                         n_hidden.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        emb = emb.transpose(0, 2, 1, 3).reshape(b, max_tokens, d)
        # zero out positions past the (target or predicted) length
        valid = (jnp.arange(max_tokens)[None] < tgt[:, None]).astype(emb.dtype)
        emb = emb * valid[..., None]
        if target_length is not None:
            out_token_num = token_num
        else:
            out_token_num = tgt
        return emb.astype(hidden.dtype), out_token_num, a, None
