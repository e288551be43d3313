"""Standard multi-head attention + espnet-style positional encodings.

Counterpart of FunASR ``funasr/models/transformer/attention.py`` (MultiHeadedAttention,
RelPositionMultiHeadedAttention) and ``embedding.py`` (PositionalEncoding with
interleaved sin/cos and ``x*sqrt(d)`` scaling, RelPositionalEncoding).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import linear_apply, linear_init, masked_softmax


class MHAConfig(NamedTuple):
    n_head: int
    n_feat: int

    @property
    def d_k(self):
        return self.n_feat // self.n_head


def mha_init(rng, cfg: MHAConfig):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "linear_q": linear_init(k1, cfg.n_feat, cfg.n_feat),
        "linear_k": linear_init(k2, cfg.n_feat, cfg.n_feat),
        "linear_v": linear_init(k3, cfg.n_feat, cfg.n_feat),
        "linear_out": linear_init(k4, cfg.n_feat, cfg.n_feat),
    }


def _heads(x, h, dk):
    b, t, _ = x.shape
    return x.reshape(b, t, h, dk).transpose(0, 2, 1, 3)


def mha_apply(params, cfg: MHAConfig, query, key, value, mask=None):
    """mask: broadcastable bool (B, 1|Tq, Tk), True = attend."""
    q = _heads(linear_apply(params["linear_q"], query), cfg.n_head, cfg.d_k)
    k = _heads(linear_apply(params["linear_k"], key), cfg.n_head, cfg.d_k)
    v = _heads(linear_apply(params["linear_v"], value), cfg.n_head, cfg.d_k)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(cfg.d_k)
    if mask is not None:
        mask = mask[:, None] if mask.ndim == 3 else mask[:, None, None, :]
    attn = masked_softmax(scores.astype(query.dtype), mask)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    b, h, t, dk = ctx.shape
    out = ctx.transpose(0, 2, 1, 3).reshape(b, t, h * dk).astype(query.dtype)
    return linear_apply(params["linear_out"], out)


def relpos_mha_init(rng, cfg: MHAConfig):
    p = mha_init(rng, cfg)
    k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 5), 3)
    p["linear_pos"] = linear_init(k1, cfg.n_feat, cfg.n_feat, bias=False)
    p["pos_bias_u"] = jax.random.normal(k2, (cfg.n_head, cfg.d_k)) * 0.02
    p["pos_bias_v"] = jax.random.normal(k3, (cfg.n_head, cfg.d_k)) * 0.02
    return p


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL relative shift."""
    b, h, t, n = x.shape
    zero_pad = jnp.zeros((b, h, t, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, n + 1, t)
    x = x_padded[:, :, 1:].reshape(b, h, t, n)
    return x[:, :, :, : (n + 1) // 2]


def relpos_mha_apply(params, cfg: MHAConfig, x, pos_emb, mask=None):
    """Rel-pos self attention (espnet non-legacy): pos_emb (1, 2T-1, D)."""
    q = _heads(linear_apply(params["linear_q"], x), cfg.n_head, cfg.d_k)
    k = _heads(linear_apply(params["linear_k"], x), cfg.n_head, cfg.d_k)
    v = _heads(linear_apply(params["linear_v"], x), cfg.n_head, cfg.d_k)
    p = _heads(linear_apply(params["linear_pos"], pos_emb.astype(x.dtype)),
               cfg.n_head, cfg.d_k)  # (1, H, 2T-1, dk)
    q_u = q + params["pos_bias_u"].astype(q.dtype)[None, :, None, :]
    q_v = q + params["pos_bias_v"].astype(q.dtype)[None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,shnd->bhqn", q_v, p, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd.astype(x.dtype)).astype(jnp.float32)
    scores = (ac + bd) / math.sqrt(cfg.d_k)
    if mask is not None:
        mask = mask[:, None] if mask.ndim == 3 else mask[:, None, None, :]
    attn = masked_softmax(scores.astype(x.dtype), mask)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    b, h, t, dk = ctx.shape
    out = ctx.transpose(0, 2, 1, 3).reshape(b, t, h * dk).astype(x.dtype)
    return linear_apply(params["linear_out"], out)


# ---------------------------------------------------------------------------
# espnet positional encodings
# ---------------------------------------------------------------------------


def espnet_pe(t: int, d: int, dtype=jnp.float32, offset: int = 0):
    """Interleaved sin/cos PE (espnet PositionalEncoding table), (T, D)."""
    pos = jnp.arange(offset, offset + t, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * -(math.log(10000.0) / d))
    pe = jnp.zeros((t, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def add_espnet_pe(x, offset: int = 0):
    """x * sqrt(d) + PE."""
    d = x.shape[-1]
    return x * math.sqrt(d) + espnet_pe(x.shape[1], d, x.dtype, offset)[None]


def rel_pos_emb(t: int, d: int, dtype=jnp.float32):
    """Relative PE table (1, 2T-1, D): positions T-1 .. -(T-1) (espnet RelPositional)."""
    pos = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * -(math.log(10000.0) / d))
    pe = jnp.zeros((2 * t - 1, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe[None].astype(dtype)
