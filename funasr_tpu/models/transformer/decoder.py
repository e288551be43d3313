"""Autoregressive Transformer decoder (embed+PE, causal self-attn, cross-attn).

Counterpart of FunASR ``funasr/models/transformer/decoder.py`` (TransformerDecoder);
supports full teacher-forced forward (training) and a batched single-step scoring path
for beam search (whole-prefix recompute under jit — O(L^2) per step but static-shape,
MXU-dense, and far simpler than per-layer kv caches at ASR lengths <=100 tokens).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    embedding_apply, embedding_init, ffn_apply, ffn_init, layer_norm_apply,
    layer_norm_init, linear_apply, linear_init, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.transformer.attention import (
    MHAConfig, add_espnet_pe, mha_apply, mha_init)
from funasr_tpu.register import tables


class TransformerDecoderConfig(NamedTuple):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    normalize_before: bool = True

    @property
    def dim(self):
        return self.encoder_output_size

    @property
    def mha(self):
        return MHAConfig(self.attention_heads, self.dim)


def _layer_init(rng, cfg):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"norm1": layer_norm_init(cfg.dim), "norm2": layer_norm_init(cfg.dim),
            "norm3": layer_norm_init(cfg.dim),
            "self_attn": mha_init(k1, cfg.mha),
            "src_attn": mha_init(k2, cfg.mha),
            "feed_forward": ffn_init(k3, cfg.dim, cfg.linear_units)}


def _layer_apply(params, cfg, x, tgt_mask, memory, memory_mask):
    residual = x
    h = layer_norm_apply(params["norm1"], x)
    x = residual + mha_apply(params["self_attn"], cfg.mha, h, h, h, tgt_mask)
    residual = x
    h = layer_norm_apply(params["norm2"], x)
    x = residual + mha_apply(params["src_attn"], cfg.mha, h, memory, memory,
                             memory_mask[:, None, :])
    residual = x
    h = layer_norm_apply(params["norm3"], x)
    return residual + ffn_apply(params["feed_forward"], h)


@tables.register("decoder_classes", "TransformerDecoder")
class TransformerDecoder:
    def __init__(self, vocab_size: int, encoder_output_size: int,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, normalize_before: bool = True, **kwargs):
        self.cfg = TransformerDecoderConfig(vocab_size, encoder_output_size,
                                            attention_heads, linear_units,
                                            num_blocks, normalize_before)

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        return {
            "embed": embedding_init(keys[0], cfg.vocab_size, cfg.dim),
            "decoders": stack_params([
                _layer_init(keys[1 + i], cfg) for i in range(cfg.num_blocks)]),
            "after_norm": layer_norm_init(cfg.dim),
            "output_layer": linear_init(keys[-1], cfg.dim, cfg.vocab_size),
        }

    def _run(self, params, ys, tgt_mask, memory, memory_mask):
        cfg = self.cfg
        x = add_espnet_pe(embedding_apply(params["embed"], ys, dtype=memory.dtype))

        def body(carry, lp):
            return _layer_apply(lp, cfg, carry, tgt_mask, memory, memory_mask), None

        x, _ = jax.lax.scan(body, x, params["decoders"])
        x = layer_norm_apply(params["after_norm"], x)
        return linear_apply(params["output_layer"], x)

    def __call__(self, params, hs_pad, hlens, ys_in_pad, ys_in_lens):
        """Teacher-forced: causal + padding mask."""
        l = ys_in_pad.shape[1]
        causal = jnp.tril(jnp.ones((l, l), bool))
        pad = make_pad_mask(ys_in_lens, l)
        tgt_mask = causal[None] & pad[:, None, :]
        memory_mask = make_pad_mask(hlens, hs_pad.shape[1])
        logits = self._run(params, ys_in_pad, tgt_mask, hs_pad, memory_mask)
        return logits, ys_in_lens

    def score_step(self, params, ys, ys_len, memory, memory_mask):
        """Next-token log-probs for prefixes ``ys`` (N, Lmax) of lengths ``ys_len``.

        Recomputes the whole prefix (static Lmax) — jit-cached per Lmax bucket.
        Returns (N, V) log-probs at the last valid position.
        """
        l = ys.shape[1]
        causal = jnp.tril(jnp.ones((l, l), bool))
        pad = make_pad_mask(ys_len, l)
        tgt_mask = causal[None] & pad[:, None, :]
        logits = self._run(params, ys, tgt_mask, memory, memory_mask)
        last = jnp.take_along_axis(
            logits, (ys_len - 1)[:, None, None].repeat(logits.shape[-1], -1),
            axis=1)[:, 0]
        return jax.nn.log_softmax(last.astype(jnp.float32), -1)
