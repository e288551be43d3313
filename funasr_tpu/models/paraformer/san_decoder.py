"""Paraformer SAN decoder: plain multi-head self-attention over the semantic
embeddings (no FSMN memory).

TPU-native rebuild of FunASR ``funasr/models/paraformer/decoder.py``
``ParaformerSANDecoder`` (registered also as ``ParaformerDecoderSAN``, the
name used by some community configs): bidirectional MHA self-attn over the CIF
embeddings + cross-attention to the encoder + FFN, taking (B, U, D) embeddings
directly (non-autoregressive, no causal mask).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    embedding_apply,
    embedding_init,
    ffn_apply,
    ffn_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    make_pad_mask,
)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.register import tables


class SANDecoderConfig(NamedTuple):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    att_layer_num: int = 6
    use_output_layer: bool = True

    @property
    def dim(self):
        return self.encoder_output_size

    @property
    def mha(self):
        return MHAConfig(self.attention_heads, self.dim)


def _layer_init(rng, cfg: SANDecoderConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"norm1": layer_norm_init(cfg.dim), "norm2": layer_norm_init(cfg.dim),
            "norm3": layer_norm_init(cfg.dim),
            "self_attn": mha_init(k1, cfg.mha),
            "src_attn": mha_init(k2, cfg.mha),
            "feed_forward": ffn_init(k3, cfg.dim, cfg.linear_units)}


@tables.register("decoder_classes", "ParaformerSANDecoder")
@tables.register("decoder_classes", "ParaformerDecoderSAN")
@tables.register("decoder_classes", "ParaformerDecoderSANExport")
class ParaformerSANDecoder:
    def __init__(self, vocab_size: int, encoder_output_size: int,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, att_layer_num: int = 6,
                 use_output_layer: bool = True, **kwargs):
        self.cfg = SANDecoderConfig(vocab_size, encoder_output_size,
                                    attention_heads, linear_units, num_blocks,
                                    att_layer_num, use_output_layer)

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, 3)
        p = {"decoders": stack_params([
                 _layer_init(jax.random.fold_in(keys[0], i), cfg)
                 for i in range(cfg.num_blocks)]),
             "after_norm": layer_norm_init(cfg.dim)}
        if cfg.use_output_layer:
            p["output_layer"] = linear_init(keys[1], cfg.dim, cfg.vocab_size)
        # token embedding table for the glancing sampler (reference
        # decoder.py:311-319 builds self.embed for the SAN variant too)
        p["embed"] = embedding_init(keys[2], cfg.vocab_size, cfg.dim)
        return p

    def embed(self, params, ids, dtype=jnp.float32):
        return embedding_apply(params["embed"], ids, dtype=dtype)

    def __call__(self, params, hs_pad, hlens, sematic_embeds, ys_lens):
        cfg = self.cfg
        tgt_mask = make_pad_mask(ys_lens, sematic_embeds.shape[1])
        memory_mask = make_pad_mask(hlens, hs_pad.shape[1])
        x = sematic_embeds

        def body(carry, lp):
            h = layer_norm_apply(lp["norm1"], carry)
            x = carry + mha_apply(lp["self_attn"], cfg.mha, h, h, h,
                                  tgt_mask[:, None, :])
            h = layer_norm_apply(lp["norm2"], x)
            x = x + mha_apply(lp["src_attn"], cfg.mha, h, hs_pad, hs_pad,
                              memory_mask[:, None, :])
            h = layer_norm_apply(lp["norm3"], x)
            return x + ffn_apply(lp["feed_forward"], h), None

        x, _ = jax.lax.scan(body, x, params["decoders"])
        x = layer_norm_apply(params["after_norm"], x)
        x = x * tgt_mask[..., None].astype(x.dtype)
        if cfg.use_output_layer:
            x = linear_apply(params["output_layer"], x)
        return x, ys_lens
