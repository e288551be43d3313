"""FsmnDecoderSCAMAOpt: autoregressive SAN-M decoder with SCAMA chunk masks.

TPU-native rebuild of reference ``funasr/models/scama/decoder.py:203``: token
embedding input, FSMN-memory self-attention (causal via the kernel's left
context), cross-attention to the chunked encoder restricted by the per-token
SCAMA mask, and the same decoders/decoders2/decoders3 split as the Paraformer
SAN-M decoder (shared layer param trees — the converter is common).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    embedding_apply, embedding_init, layer_norm_apply, layer_norm_init,
    linear_apply, linear_init, make_pad_mask, masked_softmax)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.paraformer.decoder import (
    ParaformerDecoderConfig, _layer_init)
from funasr_tpu.models.sanm.attention import (
    _merge_heads, _split_heads, fsmn_decoder_apply)
from funasr_tpu.core.layers import ffn_dec_sanm_apply
from funasr_tpu.register import tables

from typing import NamedTuple, Optional

from funasr_tpu.models.sanm.attention import (CrossAttentionConfig,
                                              FSMNDecoderConfig)


class SCAMADecoderConfig(NamedTuple):
    """Like ParaformerDecoderConfig but with a decoder width (attention_dim)
    decoupled from the encoder output size (ref scama/decoder.py:272-273:
    UniASR uses attention_dim=256 over a 320-dim encoder)."""
    vocab_size: int
    encoder_output_size: int
    attention_dim: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    att_layer_num: int = 6
    kernel_size: int = 21
    sanm_shift: int = 0
    use_output_layer: bool = True

    @property
    def dim(self) -> int:
        return self.attention_dim

    @property
    def fsmn_cfg(self) -> FSMNDecoderConfig:
        return FSMNDecoderConfig(self.dim, self.kernel_size, self.sanm_shift)

    @property
    def cross_cfg(self) -> CrossAttentionConfig:
        return CrossAttentionConfig(self.attention_heads, self.dim,
                                    self.encoder_output_size)


def _cross_attention_3dmask(params, cfg, x, memory, mask3):
    """Cross attention with a per-query key mask (B, Tq, Tk) — the SCAMA
    chunk mask (ref scama/decoder.py:410-413 memory_mask * chunk_mask)."""
    q = linear_apply(params["linear_q"], x)
    kv = linear_apply(params["linear_k_v"], memory.astype(x.dtype))
    k, v = jnp.split(kv, 2, axis=-1)
    q_h = _split_heads(q, cfg.n_head, cfg.d_k) * (cfg.d_k ** -0.5)
    k_h = _split_heads(k, cfg.n_head, cfg.d_k)
    v_h = _split_heads(v, cfg.n_head, cfg.d_k)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q_h, k_h,
                        preferred_element_type=jnp.float32)
    attn = masked_softmax(scores.astype(x.dtype), mask3[:, None, :, :])
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v_h,
                     preferred_element_type=jnp.float32)
    return linear_apply(params["linear_out"], _merge_heads(ctx).astype(x.dtype))


@tables.register("decoder_classes", "FsmnDecoderSCAMAOpt")
class FsmnDecoderSCAMAOpt:
    def __init__(self, vocab_size: int, encoder_output_size: int,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, att_layer_num: int = 6,
                 kernel_size: int = 21, sanm_shfit=None,
                 use_output_layer: bool = True, input_layer: str = "embed",
                 concat_embeds: bool = False, attention_dim=None, **kwargs):
        if sanm_shfit is None:
            sanm_shfit = (kernel_size - 1) // 2
        dim = attention_dim or encoder_output_size
        assert input_layer == "embed", "SCAMA decoder uses token embeddings"
        self.cfg = SCAMADecoderConfig(
            vocab_size=vocab_size, encoder_output_size=encoder_output_size,
            attention_dim=dim, attention_heads=attention_heads,
            linear_units=linear_units, num_blocks=num_blocks,
            att_layer_num=att_layer_num, kernel_size=kernel_size,
            sanm_shift=sanm_shfit, use_output_layer=use_output_layer)
        self.concat_embeds = concat_embeds

    def init(self, rng):
        cfg = self.cfg
        n_extra = cfg.num_blocks - cfg.att_layer_num
        keys = jax.random.split(rng, cfg.num_blocks + 4)
        params = {
            "embed": embedding_init(keys[0], cfg.vocab_size, cfg.dim),
            "decoders": stack_params([
                _layer_init(keys[1 + i], cfg, True, True)
                for i in range(cfg.att_layer_num)]),
            "decoders3": _layer_init(keys[-3], cfg, False, False),
            "after_norm": layer_norm_init(cfg.dim),
        }
        if n_extra > 0:
            params["decoders2"] = stack_params([
                _layer_init(keys[1 + cfg.att_layer_num + i], cfg, True, False)
                for i in range(n_extra)])
        if cfg.use_output_layer:
            params["output_layer"] = linear_init(keys[-2], cfg.dim,
                                                 cfg.vocab_size)
        if self.concat_embeds:
            from funasr_tpu.core.layers import ffn_dec_sanm_init
            params["embed_concat_ffn"] = {
                "norm1": layer_norm_init(cfg.dim + cfg.encoder_output_size),
                "feed_forward": ffn_dec_sanm_init(
                    keys[-1], cfg.dim + cfg.encoder_output_size,
                    cfg.linear_units, adim=cfg.dim)}
        return params

    def __call__(self, params, hs_pad, hlens, ys_in_pad, ys_in_lens,
                 chunk_mask=None, pre_acoustic_embeds=None):
        """ys_in_pad: (B, U) token ids. chunk_mask: (B, U, Tm) float SCAMA
        attention windows (None -> full padding-masked attention)."""
        cfg = self.cfg
        u = ys_in_pad.shape[1]
        tgt_mask = make_pad_mask(ys_in_lens, u)
        mem_valid = make_pad_mask(hlens, hs_pad.shape[1])
        mask3 = jnp.broadcast_to(mem_valid[:, None, :].astype(jnp.float32),
                                 (hs_pad.shape[0], u, hs_pad.shape[1]))
        if chunk_mask is not None:
            mask3 = mask3 * chunk_mask[:, :u, :]
        mask3 = mask3 > 0.5

        x = embedding_apply(params["embed"], ys_in_pad, dtype=hs_pad.dtype)
        if pre_acoustic_embeds is not None and self.concat_embeds:
            x = jnp.concatenate([x, pre_acoustic_embeds[:, :u]], axis=-1)
            h = layer_norm_apply(params["embed_concat_ffn"]["norm1"], x)
            x = ffn_dec_sanm_apply(params["embed_concat_ffn"]["feed_forward"],
                                   h)

        def att_layer(carry, lp):
            residual = carry
            h = layer_norm_apply(lp["norm1"], carry)
            h = ffn_dec_sanm_apply(lp["feed_forward"], h)
            h2 = layer_norm_apply(lp["norm2"], h)
            h2 = fsmn_decoder_apply(lp["self_attn"], cfg.fsmn_cfg, h2, tgt_mask)
            z = residual + h2
            h3 = layer_norm_apply(lp["norm3"], z)
            z = z + _cross_attention_3dmask(lp["src_attn"], cfg.cross_cfg, h3,
                                            hs_pad, mask3)
            return z, None

        x, _ = jax.lax.scan(att_layer, x, params["decoders"])

        if "decoders2" in params:
            def self_layer(carry, lp):
                residual = carry
                h = layer_norm_apply(lp["norm1"], carry)
                h = ffn_dec_sanm_apply(lp["feed_forward"], h)
                h2 = layer_norm_apply(lp["norm2"], h)
                h2 = fsmn_decoder_apply(lp["self_attn"], cfg.fsmn_cfg, h2,
                                        tgt_mask)
                return residual + h2, None
            x, _ = jax.lax.scan(self_layer, x, params["decoders2"])

        lp3 = params["decoders3"]
        h = layer_norm_apply(lp3["norm1"], x)
        x = ffn_dec_sanm_apply(lp3["feed_forward"], h)
        x = layer_norm_apply(params["after_norm"], x)
        if cfg.use_output_layer:
            x = linear_apply(params["output_layer"], x)
        return x, jnp.sum(tgt_mask, axis=1)
