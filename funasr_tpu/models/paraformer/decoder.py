"""Paraformer SAN-M decoder: NAR, bidirectional-context, FSMN self + cross attention.

TPU-native rebuild of the reference decoder (FunASR ``funasr/models/paraformer/
decoder.py``: ``DecoderLayerSANM:26-150`` — order is FFN first, then FSMN 'self attn'
on the FFN output with the *layer input* as residual, then cross-attn;
``ParaformerSANMDecoder:233-645`` — N scanned layers + a final FFN-only layer
(``decoders3``) with NO residual + after-norm + output projection).

Homogeneous layers run under ``jax.lax.scan`` over stacked params.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("self", "chunk_size", "look_back"))
def _decoder_chunk_jit(self, params, memory, tgt, n, fsmn_cache, opt_cache,
                       chunk_size, look_back):
    return self._forward_chunk_impl(params, memory, tgt, n, fsmn_cache,
                                    opt_cache, chunk_size, look_back)

from funasr_tpu.core.layers import (
    embedding_apply,
    embedding_init,
    ffn_dec_sanm_apply,
    ffn_dec_sanm_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    make_pad_mask,
)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.sanm.attention import (
    CrossAttentionConfig,
    FSMNDecoderConfig,
    cross_attention_apply,
    cross_attention_init,
    fsmn_decoder_apply,
    fsmn_decoder_init,
)
from funasr_tpu.register import tables


class ParaformerDecoderConfig(NamedTuple):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    att_layer_num: int = 6
    kernel_size: int = 11
    sanm_shift: int = 0
    use_output_layer: bool = True

    @property
    def dim(self) -> int:
        return self.encoder_output_size

    @property
    def fsmn_cfg(self) -> FSMNDecoderConfig:
        return FSMNDecoderConfig(self.dim, self.kernel_size, self.sanm_shift)

    @property
    def cross_cfg(self) -> CrossAttentionConfig:
        return CrossAttentionConfig(self.attention_heads, self.dim,
                                    self.encoder_output_size)


def _layer_init(rng, cfg: ParaformerDecoderConfig, has_self: bool, has_src: bool):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "norm1": layer_norm_init(cfg.dim),
        "feed_forward": ffn_dec_sanm_init(k1, cfg.dim, cfg.linear_units),
    }
    if has_self:
        p["norm2"] = layer_norm_init(cfg.dim)
        p["self_attn"] = fsmn_decoder_init(k2, cfg.fsmn_cfg)
    if has_src:
        p["norm3"] = layer_norm_init(cfg.dim)
        p["src_attn"] = cross_attention_init(k3, cfg.cross_cfg)
    return p


def _layer_apply(params, cfg: ParaformerDecoderConfig, tgt, tgt_mask, memory,
                 memory_mask, has_self: bool, has_src: bool):
    residual = tgt
    h = layer_norm_apply(params["norm1"], tgt)
    h = ffn_dec_sanm_apply(params["feed_forward"], h)
    x = h
    if has_self:
        h2 = layer_norm_apply(params["norm2"], h)
        h2 = fsmn_decoder_apply(params["self_attn"], cfg.fsmn_cfg, h2, tgt_mask)
        x = residual + h2
    if has_src:
        residual = x
        h3 = layer_norm_apply(params["norm3"], x)
        h3 = cross_attention_apply(params["src_attn"], cfg.cross_cfg, h3, memory,
                                   memory_mask)
        x = residual + h3
    return x


@tables.register("decoder_classes", "ParaformerSANMDecoder")
class ParaformerSANMDecoder:
    def __init__(self, vocab_size: int, encoder_output_size: int,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, att_layer_num: int = 6, kernel_size: int = 11,
                 sanm_shfit: int = 0, use_output_layer: bool = True, **kwargs):
        if sanm_shfit is None:
            sanm_shfit = (kernel_size - 1) // 2
        self.cfg = ParaformerDecoderConfig(
            vocab_size=vocab_size, encoder_output_size=encoder_output_size,
            attention_heads=attention_heads, linear_units=linear_units,
            num_blocks=num_blocks, att_layer_num=att_layer_num,
            kernel_size=kernel_size, sanm_shift=sanm_shfit,
            use_output_layer=use_output_layer,
        )

    def init(self, rng):
        cfg = self.cfg
        n_extra = cfg.num_blocks - cfg.att_layer_num
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        params = {
            "decoders": stack_params([
                _layer_init(keys[i], cfg, True, True) for i in range(cfg.att_layer_num)
            ]),
            "decoders3": _layer_init(keys[-2], cfg, False, False),
            "after_norm": layer_norm_init(cfg.dim),
        }
        if n_extra > 0:
            params["decoders2"] = stack_params([
                _layer_init(keys[cfg.att_layer_num + i], cfg, True, False)
                for i in range(n_extra)
            ])
        if cfg.use_output_layer:
            params["output_layer"] = linear_init(keys[-1], cfg.dim, cfg.vocab_size)
        # token embedding table, used by the glancing sampler during training
        params["embed"] = embedding_init(jax.random.fold_in(rng, 7), cfg.vocab_size,
                                         cfg.dim)
        return params

    def embed(self, params, ids, dtype=jnp.float32):
        return embedding_apply(params["embed"], ids, dtype=dtype)

    def forward_asf(self, params, hs_pad, hlens, ys_in_pad, ys_in_lens,
                    probe_layer: Optional[int] = None):
        """Run the first ``probe_layer`` layers and return the next layer's
        cross-attention matrix (B, H, Tq, Tk) — attention-score filtering probe
        (reference ``forward_asf6`` at ``decoder.py:485-513``)."""
        from funasr_tpu.core.module import unstack_params
        from funasr_tpu.models.sanm.attention import cross_attention_apply

        cfg = self.cfg
        n = cfg.att_layer_num
        probe = min(probe_layer if probe_layer is not None else 6, n) - 1
        tgt_mask = make_pad_mask(ys_in_lens, ys_in_pad.shape[1])
        memory_mask = make_pad_mask(hlens, hs_pad.shape[1])
        x = ys_in_pad
        layers = unstack_params(params["decoders"], n)
        for lp in layers[:probe]:
            x = _layer_apply(lp, cfg, x, tgt_mask, hs_pad, memory_mask, True, True)
        lp = layers[probe]
        h = layer_norm_apply(lp["norm1"], x)
        h = ffn_dec_sanm_apply(lp["feed_forward"], h)
        x2 = layer_norm_apply(lp["norm2"], h)
        from funasr_tpu.models.sanm.attention import fsmn_decoder_apply
        x2 = fsmn_decoder_apply(lp["self_attn"], cfg.fsmn_cfg, x2, tgt_mask)
        x = x + x2
        h3 = layer_norm_apply(lp["norm3"], x)
        _, attn = cross_attention_apply(lp["src_attn"], cfg.cross_cfg, h3, hs_pad,
                                        memory_mask, ret_attn=True)
        return attn

    def forward_chunk(self, params, memory, tgt, cache, n=None):
        """Streaming chunk decode (reference ``decoder.py:515-583``): per-layer FSMN
        rolling caches + cross-attn kv caches with look-back over chunk memories.

        ``cache``: {"decode_fsmn": stacked|None, "opt": stacked kv|None,
        "chunk_size", "decoder_chunk_look_back"}. ``tgt`` may be PADDED along
        the token dim with ``n`` (traced scalar) valid rows — rows >= n yield
        garbage logits the caller discards, and the FSMN caches roll in only
        the n valid rows (dynamic slice), so results equal the unpadded
        decode. Padding keeps the jitted program's shape fixed per chunk size
        instead of recompiling per fired-token count. Runs as one XLA call."""
        cfg = self.cfg
        b, tmax, d = tgt.shape
        k = cfg.kernel_size
        if cache.get("decode_fsmn") is None:
            cache["decode_fsmn"] = jnp.zeros(
                (cfg.num_blocks, b, k - 1, d), tgt.dtype)
        look_back = cache.get("decoder_chunk_look_back", 0)
        if cache.get("opt") is None and look_back != 0:
            dk = cfg.cross_cfg.d_k
            cache["opt"] = {
                "k": jnp.zeros((cfg.att_layer_num, b, cfg.cross_cfg.n_head,
                                0, dk), tgt.dtype),
                "v": jnp.zeros((cfg.att_layer_num, b, cfg.cross_cfg.n_head,
                                0, dk), tgt.dtype)}
        chunk_size = cache.get("chunk_size")
        if n is None:
            n = tmax
        logits, new_fsmn, new_opt = _decoder_chunk_jit(
            self, params, memory, tgt, jnp.asarray(n, jnp.int32),
            cache["decode_fsmn"], cache.get("opt"),
            tuple(chunk_size) if chunk_size is not None else None, look_back)
        cache["decode_fsmn"] = new_fsmn
        if look_back > 0 or look_back == -1:
            cache["opt"] = new_opt
        return logits

    def _forward_chunk_impl(self, params, memory, tgt, n, fsmn_cache,
                            opt_cache, chunk_size, look_back):
        from funasr_tpu.models.sanm.attention import (
            cross_attention_apply_chunk, fsmn_decoder_apply_masked)

        cfg = self.cfg
        n_att = cfg.att_layer_num

        def body_att(x, inp):
            lp, fc, oc = inp
            residual = x
            h = layer_norm_apply(lp["norm1"], x)
            h = ffn_dec_sanm_apply(lp["feed_forward"], h)
            x2 = layer_norm_apply(lp["norm2"], h)
            x2, new_fc = fsmn_decoder_apply_masked(
                lp["self_attn"], cfg.fsmn_cfg, x2, fc, n)
            x = residual + x2
            residual = x
            h3 = layer_norm_apply(lp["norm3"], x)
            h3, new_oc = cross_attention_apply_chunk(
                lp["src_attn"], cfg.cross_cfg, h3, memory, oc,
                chunk_size, look_back)
            return residual + h3, (new_fc, new_oc)

        fsmn1 = fsmn_cache[:n_att]
        fsmn2 = fsmn_cache[n_att:]
        if opt_cache is None:
            dk = cfg.cross_cfg.d_k
            opt_cache = {"k": jnp.zeros((n_att, tgt.shape[0],
                                         cfg.cross_cfg.n_head, 0, dk),
                                        tgt.dtype),
                         "v": jnp.zeros((n_att, tgt.shape[0],
                                         cfg.cross_cfg.n_head, 0, dk),
                                        tgt.dtype)}
        x, (new_fsmn1, new_opt) = jax.lax.scan(
            body_att, tgt, (params["decoders"], fsmn1, opt_cache))

        new_fsmn2 = fsmn2
        if "decoders2" in params:
            def body2(x, inp):
                lp, fc = inp
                residual = x
                h = layer_norm_apply(lp["norm1"], x)
                h = ffn_dec_sanm_apply(lp["feed_forward"], h)
                x2 = layer_norm_apply(lp["norm2"], h)
                x2, new_fc = fsmn_decoder_apply_masked(
                    lp["self_attn"], cfg.fsmn_cfg, x2, fc, n)
                return residual + x2, new_fc
            x, new_fsmn2 = jax.lax.scan(body2, x, (params["decoders2"], fsmn2))

        lp3 = params["decoders3"]
        x = ffn_dec_sanm_apply(lp3["feed_forward"],
                               layer_norm_apply(lp3["norm1"], x))
        x = layer_norm_apply(params["after_norm"], x)
        if cfg.use_output_layer:
            x = linear_apply(params["output_layer"], x)
        new_fsmn = jnp.concatenate([new_fsmn1, new_fsmn2], axis=0)
        return x, new_fsmn, new_opt

    def __call__(self, params, hs_pad, hlens, ys_in_pad, ys_in_lens,
                 return_hidden: bool = False):
        """hs_pad: (B,Tm,enc) memory; ys_in_pad: (B,Tq,dim) CIF acoustic embeds.

        Returns (logits (B,Tq,vocab), ys_in_lens).
        """
        cfg = self.cfg
        tgt_mask = make_pad_mask(ys_in_lens, ys_in_pad.shape[1])
        memory_mask = make_pad_mask(hlens, hs_pad.shape[1])

        x = ys_in_pad

        def body(carry, layer_params):
            h = _layer_apply(layer_params, cfg, carry, tgt_mask, hs_pad, memory_mask,
                             True, True)
            return h, None

        x, _ = jax.lax.scan(body, x, params["decoders"])

        if "decoders2" in params:
            def body2(carry, layer_params):
                h = _layer_apply(layer_params, cfg, carry, tgt_mask, None, None,
                                 True, False)
                return h, None
            x, _ = jax.lax.scan(body2, x, params["decoders2"])

        x = _layer_apply(params["decoders3"], cfg, x, tgt_mask, None, None, False, False)
        hidden = layer_norm_apply(params["after_norm"], x)
        if cfg.use_output_layer and not return_hidden:
            return linear_apply(params["output_layer"], hidden), ys_in_lens
        return hidden, ys_in_lens
