"""SANMEncoderChunkOpt: chunked streaming SAN-M encoder (SCAMA, arXiv 2006.01712).

TPU-native rebuild of the reference (FunASR ``funasr/models/scama/encoder.py``:
``forward_chunk:496-548`` — streaming PE with start_idx offset, overlap-chunk feature
carry (keeps the last ``pad_left + lookahead`` feature frames), per-layer kv caches
with look-back trimming). Offline ``forward`` matches the plain SANMEncoder (the
streaming checkpoints share weights). Streaming runs batch=1 with per-layer Python
loops — chunk shapes are fixed per stream so jit caches one program per stage.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    ffn_apply, layer_norm_apply, layer_norm_init, make_pad_mask, sinusoidal_pe)
from funasr_tpu.core.module import stack_params, unstack_params
from funasr_tpu.models.sanm.attention import sanm_attention_apply_chunk
from funasr_tpu.models.sanm.encoder import (
    SANMEncoder, SANMEncoderConfig, _layer_apply, _layer_init)
from funasr_tpu.register import tables


def _layer_apply_masked(params, cfg: SANMEncoderConfig, x, frame_mask, att_mask,
                        first: bool, rng=None):
    """Pre-norm EncoderLayerSANM with overlap-chunk masks: ``frame_mask`` (B,Tc)
    gates the FSMN branch + attention keys; ``att_mask`` (B,Tc,Tc) restricts
    attention to own-chunk + look-back (reference EncoderLayerSANM.forward with
    mask_shfit_chunk / mask_att_chunk_encoder)."""
    from funasr_tpu.models.sanm.attention import sanm_attention_apply

    attn_cfg = cfg.attn_cfg(first)
    residual = x
    h = layer_norm_apply(params["norm1"], x)
    h = sanm_attention_apply(params["self_attn"], attn_cfg, h, frame_mask,
                             attn_mask=att_mask)
    x = h if attn_cfg.in_feat != attn_cfg.n_feat else residual + h
    residual = x
    h = layer_norm_apply(params["norm2"], x)
    h = ffn_apply(params["feed_forward"], h)
    return residual + h


def _layer_apply_chunk(params, cfg: SANMEncoderConfig, x, cache, chunk_size,
                       look_back, first: bool):
    attn_cfg = cfg.attn_cfg(first)
    residual = x
    h = layer_norm_apply(params["norm1"], x)
    h, cache = sanm_attention_apply_chunk(params["self_attn"], attn_cfg, h, cache,
                                          chunk_size, look_back)
    x = h if attn_cfg.in_feat != attn_cfg.n_feat else residual + h
    residual = x
    h = layer_norm_apply(params["norm2"], x)
    h = ffn_apply(params["feed_forward"], h)
    return residual + h, cache


@tables.register("encoder_classes", "SANMEncoderChunkOpt")
class SANMEncoderChunkOpt(SANMEncoder):
    def __init__(self, *args, chunk_size=(16,), stride=(10,), pad_left=(0,),
                 encoder_att_look_back_factor=(1,), decoder_att_look_back_factor=(1,),
                 **kwargs):
        kwargs.setdefault("input_layer", "pe_online")
        kwargs["input_layer"] = "pe"  # offline forward uses plain pe; chunk uses cache
        super().__init__(*args, **kwargs)
        self.train_chunk_size = chunk_size
        self.train_stride = stride
        from funasr_tpu.models.scama.chunk_utils import OverlapChunk
        # fsmn shift rows per chunk = conv left context (reference
        # scama/encoder.py:377 shfit_fsmn = (kernel_size - 1) // 2)
        self.overlap_chunk_cls = OverlapChunk(
            chunk_size=tuple(chunk_size), stride=tuple(stride),
            pad_left=tuple(pad_left),
            encoder_att_look_back_factor=tuple(encoder_att_look_back_factor),
            shfit_fsmn=(self.cfg.kernel_size - 1) // 2,
            decoder_att_look_back_factor=tuple(decoder_att_look_back_factor))

    def forward_train_chunk(self, params, xs_pad, ilens, masks, rng=None):
        """Offline training forward with overlap-chunk streaming masks
        (reference ``scama/encoder.py:393-480``): embed -> split into
        overlapping chunks -> all layers with (fsmn-shift, chunk-attention)
        masks -> after_norm. Returns (chunked output, chunked lengths).

        ``masks``: dict from ``OverlapChunk.gen_chunk_mask`` (host numpy).
        """
        from funasr_tpu.core.layers import add_sinusoidal_pe
        from funasr_tpu.models.scama.chunk_utils import OverlapChunk

        cfg = self.cfg
        x = xs_pad * (cfg.output_size ** 0.5)
        x = add_sinusoidal_pe(x)
        x_chunk, lens_chunk = OverlapChunk.split_chunk(x, ilens, masks)

        tc = x_chunk.shape[1]
        pad_ok = make_pad_mask(lens_chunk, tc)
        shfit = jnp.asarray(masks["mask_shfit_chunk"], bool)[None, :]
        frame_mask = pad_ok & shfit  # (B, Tc): valid non-fsmn-pad rows
        att_mask = jnp.asarray(masks["mask_att_chunk_encoder"], bool)[None]
        att_mask = jnp.broadcast_to(att_mask, (x_chunk.shape[0], tc, tc))

        x_chunk = _layer_apply_masked(params["encoders0"], cfg, x_chunk,
                                      frame_mask, att_mask, first=True, rng=rng)
        if cfg.num_blocks > 1:
            def body(carry, lp):
                return _layer_apply_masked(lp, cfg, carry, frame_mask, att_mask,
                                           first=False, rng=rng), None
            x_chunk, _ = jax.lax.scan(body, x_chunk, params["encoders"])
        if cfg.normalize_before:
            x_chunk = layer_norm_apply(params["after_norm"], x_chunk)
        x_chunk = x_chunk * pad_ok[..., None].astype(x_chunk.dtype)
        return x_chunk, lens_chunk

    def forward_chunk(self, params, xs_pad, ilens, cache: Dict, is_final=False):
        """One streaming chunk. ``cache`` keys (mirrors reference init_cache):
        start_idx, feats (carried pad_left+lookahead feature frames), chunk_size
        [pad_left, stride, lookahead], encoder_chunk_look_back, opt (per-layer kv),
        tail_chunk."""
        cfg = self.cfg
        x = xs_pad * (cfg.output_size ** 0.5)
        # streaming PE: absolute positions from start_idx
        t = x.shape[1]
        start = cache["start_idx"]
        cache["start_idx"] = start + t
        pos = jnp.arange(start + 1, start + t + 1, dtype=jnp.float32)
        x = x + sinusoidal_pe(pos, x.shape[2], x.dtype)[None]

        if cache.get("tail_chunk"):
            x = cache["feats"]
        else:
            overlap = jnp.concatenate([cache["feats"], x], axis=1)
            keep = cache["chunk_size"][0] + cache["chunk_size"][2]
            cache["feats"] = overlap[:, -keep:] if keep > 0 else overlap[:, :0]
            x = overlap

        n_layers = cfg.num_blocks
        opt = cache.get("opt") or [None] * n_layers
        look_back = cache.get("encoder_chunk_look_back", 0)
        chunk_size = cache["chunk_size"]

        x, opt[0] = _layer_apply_chunk(params["encoders0"], cfg, x, opt[0],
                                       chunk_size, look_back, first=True)
        if cfg.num_blocks > 1:
            layers = unstack_params(params["encoders"], cfg.num_blocks - 1)
            for i, lp in enumerate(layers):
                x, opt[i + 1] = _layer_apply_chunk(lp, cfg, x, opt[i + 1],
                                                   chunk_size, look_back, first=False)
        if cfg.normalize_before:
            x = layer_norm_apply(params["after_norm"], x)
        if look_back > 0 or look_back == -1:
            cache["opt"] = opt
        return x, jnp.asarray([x.shape[1]])
