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


def _empty_kv(b, n_head, d_k, dtype):
    """Zero-length kv cache: keeps the cache pytree structure constant from
    the first chunk (concat/trim on a (B,H,0,Dk) array is shape-correct)."""
    return {"k": jnp.zeros((b, n_head, 0, d_k), dtype),
            "v": jnp.zeros((b, n_head, 0, d_k), dtype)}


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("cfg", "chunk_size", "look_back", "tail"))
def _encoder_chunk_jit(params, x, start, carry, opt0, opt, cfg, chunk_size,
                       look_back, tail):
    """One whole streaming encoder chunk as a single XLA program: PE from the
    absolute start index, overlap-carry splice, first layer, lax.scan over the
    stacked remaining layers with stacked kv caches, after_norm."""
    if tail:
        # the final sub-stride chunk re-runs the carried (already PE'd) rows
        x = carry
        new_carry = carry
    else:
        x = x * (cfg.output_size ** 0.5)
        t = x.shape[1]
        pos = (start + 1 + jnp.arange(t)).astype(jnp.float32)
        x = x + sinusoidal_pe(pos, x.shape[2], x.dtype)[None]
        overlap = jnp.concatenate([carry, x], axis=1)
        keep = chunk_size[0] + chunk_size[2]
        new_carry = overlap[:, overlap.shape[1] - keep:] if keep > 0 \
            else overlap[:, :0]
        x = overlap

    x, opt0 = _layer_apply_chunk(params["encoders0"], cfg, x, opt0,
                                 chunk_size, look_back, first=True)
    if cfg.num_blocks > 1:
        def body(h, inp):
            lp, kv = inp
            h, new_kv = _layer_apply_chunk(lp, cfg, h, kv, chunk_size,
                                           look_back, first=False)
            return h, new_kv
        x, opt = jax.lax.scan(body, x, (params["encoders"], opt))
    if cfg.normalize_before:
        x = layer_norm_apply(params["after_norm"], x)
    return x, new_carry, opt0, opt


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
        [pad_left, stride, lookahead], encoder_chunk_look_back, opt0/opt (kv
        caches: first layer + stacked rest), tail_chunk.

        The whole 50-layer chunk step runs as ONE jitted program
        (``_encoder_chunk_jit``): eager per-layer dispatch costs hundreds of
        tunnel round-trips per 600 ms chunk. Cache shapes grow until the
        look-back window fills (a handful of compiles), then every chunk hits
        the same compiled program.
        """
        cfg = self.cfg
        x = jnp.asarray(xs_pad)
        b, t = x.shape[0], x.shape[1]
        look_back = cache.get("encoder_chunk_look_back", 0)
        chunk_size = tuple(cache["chunk_size"])
        if "opt0" not in cache:
            empty = _empty_kv(b, cfg.attention_heads,
                              cfg.output_size // cfg.attention_heads, x.dtype)
            cache["opt0"] = empty
            cache["opt"] = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(
                    a[None], (cfg.num_blocks - 1,) + a.shape), empty) \
                if cfg.num_blocks > 1 else None
        start = cache["start_idx"]
        cache["start_idx"] = start + t

        y, new_carry, opt0, opt = _encoder_chunk_jit(
            params, x, jnp.asarray(start, jnp.int32), cache["feats"],
            cache["opt0"], cache["opt"], cfg, chunk_size, look_back,
            bool(cache.get("tail_chunk")))
        cache["feats"] = new_carry
        if look_back > 0 or look_back == -1:
            cache["opt0"] = opt0
            cache["opt"] = opt
        return y, jnp.asarray([y.shape[1]])
