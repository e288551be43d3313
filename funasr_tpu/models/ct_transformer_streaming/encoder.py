"""SANM encoder with VAD-aware attention masks for streaming punctuation.

TPU-native rebuild of FunASR ``funasr/models/ct_transformer_streaming/encoder.py``
(``SANMVadEncoder:175-430``): every layer self-attends causally (no-future mask)
except the LAST, whose mask is the "VAD corner" pattern
(``transformer/utils/mask.py:38-52`` ``vad_mask``): full attention, except that
pre-text queries (rows < vad_pos-1) cannot see new-text keys (cols >= vad_pos).
The FSMN memory branch always uses the plain pad mask (reference
``attention.py:20-33`` mask tuple).

All masks here are computed vectorized from ``vad_indexes`` — no per-row Python
loop as in the reference — so the whole forward stays one jitted graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    add_sinusoidal_pe,
    ffn_apply,
    layer_norm_apply,
    make_pad_mask,
)
from funasr_tpu.core.module import maybe_dropout, stack_params, unstack_params
from funasr_tpu.models.sanm.attention import sanm_attention_apply
from funasr_tpu.models.sanm.encoder import SANMEncoder, SANMEncoderConfig
from funasr_tpu.register import tables


def vad_corner_mask(t: int, vad_pos):
    """(B,) vad positions -> (B, T, T) bool mask: True = may attend.

    Blocks rows <= vad_pos-2 from cols >= vad_pos; degenerate vad_pos (<=0 or >=T)
    yields an all-True mask, matching reference ``vad_mask``.
    """
    rows = jnp.arange(t)[None, :, None]
    cols = jnp.arange(t)[None, None, :]
    vp = jnp.asarray(vad_pos)[:, None, None]
    blocked = (rows <= vp - 2) & (cols >= vp)
    return ~blocked


def _vad_layer_apply(params, cfg: SANMEncoderConfig, x, mask, attn_mask, first,
                     rng=None):
    attn_cfg = cfg.attn_cfg(first)
    residual = x
    h = layer_norm_apply(params["norm1"], x)
    h = sanm_attention_apply(params["self_attn"], attn_cfg, h, mask,
                             attn_mask=attn_mask)
    h = maybe_dropout(rng, h, cfg.dropout_rate if rng is not None else 0.0)
    x = h if attn_cfg.in_feat != attn_cfg.n_feat else residual + h
    residual = x
    h = layer_norm_apply(params["norm2"], x)
    h = ffn_apply(params["feed_forward"], h)
    return residual + h


@tables.register("encoder_classes", "SANMVadEncoder")
class SANMVadEncoder(SANMEncoder):
    """``__call__(params, x, ilens, vad_indexes)``; init/params shared with
    SANMEncoder (encoders0 + stacked encoders + after_norm)."""

    def __call__(self, params, xs_pad, ilens, vad_indexes=None, rng=None):
        cfg = self.cfg
        b, t = xs_pad.shape[:2]
        if vad_indexes is None:
            vad_indexes = jnp.zeros((b,), jnp.int32)
        mask = make_pad_mask(ilens, t)
        causal = (jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :])
        causal = jnp.broadcast_to(causal, (b, t, t))

        x = xs_pad * (cfg.output_size ** 0.5)
        if cfg.input_layer == "pe":
            x = add_sinusoidal_pe(x)

        x = _vad_layer_apply(params["encoders0"], cfg, x, mask, causal, first=True,
                             rng=rng)

        if cfg.num_blocks > 1:
            n_mid = cfg.num_blocks - 2  # homogeneous causal layers before the last
            layers = unstack_params(params["encoders"], cfg.num_blocks - 1)
            if n_mid > 0:
                mid = stack_params(layers[:n_mid])

                def body(carry, lp):
                    return _vad_layer_apply(lp, cfg, carry, mask, causal,
                                            first=False, rng=rng), None

                x, _ = jax.lax.scan(body, x, mid)
            vadm = vad_corner_mask(t, vad_indexes)
            x = _vad_layer_apply(layers[-1], cfg, x, mask, vadm, first=False,
                                 rng=rng)

        if cfg.normalize_before:
            x = layer_norm_apply(params["after_norm"], x)
        return x * mask[..., None].astype(x.dtype), ilens
