"""Branchformer / E-Branchformer encoders.

TPU-native rebuilds of FunASR ``funasr/models/branchformer/`` and
``funasr/models/e_branchformer/``: per layer, a self-attention branch runs in
parallel with a cgMLP branch (channel proj -> GLU gated by a depthwise conv over
time); branches merge by concat+linear (Branchformer) or concat + depthwise conv +
linear with macaron FFNs (E-Branchformer).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    depthwise_conv1d_apply, depthwise_conv1d_init, ffn_apply, ffn_init,
    layer_norm_apply, layer_norm_init, linear_apply, linear_init, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.transformer.attention import (
    MHAConfig, mha_apply, mha_init, rel_pos_emb, relpos_mha_apply,
    relpos_mha_init)
from funasr_tpu.models.transformer.subsampling import (
    conv2d_subsampling_apply, conv2d_subsampling_init)
from funasr_tpu.register import tables


class BranchformerConfig(NamedTuple):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    num_blocks: int = 12
    merge_method: str = "concat"  # branchformer
    use_macaron: bool = False     # e-branchformer
    ffn_units: int = 1024
    # reference branchformer/encoder.py:300 defaults to rel-pos self-attention
    attention_layer_type: str = "rel_selfattn"

    @property
    def mha(self):
        return MHAConfig(self.attention_heads, self.output_size)


def cgmlp_init(rng, cfg: BranchformerConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    d, h = cfg.output_size, cfg.cgmlp_linear_units
    return {
        "channel_proj1": linear_init(k1, d, h),
        "norm_gate": layer_norm_init(h // 2),
        "conv_gate": depthwise_conv1d_init(k2, h // 2, cfg.cgmlp_conv_kernel,
                                           bias=True),
        "channel_proj2": linear_init(k3, h // 2, d),
    }


def cgmlp_apply(p, cfg: BranchformerConfig, x, mask):
    h = jax.nn.gelu(linear_apply(p["channel_proj1"], x), approximate=False)
    a, b = jnp.split(h, 2, axis=-1)
    g = layer_norm_apply(p["norm_gate"], b)
    if mask is not None:
        g = g * mask[..., None].astype(g.dtype)
    pad = (cfg.cgmlp_conv_kernel - 1) // 2
    g = depthwise_conv1d_apply(p["conv_gate"], g, left_pad=pad, right_pad=pad)
    return linear_apply(p["channel_proj2"], a * g)


def _layer_init(rng, cfg: BranchformerConfig):
    keys = jax.random.split(rng, 6)
    d = cfg.output_size
    p = {
        "norm_mha": layer_norm_init(d),
        "attn": (relpos_mha_init(keys[0], cfg.mha)
                 if cfg.attention_layer_type == "rel_selfattn"
                 else mha_init(keys[0], cfg.mha)),
        "norm_mlp": layer_norm_init(d),
        "cgmlp": cgmlp_init(keys[1], cfg),
        "merge_proj": linear_init(keys[2], d * 2, d),
        "norm_final": layer_norm_init(d),
    }
    if cfg.merge_method == "conv":  # e-branchformer merge
        p["merge_conv"] = depthwise_conv1d_init(keys[3], d * 2, 3, bias=True)
    if cfg.use_macaron:
        p["norm_ff1"] = layer_norm_init(d)
        p["ffn1"] = ffn_init(keys[4], d, cfg.ffn_units)
        p["norm_ff2"] = layer_norm_init(d)
        p["ffn2"] = ffn_init(keys[5], d, cfg.ffn_units)
    return p


def _layer_apply(p, cfg: BranchformerConfig, x, mask, pos=None):
    if cfg.use_macaron:
        x = x + 0.5 * ffn_apply(p["ffn1"], layer_norm_apply(p["norm_ff1"], x))
    h_att = layer_norm_apply(p["norm_mha"], x)
    if cfg.attention_layer_type == "rel_selfattn":
        h_att = relpos_mha_apply(p["attn"], cfg.mha, h_att, pos,
                                 mask[:, None, :])
    else:
        h_att = mha_apply(p["attn"], cfg.mha, h_att, h_att, h_att,
                          mask[:, None, :])
    h_mlp = layer_norm_apply(p["norm_mlp"], x)
    h_mlp = cgmlp_apply(p["cgmlp"], cfg, h_mlp, mask)
    merged = jnp.concatenate([h_att, h_mlp], axis=-1)
    if cfg.merge_method == "conv":
        merged = merged + depthwise_conv1d_apply(p["merge_conv"], merged,
                                                 left_pad=1, right_pad=1)
    x = x + linear_apply(p["merge_proj"], merged)
    if cfg.use_macaron:
        x = x + 0.5 * ffn_apply(p["ffn2"], layer_norm_apply(p["norm_ff2"], x))
    return layer_norm_apply(p["norm_final"], x)


@tables.register("encoder_classes", "BranchformerEncoder")
class BranchformerEncoder:
    MERGE = "concat"
    MACARON = False

    def __init__(self, input_size: int, output_size: int = 256,
                 attention_heads: int = 4, cgmlp_linear_units: int = 2048,
                 cgmlp_conv_kernel: int = 31, num_blocks: int = 12,
                 ffn_units: int = 1024,
                 attention_layer_type: str = "rel_selfattn",
                 use_ffn: Optional[bool] = None, **kwargs):
        # e_branchformer reference defaults use_ffn=False (encoder.py:215)
        macaron = self.MACARON if use_ffn is None else use_ffn
        self.cfg = BranchformerConfig(
            input_size, output_size, attention_heads, cgmlp_linear_units,
            cgmlp_conv_kernel, num_blocks, self.MERGE, macaron, ffn_units,
            attention_layer_type)

    def output_size(self):
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        return {
            "embed": conv2d_subsampling_init(keys[-1], cfg.input_size,
                                             cfg.output_size),
            "encoders": stack_params([_layer_init(keys[i], cfg)
                                      for i in range(cfg.num_blocks)]),
            "after_norm": layer_norm_init(cfg.output_size),
        }

    def __call__(self, params, xs_pad, ilens, rng=None):
        cfg = self.cfg
        relpos = cfg.attention_layer_type == "rel_selfattn"
        x, olens = conv2d_subsampling_apply(params["embed"], xs_pad, ilens,
                                            add_pe=not relpos)
        if relpos:
            x = x * (cfg.output_size ** 0.5)
        mask = make_pad_mask(olens, x.shape[1])
        pos = (rel_pos_emb(x.shape[1], cfg.output_size, x.dtype)
               if relpos else None)

        def body(carry, lp):
            return _layer_apply(lp, cfg, carry, mask, pos), None

        x, _ = jax.lax.scan(body, x, params["encoders"])
        return layer_norm_apply(params["after_norm"], x), olens


@tables.register("encoder_classes", "EBranchformerEncoder")
class EBranchformerEncoder(BranchformerEncoder):
    MERGE = "conv"
    MACARON = True


@tables.register("model_classes", "Branchformer")
class Branchformer:
    """AED model with a Branchformer encoder (reference ``branchformer/model.py``)."""

    def __new__(cls, encoder: str = "BranchformerEncoder", **kwargs):
        from funasr_tpu.models.transformer.model import Transformer
        return Transformer(encoder=encoder, **kwargs)


@tables.register("model_classes", "EBranchformer")
class EBranchformer:
    def __new__(cls, encoder: str = "EBranchformerEncoder", **kwargs):
        from funasr_tpu.models.transformer.model import Transformer
        return Transformer(encoder=encoder, **kwargs)
