"""Conformer encoder (macaron FFN + rel-pos MHSA + conv module, espnet lineage).

TPU-native rebuild of FunASR ``funasr/models/conformer/encoder.py:286+``
(ConvolutionModule ``:53``: pointwise -> GLU -> depthwise(k=15) -> BN -> swish ->
pointwise; EncoderLayer with macaron 0.5-scaled FFNs and final norm).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    conv1d_init, depthwise_conv1d_init, ffn_init, layer_norm_apply, layer_norm_init,
    linear_apply, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.campplus.components import batchnorm_apply, batchnorm_init
from funasr_tpu.core.layers import conv1d_apply, depthwise_conv1d_apply
from funasr_tpu.models.transformer.attention import (
    MHAConfig, rel_pos_emb, relpos_mha_apply, relpos_mha_init)
from funasr_tpu.models.transformer.subsampling import (
    conv2d_subsampling_apply, conv2d_subsampling_init)
from funasr_tpu.register import tables


def swish(x):
    return x * jax.nn.sigmoid(x)


class ConformerConfig(NamedTuple):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    cnn_module_kernel: int = 15
    macaron_style: bool = True
    input_layer: str = "conv2d"

    @property
    def mha(self):
        return MHAConfig(self.attention_heads, self.output_size)


def conv_module_init(rng, channels: int, kernel: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "pointwise_conv1": conv1d_init(k1, channels, 2 * channels, 1),
        "depthwise_conv": depthwise_conv1d_init(k2, channels, kernel, bias=True),
        "norm": batchnorm_init(channels),
        "pointwise_conv2": conv1d_init(k3, channels, channels, 1),
    }


def conv_module_apply(params, x, kernel: int):
    h = conv1d_apply(params["pointwise_conv1"], x)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    pad = (kernel - 1) // 2
    h = depthwise_conv1d_apply(params["depthwise_conv"], h, left_pad=pad,
                               right_pad=pad)
    h = swish(batchnorm_apply(params["norm"], h))
    return conv1d_apply(params["pointwise_conv2"], h)


def _ffn_swish(params, x):
    h = swish(linear_apply(params["w_1"], x))
    return linear_apply(params["w_2"], h)


def _layer_init(rng, cfg: ConformerConfig):
    keys = jax.random.split(rng, 4)
    d = cfg.output_size
    p = {
        "norm_ff": layer_norm_init(d),
        "norm_mha": layer_norm_init(d),
        "norm_conv": layer_norm_init(d),
        "norm_final": layer_norm_init(d),
        "self_attn": relpos_mha_init(keys[0], cfg.mha),
        "feed_forward": ffn_init(keys[1], d, cfg.linear_units),
        "conv_module": conv_module_init(keys[2], d, cfg.cnn_module_kernel),
    }
    if cfg.macaron_style:
        p["norm_ff_macaron"] = layer_norm_init(d)
        p["feed_forward_macaron"] = ffn_init(keys[3], d, cfg.linear_units)
    return p


def _layer_apply(params, cfg: ConformerConfig, x, pos_emb, mask):
    if cfg.macaron_style:
        h = layer_norm_apply(params["norm_ff_macaron"], x)
        x = x + 0.5 * _ffn_swish(params["feed_forward_macaron"], h)
    h = layer_norm_apply(params["norm_mha"], x)
    x = x + relpos_mha_apply(params["self_attn"], cfg.mha, h, pos_emb,
                             mask[:, None, :])
    h = layer_norm_apply(params["norm_conv"], x)
    x = x + conv_module_apply(params["conv_module"], h, cfg.cnn_module_kernel)
    h = layer_norm_apply(params["norm_ff"], x)
    x = x + 0.5 * _ffn_swish(params["feed_forward"], h)
    return layer_norm_apply(params["norm_final"], x)


@tables.register("encoder_classes", "ConformerEncoder")
class ConformerEncoder:
    def __init__(self, input_size: int, output_size: int = 256,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, cnn_module_kernel: int = 15,
                 macaron_style: bool = True, input_layer: str = "conv2d", **kwargs):
        self.cfg = ConformerConfig(input_size, output_size, attention_heads,
                                   linear_units, num_blocks, cnn_module_kernel,
                                   macaron_style, input_layer)

    def output_size(self):
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        params = {
            "encoders": stack_params([
                _layer_init(keys[i], cfg) for i in range(cfg.num_blocks)]),
            "after_norm": layer_norm_init(cfg.output_size),
        }
        if cfg.input_layer == "conv2d":
            params["embed"] = conv2d_subsampling_init(keys[-1], cfg.input_size,
                                                      cfg.output_size)
        return params

    def __call__(self, params, xs_pad, ilens, rng=None):
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            x, olens = conv2d_subsampling_apply(params["embed"], xs_pad, ilens,
                                                add_pe=False)
            x = x * (cfg.output_size ** 0.5)
        else:
            x, olens = xs_pad, ilens
        mask = make_pad_mask(olens, x.shape[1])
        pos = rel_pos_emb(x.shape[1], cfg.output_size, x.dtype)

        def body(carry, lp):
            return _layer_apply(lp, cfg, carry, pos, mask), None

        x, _ = jax.lax.scan(body, x, params["encoders"])
        x = layer_norm_apply(params["after_norm"], x)
        return x, olens
