"""Transformer encoder (pre-norm MHSA + FFN, espnet lineage).

Counterpart of FunASR ``funasr/models/transformer/encoder.py:140+`` with conv2d x4
subsampling input; scan-stacked homogeneous layers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    ffn_apply, ffn_init, layer_norm_apply, layer_norm_init, linear_apply,
    linear_init, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.models.transformer.subsampling import (
    conv2d_subsampling_apply, conv2d_subsampling_init)
from funasr_tpu.register import tables


class TransformerEncoderConfig(NamedTuple):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    input_layer: str = "conv2d"
    normalize_before: bool = True

    @property
    def mha(self):
        return MHAConfig(self.attention_heads, self.output_size)


def _layer_init(rng, cfg: TransformerEncoderConfig):
    k1, k2 = jax.random.split(rng)
    return {"norm1": layer_norm_init(cfg.output_size),
            "norm2": layer_norm_init(cfg.output_size),
            "self_attn": mha_init(k1, cfg.mha),
            "feed_forward": ffn_init(k2, cfg.output_size, cfg.linear_units)}


def _layer_apply(params, cfg, x, mask):
    residual = x
    h = layer_norm_apply(params["norm1"], x)
    x = residual + mha_apply(params["self_attn"], cfg.mha, h, h, h, mask[:, None, :])
    residual = x
    h = layer_norm_apply(params["norm2"], x)
    return residual + ffn_apply(params["feed_forward"], h)


@tables.register("encoder_classes", "TransformerEncoder")
class TransformerEncoder:
    def __init__(self, input_size: int, output_size: int = 256,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, input_layer: str = "conv2d",
                 normalize_before: bool = True, **kwargs):
        self.cfg = TransformerEncoderConfig(input_size, output_size, attention_heads,
                                            linear_units, num_blocks, input_layer,
                                            normalize_before)

    def output_size(self):
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        params = {"after_norm": layer_norm_init(cfg.output_size),
                  "encoders": stack_params([
                      _layer_init(keys[i], cfg) for i in range(cfg.num_blocks)])}
        if cfg.input_layer == "conv2d":
            params["embed"] = conv2d_subsampling_init(keys[-1], cfg.input_size,
                                                      cfg.output_size)
        elif cfg.input_layer == "linear":
            params["embed"] = linear_init(keys[-1], cfg.input_size, cfg.output_size)
        return params

    def __call__(self, params, xs_pad, ilens, rng=None):
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            x, olens = conv2d_subsampling_apply(params["embed"], xs_pad, ilens)
        elif cfg.input_layer == "linear":
            from funasr_tpu.models.transformer.attention import add_espnet_pe
            x, olens = add_espnet_pe(linear_apply(params["embed"], xs_pad)), ilens
        else:
            x, olens = xs_pad, ilens
        mask = make_pad_mask(olens, x.shape[1])

        def body(carry, lp):
            return _layer_apply(lp, cfg, carry, mask), None

        x, _ = jax.lax.scan(body, x, params["encoders"])
        if cfg.normalize_before:
            x = layer_norm_apply(params["after_norm"], x)
        return x, olens
