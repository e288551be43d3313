"""SAN-M encoder stack (San-m: memory equipped self-attention, arXiv 2006.01713).

TPU-native rebuild of the reference encoder (FunASR ``funasr/models/sanm/encoder.py``:
``EncoderLayerSANM:44-150`` pre-norm layer with dim-changing first block;
``SANMEncoder:187-535`` — ``x*sqrt(d)`` + sinusoidal PE (``input_layer: pe``), 1 in-dim
block + (N-1) homogeneous blocks + after-norm).

The homogeneous blocks run under ``jax.lax.scan`` over stacked params: one compiled
layer body regardless of depth, which keeps the 50-block Paraformer-large encoder's
compile time and code size flat.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    add_sinusoidal_pe,
    ffn_apply,
    ffn_init,
    layer_norm_apply,
    layer_norm_init,
    make_pad_mask,
)
from funasr_tpu.core.module import maybe_dropout, stack_params
from funasr_tpu.models.sanm.attention import (
    SANMAttentionConfig,
    sanm_attention_apply,
    sanm_attention_apply_chunk,
    sanm_attention_init,
)
from funasr_tpu.register import tables


class SANMEncoderConfig(NamedTuple):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    kernel_size: int = 11
    sanm_shift: int = 0
    input_layer: str = "pe"
    normalize_before: bool = True
    dropout_rate: float = 0.1

    def attn_cfg(self, first: bool) -> SANMAttentionConfig:
        return SANMAttentionConfig(
            n_head=self.attention_heads,
            in_feat=self.input_size if first else self.output_size,
            n_feat=self.output_size,
            kernel_size=self.kernel_size,
            sanm_shift=self.sanm_shift,
        )


def _layer_init(rng, cfg: SANMEncoderConfig, first: bool):
    k1, k2 = jax.random.split(rng)
    in_size = cfg.input_size if first else cfg.output_size
    return {
        "norm1": layer_norm_init(in_size),
        "norm2": layer_norm_init(cfg.output_size),
        "self_attn": sanm_attention_init(k1, cfg.attn_cfg(first)),
        "feed_forward": ffn_init(k2, cfg.output_size, cfg.linear_units),
    }


def _layer_apply(params, cfg: SANMEncoderConfig, x, mask, first: bool, rng=None,
                 lengths=None):
    """Pre-norm EncoderLayerSANM; attention residual only when dims match
    (reference ``EncoderLayerSANM.forward:118-135`` keys on in_size == size)."""
    attn_cfg = cfg.attn_cfg(first)
    residual = x
    h = layer_norm_apply(params["norm1"], x)
    h = sanm_attention_apply(params["self_attn"], attn_cfg, h, mask,
                             lengths=lengths)
    h = maybe_dropout(rng, h, cfg.dropout_rate if rng is not None else 0.0)
    x = h if attn_cfg.in_feat != attn_cfg.n_feat else residual + h
    residual = x
    h = layer_norm_apply(params["norm2"], x)
    h = ffn_apply(params["feed_forward"], h)
    h = maybe_dropout(None if rng is None else jax.random.fold_in(rng, 1), h,
                      cfg.dropout_rate if rng is not None else 0.0)
    return residual + h


@tables.register("encoder_classes", "SANMEncoder")
class SANMEncoder:
    """Functional SAN-M encoder. ``init(rng) -> params``; ``__call__(params, x, lens)``."""

    def __init__(self, input_size: int, output_size: int = 256, attention_heads: int = 4,
                 linear_units: int = 2048, num_blocks: int = 6, kernel_size: int = 11,
                 sanm_shfit: int = 0, input_layer: str = "pe",
                 normalize_before: bool = True, dropout_rate: float = 0.1, **kwargs):
        self.cfg = SANMEncoderConfig(
            input_size=input_size, output_size=output_size,
            attention_heads=attention_heads, linear_units=linear_units,
            num_blocks=num_blocks, kernel_size=kernel_size, sanm_shift=sanm_shfit,
            input_layer=input_layer, normalize_before=normalize_before,
            dropout_rate=dropout_rate,
        )

    def output_size(self) -> int:
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 1)
        params = {
            "encoders0": _layer_init(keys[0], cfg, first=True),
            "after_norm": layer_norm_init(cfg.output_size),
        }
        if cfg.num_blocks > 1:
            params["encoders"] = stack_params(
                [_layer_init(keys[i + 1], cfg, first=False) for i in range(cfg.num_blocks - 1)]
            )
        return params

    def __call__(self, params, xs_pad, ilens, rng=None):
        """xs_pad: (B, T, input_size); ilens: (B,) -> ((B, T, out), (B,) lens)."""
        cfg = self.cfg
        mask = make_pad_mask(ilens, xs_pad.shape[1])
        x = xs_pad * (cfg.output_size ** 0.5)
        if cfg.input_layer == "pe":
            x = add_sinusoidal_pe(x)
        elif cfg.input_layer is not None and cfg.input_layer != "null":
            raise NotImplementedError(f"input_layer={cfg.input_layer}")

        x = _layer_apply(params["encoders0"], cfg, x, mask, first=True, rng=rng,
                         lengths=ilens)

        if cfg.num_blocks > 1:
            runner = getattr(self, "pipeline_runner", None)
            if runner is not None:
                # pipeline-parallel stage execution (funasr_tpu.parallel.
                # pipeline): the stacked layer axis is sharded over the mesh's
                # stage axis and activations rotate via ppermute
                x = runner(
                    lambda lp, h, ctx: _layer_apply(
                        lp, cfg, h, ctx["mask"], first=False, rng=rng,
                        lengths=ctx["lengths"]),
                    params["encoders"], x, {"mask": mask, "lengths": ilens})
            else:
                def body(carry, layer_params):
                    h = _layer_apply(layer_params, cfg, carry, mask,
                                     first=False, rng=rng, lengths=ilens)
                    return h, None

                x, _ = jax.lax.scan(body, x, params["encoders"])

        if cfg.normalize_before:
            x = layer_norm_apply(params["after_norm"], x)
        x = x * mask[..., None].astype(x.dtype)
        return x, ilens
